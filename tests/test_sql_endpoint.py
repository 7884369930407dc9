"""SQL endpoint validation + execution (ref tests/test_sql.py and
sql_endpoint.py whitelist semantics)."""

from __future__ import annotations

import pytest

from lakeapi_spark.catalog import TABLES, register_views
from lakeapi_spark.sql import SqlValidationError, run_sql, validate_sql
from lakeapi_spark.sql.endpoint import referenced_tables


def test_select_allowed():
    validate_sql("SELECT 1")
    validate_sql("select n_name from nation where n_name = 'x' order by 1 limit 5")
    validate_sql("WITH t AS (SELECT 1 AS x) SELECT * FROM t")
    validate_sql("SELECT a FROM t1 UNION SELECT b FROM t2")
    validate_sql("SELECT a FROM t1 INTERSECT SELECT b FROM t2")
    validate_sql("SELECT a FROM t1 EXCEPT SELECT b FROM t2")


@pytest.mark.parametrize(
    "sql",
    [
        "INSERT INTO t VALUES (1)",
        "DROP TABLE t",
        "SELECT * FROM t; DROP TABLE t",
        "CREATE TABLE t AS SELECT 1",
        "UPDATE t SET a = 1",
        "DELETE FROM t",
        "SET spark.sql.x = 1",
        "SHOW TABLES",
        "DESCRIBE t",
        "EXPLAIN SELECT 1",
        "SELECT * FROM t WHERE a = (SELECT 1",  # unbalanced
        "MERGE INTO t USING s ON t.id = s.id WHEN MATCHED THEN DELETE",
    ],
)
def test_rejected(sql):
    with pytest.raises(SqlValidationError):
        validate_sql(sql)


def test_keywords_in_strings_are_fine():
    validate_sql("SELECT * FROM t WHERE name = 'drop table users'")
    validate_sql("SELECT 'insert' AS action FROM t -- drop\n")


def test_referenced_tables():
    refs = referenced_tables(
        "WITH c AS (SELECT * FROM orders) SELECT * FROM c JOIN customer ON 1=1"
    )
    assert refs == {"orders", "c", "customer"}


def test_run_sql_authorization(spark, sf_dir):
    register_views(spark, sf_dir)
    with pytest.raises(SqlValidationError, match="unauthorized"):
        run_sql(spark, "SELECT * FROM secret_table", allowed_tables=set(TABLES))
    # CTE names must not trip the authorization check
    df = run_sql(
        spark,
        "WITH t AS (SELECT n_name FROM nation) SELECT COUNT(*) AS n FROM t",
        allowed_tables=set(TABLES),
    )
    assert df.collect()[0].n == 25


def test_run_sql_union(spark, sf_dir):
    register_views(spark, sf_dir)
    df = run_sql(
        spark,
        "SELECT r_name AS name FROM region UNION ALL SELECT n_name FROM nation",
        allowed_tables=set(TABLES),
    )
    assert df.count() == 30
