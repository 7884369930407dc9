"""The local mirror of the driver's t2 gate: every registered query with an
oracle must match DuckDB exactly at the test scale factor."""

from __future__ import annotations

import pytest

from lakeapi_spark.queries import QUERIES
from tests.conftest import assert_matches_oracle

_WITH_ORACLE = [name for name, q in QUERIES.items() if q.oracle is not None]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, oracle_con, sf_dir, name):
    q = QUERIES[name]
    assert_matches_oracle(spark, oracle_con, q.build, q.oracle, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None


def test_all_queries_run(spark, sf_dir):
    """Queries without an oracle still must run and return a DataFrame."""
    for name, q in QUERIES.items():
        df = q.build(spark, sf_dir)
        assert df.count() >= 0, name
