"""Shared fixtures: one warm SparkSession + a DuckDB oracle harness that
mirrors the driver's t2 correctness gate (row count + column names +
order-insensitive value comparison)."""

from __future__ import annotations

import math
import os

import duckdb

import pytest

from lakeapi_spark.catalog import TABLES
from lakeapi_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lakeapi-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        return repr(v)
    if hasattr(v, "isoformat"):  # datetime.date / datetime.datetime
        if hasattr(v, "tzinfo") and v.tzinfo is not None:
            v = v.replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _canon_rows(arrow_table) -> list[tuple]:
    """Column-name-sorted, stringified, row-sorted — the order-insensitive
    shape the driver hashes."""
    names = sorted(arrow_table.column_names)
    cols = [arrow_table.column(n).to_pylist() for n in names]
    return sorted(tuple(_cell(v) for v in row) for row in zip(*cols)) if cols else []


def assert_matches_oracle(spark, oracle_con, build, sql, sf_dir):
    stab = build(spark, sf_dir).toArrow()
    otab = oracle_con.sql(sql).arrow()
    assert sorted(stab.column_names) == sorted(otab.column_names), (
        f"column mismatch: spark={sorted(stab.column_names)} oracle={sorted(otab.column_names)}"
    )
    assert stab.num_rows == otab.num_rows, (
        f"row count: spark={stab.num_rows} oracle={otab.num_rows}"
    )
    s, o = _canon_rows(stab), _canon_rows(otab)
    if s != o:
        bad = [(a, b) for a, b in zip(s, o) if a != b][:5]
        raise AssertionError(
            "value mismatch; first diffs (spark vs oracle):\n"
            + "\n".join(f"  {a}\n  {b}" for a, b in bad)
        )
