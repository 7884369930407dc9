"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real content lives in ``lakeapi_spark.queries`` — one registry
entry per implemented operator from SURVEY.md §2 plus the
training-data-pipeline extensions. The library registry keeps its
natural registration order; THIS file (the driver-facing contract,
not product code) decides presentation order, because the driver
samples the FIRST 50 entries per round.

Ordering is MECHANICAL (no hand-maintained window): queries sort by
(whether the latest ``CORRECTNESS_r*.json`` row for them was fully
green, the round of that latest row, registration order). Redness
dominates staleness: every query whose latest driver row is red —
including never-checked queries, which default to (0, 0) — sorts
before ALL green queries, so a failing or brand-new query always
re-enters the 50-query window next round; green queries rotate
stalest-first behind them. ``CORRECTNESS_r*.json`` files are read
from the repo directory as present on disk (tracked or not).
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lakeapi_spark.queries import QUERIES

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def _last_checked() -> dict[str, tuple[int, int]]:
    """name -> (latest round with a CORRECTNESS row for it, whether that
    row was fully green). A red row is still fresh evidence for the
    round key, but sorts ahead of green rows from the same round so
    just-fixed queries re-enter the window immediately. Unknown or
    unreadable files are skipped; absent names default to (0, 0).
    """
    seen: dict[str, tuple[int, int]] = {}
    for path in glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            green = int(
                isinstance(row, dict)
                and row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
                and row.get("err") is None
            )
            if rnd >= seen.get(name, (0, 0))[0]:
                seen[name] = (rnd, green)
    return seen


def _ordered_names() -> list[str]:
    checked = _last_checked()
    reg_order = {name: i for i, name in enumerate(QUERIES)}

    def key(n: str) -> tuple[int, int, int]:
        rnd, green = checked.get(n, (0, 0))
        return (green, rnd, reg_order[n])

    return sorted(QUERIES, key=key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    return QUERIES["q1_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].build for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }
