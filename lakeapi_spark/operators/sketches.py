"""Mergeable frequency sketches (greenfield extension).

Count-min is the classic bounded-memory frequency structure for
streaming/distributed counting: a depth x width counter grid where each
of ``depth`` salted hash rows maps a key to one column, point estimates
are the MIN over rows, and the whole grid merges by cell-wise addition
— so a 1000-executor corpus count becomes one groupBy over
depth * width cells instead of one row per distinct key. Overestimates
are bounded (e = 2.718.../width of total mass with prob 1 - 2^-depth);
counts are never under-estimated.

Everything here is deterministic and engine-portable by construction:
the row hashes are the md5-derived :func:`~lakeapi_spark.operators.
text.portable_hash60` with a ``seed:row:`` salt, so a SQL oracle
re-derives the exact same grid and estimates (the sketches are exact
relational aggregates — the "sketch" part is the bounded shape, not
randomness at query time).

Scale shape: one corpus pass builds the grid (explode by depth, then
ONE shuffle carrying at most depth * width partially-aggregated cells);
estimates probe the grid with a broadcast join on (row, col). The grid
relation is tiny (depth * width rows) regardless of corpus size — at
100 TB that is the entire point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeapi_spark.operators.text import portable_hash60


def _cms_col(key: Column, row: int, width: int, seed: int) -> Column:
    """Column index of ``key`` in hash row ``row``: salted 60-bit md5
    hash mod width — non-negative, bit-identical in any engine."""
    return portable_hash60(F.concat(F.lit(f"{seed}:{row}:"), key)) % width


def _cms_targets(key: Column, depth: int, width: int, seed: int) -> Column:
    """The ``depth`` (row, col) grid cells of ``key`` — ONE shared
    definition for build and estimate: if these ever diverged,
    estimates would probe cells the build never wrote."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), _cms_col(key, r, width, seed).alias("col")
            )
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    seed: int = 42,
) -> DataFrame:
    """Build the count-min grid over ``df[key_col]`` occurrences:
    (row, col, cnt) with one output row per NON-EMPTY cell. One scan:
    each key explodes into its ``depth`` (row, col) targets, then a
    single groupBy(row, col) count with map-side partial aggregation —
    the shuffle carries at most depth * width cells."""
    key = F.col(key_col).cast("string")
    targets = _cms_targets(key, depth, width, seed)
    ex = df.select(F.explode(targets).alias("t"))
    return (
        ex.select(F.col("t.row").alias("row"), F.col("t.col").alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    seed: int = 42,
) -> DataFrame:
    """Point-estimate each probe key against a built grid: est = MIN
    over the key's ``depth`` cells (absent cell = 0 — only possible for
    keys the corpus never contained). The grid side is depth * width
    rows at most, so it is the BROADCAST side; the probe relation can
    be arbitrarily large and never shuffles for the lookup (the only
    exchange is the per-key MIN, one row per probe key)."""
    key = F.col(key_col).cast("string")
    targets = _cms_targets(key, depth, width, seed)
    ex = probes.select(F.col(key_col).alias("key"), F.explode(targets).alias("t")).select(
        "key", F.col("t.row").alias("row"), F.col("t.col").alias("col")
    )
    return (
        ex.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
