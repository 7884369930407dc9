"""Skew-aware aggregation patterns.

AQE's skew-join splitting fixes storage-level skew at runtime, but two
aggregation shapes still melt a single reducer when a key is hot:

- COUNT(DISTINCT v) GROUP BY k: the naive plan shuffles every (k, v)
  row to k's reducer which must hold k's full value set. The two-stage
  form below shuffles by (k, v) first (hot k spread over all reducers
  by v), dedups, then counts tiny per-key partials.
- exact heavy-hitter counts over a hot key: plain groupBy already does
  map-side partial aggregation in Spark, so explicit salting is only
  needed for holistic aggregates; we provide the distinct case, the
  one that actually bites.

Both forms are plain relational algebra, so the DuckDB oracle verifies
them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_distinct_skew_safe(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, shaped for hot keys.

    Stage 1 shuffles on (key, value) — a key with a billion rows is
    spread across every reducer instead of landing on one. Stage 2
    aggregates one row per distinct (key, value): bounded by the
    distinct count, not the row count. Same two shuffles Catalyst
    plans for count_distinct, but spelled explicitly so the shape is
    guaranteed (and composable with further aggs)."""
    return (
        df.select(*key_cols, value_col)
        .distinct()
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
) -> DataFrame:
    """Equi-join resilient to a hot key when the small side is too big
    to broadcast: the big side gets a random-ish salt in [0, salt)
    derived from a stable row hash, the small side is replicated
    ``salt`` times, and the join key becomes (key, salt) — a hot key's
    rows land on ``salt`` reducers instead of one.

    AQE's skew-join split handles most storage skew automatically (and
    is the first thing to reach for); explicit salting remains for the
    cases AQE can't fix: skew materializing AFTER an upstream operator
    (mid-stage), or deterministic layout control for repeated runs.
    The salt is xxhash64 of the whole row (not rand()): deterministic
    across retries — a task retry with rand() salt would double-count
    rows under speculative execution.

    Cost model, stated: the small side's shuffle volume multiplies by
    ``salt``; worth it iff the hot key's reducer time dominated. Keep
    ``salt`` near the executor-core count, not higher."""
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    salted_small = small.join(
        small.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt")),
        how="cross",
    )
    out = salted_big.join(salted_small, [key, "_salt"])
    return out.drop("_salt")


def key_skew_report(
    df: DataFrame, key_cols: list[str], top: int = 15
) -> DataFrame:
    """The diagnostic you run BEFORE picking a join/agg strategy: per-key
    row counts for the would-be shuffle key, with each key's share of
    the table and its skew factor (count / mean count over keys). A
    skew_factor near 1 means hash partitioning balances; a key at 100×
    means that reducer runs 100× longer than average — reach for
    broadcast, salting (:func:`salted_join`) or AQE skew split.

    One partial-aggregated groupBy (rows after = |keys|), a 2-row
    global summary broadcast back, and a top-k that collapses to
    TakeOrderedAndProject — nothing here scales with the row count
    except the first map-side pass."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum("n").alias("_tot"), F.count(F.lit(1)).alias("_nk")
    )
    report = counts.join(F.broadcast(tot)).select(
        *key_cols,
        "n",
        (F.round(F.col("n") * 100.0 / F.col("_tot"), 4) + 0.0).alias("share_pct"),
        (F.round(F.col("n") * F.col("_nk") / F.col("_tot"), 4) + 0.0).alias(
            "skew_factor"
        ),
    )
    return report.orderBy(F.col("n").desc(), *key_cols).limit(top)
