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
