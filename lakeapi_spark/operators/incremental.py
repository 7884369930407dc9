"""Incremental aggregate maintenance from a delta change feed.

The lakehouse "materialized view refresh" primitive: instead of
recomputing ``GROUP BY`` aggregates over the whole table after every
commit, consume the table's change stream (sources/delta.py:
delta_changes — CDF files when present, version diffs otherwise) and
apply signed per-group deltas to the previously materialized state.
COUNT/SUM are self-maintainable: insert/update_postimage rows
contribute +1, delete/update_preimage rows −1, and a row whose group
key changed moves mass between groups for free because both images
carry their own keys.

Scale shape: the refresh cost is ONE partial-aggregated groupBy over
the CHANGE ROWS (proportional to churn, never table size) plus an
outer join against the materialized aggregate (|groups| rows, usually
broadcastable). Sums accumulate in DECIMAL so the incremental result
is bit-identical to a from-scratch recompute — the property that makes
the refresh verifiable (and this query oracle-checkable) instead of
"approximately equal".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change-feed row kinds that add (+1) vs retract (-1) a row's mass
_ADDS = ("insert", "update_postimage")
_RETRACTS = ("delete", "update_preimage")


def cdf_agg_delta(
    changes: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Signed per-group deltas from a change-feed frame: ``d_n`` (row
    count delta) and ``d_<col>`` (DECIMAL sum delta) per ``keys``
    group. ``changes`` must carry ``_change_type``."""
    sign = (
        F.when(F.col("_change_type").isin(*_ADDS), F.lit(1))
        .when(F.col("_change_type").isin(*_RETRACTS), F.lit(-1))
        .otherwise(F.lit(None))
    )
    aggs = [F.sum(sign).alias("d_n")]
    for c in sum_cols:
        aggs.append(
            F.sum(sign * F.col(c).cast("double").cast("decimal(28,10)")).alias(f"d_{c}")
        )
    return changes.groupBy(*keys).agg(*aggs)


def refresh_agg(
    agg0: DataFrame,
    delta: DataFrame,
    keys: list[str],
    count_col: str,
    sum_cols: list[str],
) -> DataFrame:
    """Apply :func:`cdf_agg_delta` output to a materialized aggregate:
    full-outer join on the group keys (new groups appear, emptied
    groups drop via ``n > 0``), counts and DECIMAL sums add. ``agg0``
    must have ``count_col`` and one ``sum_<col>`` per ``sum_cols``."""
    zero = F.lit(0).cast("decimal(28,10)")
    joined = agg0.join(delta, keys, "full_outer")
    n = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(F.col("d_n"), F.lit(0))
    out = [F.col(k) for k in keys] + [n.alias(count_col)]
    for c in sum_cols:
        out.append(
            (
                F.coalesce(F.col(f"sum_{c}"), zero) + F.coalesce(F.col(f"d_{c}"), zero)
            ).alias(f"sum_{c}")
        )
    return joined.select(*out).filter(F.col(count_col) > 0)
