"""Per-group standardization / outlier statistics (greenfield extension).

Z-score outlier flagging with ENGINE-EXACT moments: the group sums and
sums-of-squares are accumulated in DECIMAL (order-independent — a
double SUM's value depends on partitioning), then converted once to
double for the variance/σ arithmetic, which is a fixed sequence of IEEE
operations any engine reproduces bit-for-bit. That makes an operator
that is usually "approximately equal across runs" into one a SQL oracle
can hash-match.

Scale shape: one partial-aggregated groupBy builds the per-group
moments (rows = |groups|); the moments join back by group key as the
BROADCAST side; the fact stream is scored map-side and filtered — no
second shuffle, no window over the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 3.0,
    round_digits: int = 4,
) -> DataFrame:
    """Rows whose value deviates from their group mean by at least
    ``threshold`` sample standard deviations. Returns the input columns
    plus ``z`` (rounded). Groups with fewer than 2 rows or zero
    variance produce no outliers (σ = 0 → undefined z → dropped)."""
    moments = df.groupBy(F.col(group_col).alias("_g")).agg(
        # count NON-NULL values, not rows — a nullable value column
        # otherwise deflates the mean and inflates the variance
        F.count(F.col(value_col)).alias("_n"),
        F.sum(F.col(value_col).cast("double").cast("decimal(28,10)"))
        .cast("double")
        .alias("_s"),
        F.sum(
            (F.col(value_col).cast("double") * F.col(value_col).cast("double")).cast(
                "decimal(28,10)"
            )
        )
        .cast("double")
        .alias("_ss"),
    )
    scored = df.join(
        F.broadcast(moments), df[group_col] == F.col("_g")
    ).withColumn(
        "_var",
        (F.col("_ss") - F.col("_s") * F.col("_s") / F.col("_n"))
        / (F.col("_n") - 1),
    )
    z = F.round(
        (F.col(value_col).cast("double") - F.col("_s") / F.col("_n"))
        / F.sqrt(F.col("_var")),
        round_digits,
    )
    return (
        scored.filter((F.col("_n") >= 2) & (F.col("_var") > 0))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= threshold)
        .drop("_g", "_n", "_s", "_ss", "_var")
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    digits: int = 4,
) -> DataFrame:
    """Per-group winsorized summary: clip values to the exact
    interpolated [p_lo, p_hi] percentiles, then report
    (group, n, n_clipped_low, n_clipped_high, mean_raw, mean_wins) —
    the robust-mean preprocessing step that keeps a handful of
    corrupt/outlier measurements from dragging a quality aggregate.
    Each clipped value is ROUNDED(6) before the decimal sum
    (round-before-average — engine-exact means, same discipline as
    text.unigram_logprob).

    Plan: one percentile aggregate per group (holistic — fine for
    bounded group counts; swap approx_percentile's mergeable KLL
    sketch for high-cardinality keys at 100 TB), broadcast back, one
    map-side clip + final group aggregate. Two keyed shuffles."""
    v = F.col(value_col).cast("double")
    pcts = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.expr(f"percentile({value_col}, {lo!r})").alias("_plo"),
        F.expr(f"percentile({value_col}, {hi!r})").alias("_phi"),
    )
    joined = df.join(
        F.broadcast(pcts), df[group_col] == F.col("_g"), "inner"
    )
    clipped = F.least(F.greatest(v, F.col("_plo")), F.col("_phi"))
    term = F.round(clipped, 6).cast("decimal(28,10)")
    raw_term = F.round(v, 6).cast("decimal(28,10)")
    return (
        joined.groupBy(F.col(group_col))
        .agg(
            F.count(v).alias("n"),
            F.sum((v < F.col("_plo")).cast("long")).alias("n_clipped_low"),
            F.sum((v > F.col("_phi")).cast("long")).alias("n_clipped_high"),
            F.round((F.sum(raw_term) / F.count(v)).cast("double"), digits).alias(
                "mean_raw"
            ),
            F.round((F.sum(term) / F.count(v)).cast("double"), digits).alias(
                "mean_wins"
            ),
        )
    )
