"""Declarative data-quality expectations (greenfield extension).

A table-level contract check in the Great-Expectations mold: the caller
declares rules (not-null, unique, range, accepted set, regex), the
operator verifies ALL of them in ONE pass over the table and returns a
per-rule report — the gate a lakehouse ingestion job runs before
publishing a table version.

Scale shape: every row-wise rule compiles to a conditional SUM inside a
single global aggregate (one partial-aggregated reduction, no joins, no
second scan); ``unique`` rules add exact COUNT(DISTINCT col) terms to
the SAME aggregate (Spark plans multi-distinct via expand — still one
logical pass; swap approx_count_distinct's mergeable sketch above
~1e9-cardinality columns). The report itself is assembled JVM-side by
exploding a literal-keyed struct array — rules never touch the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expectation_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Verify ``rules`` against ``df`` in one aggregate pass.

    Each rule is a dict with ``name``, ``kind``, ``col`` and
    kind-specific params:

    - ``not_null``                  — violations = NULL values
    - ``unique``                    — violations = rows beyond the first
      per value (NULLs excluded, SQL-standard uniqueness)
    - ``min``/``max`` (``value``)   — violations = non-NULL values
      outside the bound (NULLs are not_null's job)
    - ``between`` (``lo``, ``hi``)  — closed range, same NULL rule
    - ``in_set`` (``values``)       — violations = non-NULL values not
      in the accepted set
    - ``regex`` (``pattern``)       — violations = non-NULL values not
      fully matching (Java∩RE2-portable patterns recommended, the
      text.pii discipline)

    Returns (rule, kind, col, n_rows, n_violations, passed) — one row
    per rule, ``passed`` = zero violations.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        c = F.col(r["col"])
        kind = r["kind"]
        if kind == "not_null":
            cond = c.isNull()
        elif kind == "unique":
            aggs.append(F.count(c).alias(f"_v{i}"))
            aggs.append(F.countDistinct(c).alias(f"_d{i}"))
            continue
        elif kind == "min":
            cond = c.isNotNull() & (c < F.lit(r["value"]))
        elif kind == "max":
            cond = c.isNotNull() & (c > F.lit(r["value"]))
        elif kind == "between":
            cond = c.isNotNull() & (
                (c < F.lit(r["lo"])) | (c > F.lit(r["hi"]))
            )
        elif kind == "in_set":
            cond = c.isNotNull() & ~c.isin(list(r["values"]))
        elif kind == "regex":
            cond = c.isNotNull() & ~c.rlike(r["pattern"])
        else:
            raise ValueError(f"unknown expectation kind {kind!r}")
        aggs.append(F.sum(cond.cast("long")).alias(f"_v{i}"))
    agg = df.agg(*aggs)
    entries = []
    for i, r in enumerate(rules):
        viol = (
            (F.col(f"_v{i}") - F.col(f"_d{i}"))
            if r["kind"] == "unique"
            else F.coalesce(F.col(f"_v{i}"), F.lit(0))
        )
        entries.append(
            F.struct(
                F.lit(r["name"]).alias("rule"),
                F.lit(r["kind"]).alias("kind"),
                F.lit(r["col"]).alias("col"),
                viol.cast("long").alias("n_violations"),
            )
        )
    return (
        agg.select(F.col("_n"), F.explode(F.array(*entries)).alias("e"))
        .select(
            F.col("e.rule").alias("rule"),
            F.col("e.kind").alias("kind"),
            F.col("e.col").alias("col"),
            F.col("_n").alias("n_rows"),
            F.col("e.n_violations").alias("n_violations"),
            (F.col("e.n_violations") == 0).alias("passed"),
        )
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col,
    k: int = 10,
    l_div: int = 2,
) -> DataFrame:
    """Privacy-risk audit before a dataset export: group rows by the
    QUASI-IDENTIFIER combination and report each group's size and its
    count of DISTINCT sensitive values, with the two standard flags —
    ``k_violation`` (fewer than ``k`` rows share the quasi-id, so a
    joiner can single individuals out) and ``l_violation`` (fewer than
    ``l_div`` distinct sensitive values, so membership alone leaks the
    attribute). Returns one row per quasi-id group:
    (quasi_cols..., n_rows, n_sensitive, k_violation, l_violation).

    One partial-aggregated groupBy; the distinct-count is exact
    (count_distinct partial-aggregates per group). The report is
    |quasi-id combinations|-sized — the relation a release gate scans
    for ANY violation before publishing."""
    sens = sensitive_col if not isinstance(sensitive_col, str) else F.col(sensitive_col)
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(sens).alias("n_sensitive"),
        (F.count(F.lit(1)) < k).alias("k_violation"),
        (F.count_distinct(sens) < l_div).alias("l_violation"),
    )
