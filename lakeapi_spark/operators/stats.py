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


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.5,
    round_digits: int = 4,
    approx_accuracy: int | None = None,
    min_group_rows: int = 1000,
) -> DataFrame:
    """Median-absolute-deviation outliers — the robust twin of
    :func:`zscore_outliers`: a single extreme value inflates σ enough
    to hide itself from a z-test, but cannot move the median. Flags
    rows where ``0.6745 * |v - median| / MAD >= k`` (the 0.6745
    consistency constant makes the score σ-comparable for normal data;
    Iglewicz-Hoskin recommend k=3.5). Groups with MAD = 0 produce no
    outliers (score undefined).

    Plan: two holistic percentile aggregates (group median, then median
    of |v - med|) and one broadcast-scored map pass — two keyed
    shuffles over the GROUP relation, the fact stream itself shuffles
    once. percentile() is exact/holistic and the group relation is
    broadcast — right for bounded group counts. Above ~1e6 groups set
    ``approx_accuracy`` (e.g. 10000): both medians switch to
    approx_percentile's mergeable GK sketch (partial-aggregates
    map-side instead of holding each group's values in one task) and
    the group relation joins by hash instead of broadcast. TWO
    documented divergences from the exact path: (a) the sketch's rank
    error (at most 1/accuracy of a group's rows); (b) independent of
    accuracy, approx_percentile returns a rank-nearest ELEMENT while
    percentile() INTERPOLATES between the middle pair on even counts —
    on small groups of discrete values the MAD itself can differ, not
    just threshold-adjacent rows (measured: 10-row integer-valued
    groups flip between MAD=0 and MAD>0). The dial is for the
    many-LARGE-group regime, where both medians converge; keep the
    default exact path when groups are small or values coarse.

    That regime is ENFORCED, not advisory: with the dial on, an eager
    group-count pass raises ValueError naming the first groups smaller
    than ``min_group_rows`` (default 1000 — the scale at which the
    element-vs-interpolation gap stops mattering for continuous
    values). Callers who have verified rank-exactness on smaller
    groups can lower the floor explicitly; ``min_group_rows=0``
    disables the check. Like quota_sample's prefilter guard this costs
    one extra aggregate over ``df``'s lineage at call time — persist
    upstream if it is expensive.

    Both paths return DOUBLE medians: the approx branch casts its
    input (approx_percentile otherwise returns the input column's
    type, drifting the schema for integer value columns).
    """
    v = F.col(value_col).cast("double")

    def _p50(col_sql: str) -> Column:
        if approx_accuracy is not None:
            return F.expr(
                f"approx_percentile(CAST({col_sql} AS DOUBLE), 0.5,"
                f" {int(approx_accuracy)})"
            )
        return F.expr(f"percentile({col_sql}, 0.5)")

    if approx_accuracy is not None and min_group_rows > 0:
        # count NON-NULL values, not rows: percentile() ignores NULLs,
        # so a group of 10k rows with 20 non-null values has an
        # effective sample of 20 — exactly the small-sample flip the
        # floor exists to prevent.
        small = (
            df.groupBy(F.col(group_col).alias("_g"))
            .agg(F.count(F.col(value_col)).alias("_n"))
            .filter(F.col("_n") < min_group_rows)
        )
        bad = [(r["_g"], r["_n"]) for r in small.limit(5).collect()]
        if bad:
            raise ValueError(
                f"mad_outliers(approx_accuracy={approx_accuracy}): group(s) "
                f"{bad} have fewer than min_group_rows={min_group_rows} rows "
                f"— approx_percentile picks a rank-nearest ELEMENT while the "
                f"exact path interpolates, so small/coarse groups can flip "
                f"MAD between 0 and >0. Use the exact path, or lower "
                f"min_group_rows explicitly after verifying rank-exactness."
            )

    maybe_bcast = F.broadcast if approx_accuracy is None else (lambda d: d)
    med = df.groupBy(F.col(group_col).alias("_g")).agg(
        _p50(value_col).alias("_med")
    )
    dev = df.join(maybe_bcast(med), df[group_col] == F.col("_g")).withColumn(
        "_adev", F.abs(v - F.col("_med"))
    )
    mad = dev.groupBy("_g").agg(
        _p50("_adev").alias("_mad"), F.first("_med").alias("_m2")
    )
    score = F.round(F.lit(0.6745) * F.abs(v - F.col("_m2")) / F.col("_mad") + 0.0,
                    round_digits)
    return (
        df.join(maybe_bcast(mad), df[group_col] == F.col("_g"))
        .filter(F.col("_mad") > 0)
        .withColumn("robust_z", score)
        .filter(F.col("robust_z") >= k)
        .drop("_g", "_mad", "_m2")
    )


def psi_drift(
    base: DataFrame,
    cur: DataFrame,
    group_col: str,
    value_col: str,
    n_bins: int = 10,
    round_digits: int = 4,
) -> DataFrame:
    """Population Stability Index between a baseline and a current
    sample, per group: equal-width bins over the BASELINE's per-group
    [min, max] (values outside clamp into the edge bins, so the two
    samples always share a bin space), Laplace-smoothed proportions
    (+0.5 per bin), ``PSI = Σ (p−q)·ln(p/q)``. The standard drift
    gate in front of a model/data refresh: <0.1 stable, >0.25 drifted.

    Every BASELINE group appears in the output exactly once: groups
    whose baseline is constant (max == min — no bin space) and groups
    with zero current rows (vanished — drift is maximal, not absent)
    report ``psi`` NULL with their true ``n_base``/``n_cur`` counts
    rather than silently disappearing from the drift report. Groups
    present only in ``cur`` are NOT reported (a new group has no
    baseline to drift from — onboard it as its own baseline).

    Plan: baseline bounds are one partial-agg groupBy broadcast to both
    sides; each side bins map-side and partially aggregates to at most
    ``groups × n_bins`` rows before the single merge join — the fact
    tables shuffle nothing but their bin counts. The completeness
    spine adds two more group-sized count aggregates.
    """
    v = F.col(value_col).cast("double")
    bounds = base.groupBy(F.col(group_col).alias("_g")).agg(
        F.min(v).alias("_mn"), F.max(v).alias("_mx")
    )

    def binned(df: DataFrame, n_name: str) -> DataFrame:
        width = (F.col("_mx") - F.col("_mn")) / n_bins
        raw = F.floor((v - F.col("_mn")) / width)
        b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")
        return (
            df.join(F.broadcast(bounds), df[group_col] == F.col("_g"))
            .filter(F.col("_mx") > F.col("_mn"))
            .groupBy(F.col("_g").alias("g"), b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(n_name))
        )

    bt = binned(base, "nb").groupBy("g").agg(
        F.sum("nb").alias("tb"), F.collect_list(F.struct("bin", "nb")).alias("lb")
    )
    ct = binned(cur, "nc").groupBy("g").agg(
        F.sum("nc").alias("tc"), F.collect_list(F.struct("bin", "nc")).alias("lc")
    )
    # dense bin spine per group so empty bins still contribute their
    # smoothed mass (PSI is undefined without smoothing otherwise)
    spine = bt.join(ct, "g").select(
        "g", "tb", "tc", "lb", "lc", F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
    )
    # F.get is the null-on-missing element accessor (element_at raises
    # under ANSI when the per-bin filter comes back empty)
    pick = lambda lst, n: F.coalesce(
        F.get(F.filter(F.col(lst), lambda s: s["bin"] == F.col("bin")), 0)[n],
        F.lit(0),
    )
    p = (pick("lb", "nb").cast("double") + 0.5) / (F.col("tb") + 0.5 * n_bins)
    q = (pick("lc", "nc").cast("double") + 0.5) / (F.col("tc") + 0.5 * n_bins)
    core = (
        spine.withColumn("_term", (p - q) * F.log(p / q))
        .groupBy(F.col("g"))
        .agg(F.round(F.sum("_term") + 0.0, round_digits).alias("psi"))
    )
    # completeness spine: one row per BASELINE group, true row counts,
    # NULL psi where the index is undefined (constant baseline) or the
    # group vanished from cur (tc = 0)
    base_n = base.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n_base")
    )
    cur_n = cur.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("_nc")
    )
    return (
        base_n.join(cur_n, "g", "left")
        .join(core, "g", "left")
        .select(
            F.col("g").alias(group_col),
            "psi",
            "n_base",
            F.coalesce(F.col("_nc"), F.lit(0)).alias("n_cur"),
        )
    )


def orphan_counts(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit: for each (name, child, fk, parent,
    pk) relationship, count child rows whose non-null FK has no parent
    (LEFT ANTI join) plus null-FK rows, reported separately. The
    data-quality sweep run before trusting join results at scale.

    Each relationship is child-anti-join-parent with the parent's
    DISTINCT key — broadcastable for dimension-sized parents, shuffle
    otherwise, and the child side is a 2-column projection either way.
    Results union to |pairs| rows.
    """
    outs = []
    for name, child, fk, parent, pk in pairs:
        keys = parent.select(F.col(pk).alias(fk)).distinct()
        nn = child.select(fk).filter(F.col(fk).isNotNull())
        orphans = nn.join(keys, fk, "left_anti")
        outs.append(
            child.select(
                F.lit(name).alias("relationship"),
                F.count(F.lit(1)).alias("n_child"),
                F.sum(F.col(fk).isNull().cast("long")).alias("n_null_fk"),
            ).crossJoin(orphans.select(F.count(F.lit(1)).alias("n_orphans")))
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select("relationship", "n_child", "n_null_fk", "n_orphans")


#: First-significant-digit frequencies under Benford's law,
#: log10(1 + 1/d) as percentages rounded to 4 — inlined as literals in
#: BOTH the Spark plan and the SQL oracle so the comparison is exact.
BENFORD_PCT = {
    1: 30.103, 2: 17.6091, 3: 12.4939, 4: 9.691, 5: 7.9181,
    6: 6.6947, 7: 5.799, 8: 5.1153, 9: 4.5757,
}


def benford_audit(df: DataFrame, value_col: str, scale: int = 100) -> DataFrame:
    """First-significant-digit census of a positive measure vs the
    Benford expectation — the classic fabricated-data / unit-mixing
    smell test for financial columns. Returns one row per digit 1-9:
    (digit, n, obs_pct, exp_pct, abs_dev).

    The digit is extracted EXACTLY: the value is scaled to an integer
    (``scale`` = 10^max_decimals, e.g. 100 for money) and the first
    character of its decimal rendering taken — no log10 float
    boundary-crossing at powers of ten, so any engine derives the same
    digit. One partial-aggregated groupBy over 9 groups; the total
    re-joins as a broadcast literal — nothing shuffles more than 9
    rows."""
    v = F.col(value_col).cast("double")
    digit = F.substring(
        F.round(v * scale, 0).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = (
        df.filter(v > 0)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("_tot"))
    exp_pct = F.element_at(
        F.create_map(
            *[F.lit(x) for d, p in sorted(BENFORD_PCT.items()) for x in (d, p)]
        ),
        F.col("digit"),
    )
    return (
        counts.join(F.broadcast(tot))
        .select(
            "digit",
            "n",
            (F.round(F.col("n") * 100.0 / F.col("_tot"), 4) + 0.0).alias("obs_pct"),
            exp_pct.alias("exp_pct"),
        )
        .withColumn(
            "abs_dev", F.round(F.abs(F.col("obs_pct") - F.col("exp_pct")), 4) + 0.0
        )
        .orderBy("digit")
    )


def ols_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares line fit y = slope*x +
    intercept — the 'is this metric trending' primitive (x is an
    integer period index, y a measure). Returns (group_cols..., n_pts,
    slope, intercept) with groups of < 2 distinct x dropped.

    Engine-exact by construction: x sums are integer, y and x*y sums
    accumulate in DECIMAL, and the closed-form slope
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) is then one fixed sequence of IEEE
    double ops. One partial-aggregated groupBy — the fact table never
    shuffles anything but its group key."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("double")
    m = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.sum(x).alias("_sx"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y.cast("decimal(28,10)")).cast("double").alias("_sy"),
        F.sum((x * y).cast("decimal(28,10)")).cast("double").alias("_sxy"),
    )
    den = (
        F.col("n_pts") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    ).cast("double")
    slope = (
        F.col("n_pts") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    ) / den
    intercept = (F.col("_sy") - slope * F.col("_sx")) / F.col("n_pts")
    return (
        m.filter(den != 0)
        .select(
            *group_cols,
            "n_pts",
            (F.round(slope, round_digits) + 0.0).alias("slope"),
            (F.round(intercept, round_digits) + 0.0).alias("intercept"),
        )
    )


def _group_median(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group EXACT median of a double column with the
    engine-portable even-count rule: AVG of the rows at positions
    (c+1) div 2 and (c+2) div 2 of the value-sorted group (one row
    when c is odd — both positions coincide). AVG of <= 2 doubles is
    sum/count, the identical IEEE sequence in Spark and DuckDB, so no
    interpolated-quantile implementation detail can disagree. Returns
    (group_cols..., _n, _median)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy(value_col)
    wc = Window.partitionBy(*group_cols)
    ranked = df.select(
        *group_cols,
        value_col,
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wc).alias("_c"),
    )
    lo = F.expr("(_c + 1) div 2")
    hi = F.expr("(_c + 2) div 2")
    return (
        ranked.filter((F.col("_rn") == lo) | (F.col("_rn") == hi))
        .groupBy(*group_cols)
        .agg(F.max("_c").alias("_n"), F.avg(value_col).alias("_median"))
    )


def _array_median(arr) -> "F.Column":
    """Exact median of a SORTED double array with the engine-portable
    even-count rule of :func:`_group_median`: mean of the elements at
    positions (n+1) div 2 and (n+2) div 2 (one element when n is odd —
    (a+a)/2 == a exactly in IEEE, and two-term addition is commutative,
    so this is bit-identical to AVG over the two rank-picked rows).
    Caller guarantees n >= 1 (element_at is 1-indexed)."""
    n = F.size(arr)
    lo = F.floor((n + 1) / F.lit(2)).cast("int")
    hi = F.floor((n + 2) / F.lit(2)).cast("int")
    return (F.element_at(arr, lo) + F.element_at(arr, hi)) / F.lit(2.0)


def theil_sen_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    round_digits: int = 6,
    cache_handles: list | None = None,
) -> DataFrame:
    """Per-group Theil–Sen robust trend: slope = median of all pairwise
    slopes (y2-y1)/(x2-x1) over x1 < x2, intercept = median of the
    residuals y - slope*x — the estimator that shrugs off up to ~29%
    outliers where OLS (:func:`ols_trend`) chases them. Returns
    (group_cols..., n_pairs, slope, intercept); groups with < 2 points
    have no pairs and drop.

    Scale shape (r13): the input is a PRE-AGGREGATED per-(group,
    period) series — bounded by groups x periods, never the fact table
    — so the whole estimator fits ONE aggregation: collect each group's
    (x, y) points into a sorted array and run the O(periods^2) pair
    expansion, both medians, and the residual pass as higher-order
    array expressions over that row (same nested-transform shape as
    the co-purchase basket pair build). One exchange on the group key,
    zero self-joins/windows/broadcasts/persists — the previous
    join+window spelling paid 4 extra exchanges and a 3-reference
    persist for identical numbers (the per-group pair array, 80 months
    -> 3,160 doubles, is the same relation the join materialized
    row-wise). Medians are rank-picked (:func:`_array_median`), slopes
    rounded BEFORE the residual pass, so both engines feed
    bit-identical doubles forward; ``cache_handles`` is kept for
    signature compatibility (nothing is persisted any more)."""
    del cache_handles  # no persisted state in the single-pass shape
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("double")
    g = df.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(x.alias("x"), y.alias("y")))
        ).alias("_pts")
    )
    pts = F.col("_pts")
    # all (i, j) index pairs with x_i < x_j: slice from i+2 walks j > i
    # over the x-sorted array; the strict-inequality filter preserves
    # the operator contract (tied x values pair with NOTHING, exactly
    # like the previous `_x < _x2` join filter)
    slopes = F.array_sort(
        F.flatten(
            F.transform(
                pts,
                lambda p, i: F.transform(
                    F.filter(
                        F.slice(pts, i + 2, F.size(pts)),
                        lambda q: q["x"] > p["x"],
                    ),
                    lambda q: (q["y"] - p["y"])
                    / (q["x"] - p["x"]).cast("double"),
                ),
            )
        )
    )
    g = g.withColumn("_sl", slopes).filter(F.size("_sl") > 0)
    g = g.select(
        *group_cols,
        "_pts",
        F.size("_sl").cast("long").alias("n_pairs"),
        (F.round(_array_median(F.col("_sl")), round_digits) + 0.0).alias("slope"),
    )
    resid = F.array_sort(
        F.transform(pts, lambda p: p["y"] - F.col("slope") * p["x"])
    )
    return g.select(
        *group_cols,
        "n_pairs",
        "slope",
        (F.round(_array_median(resid), round_digits) + 0.0).alias("intercept"),
    )


def pearson_corr(
    df: DataFrame,
    group_cols: list[str],
    pairs: list[tuple[str, str, str]],
    round_digits: int = 4,
) -> DataFrame:
    """Per-group Pearson correlation for each (x, y, out_name) pair in
    one aggregation pass — the profiling step behind feature-redundancy
    pruning. Built from DECIMAL-accumulated moments (the same
    order-independence discipline as :func:`zscore_outliers`) rather
    than F.corr, whose float summation order varies with partitioning;
    the closed form over exact sums is engine-reproducible. Groups
    where either variance is zero yield NULL for that pair."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for xc, yc, name in pairs:
        x = F.col(xc).cast("double")
        y = F.col(yc).cast("double")
        aggs += [
            F.sum(x.cast("decimal(28,10)")).cast("double").alias(f"_sx_{name}"),
            F.sum(y.cast("decimal(28,10)")).cast("double").alias(f"_sy_{name}"),
            F.sum((x * x).cast("decimal(28,10)")).cast("double").alias(f"_sxx_{name}"),
            F.sum((y * y).cast("decimal(28,10)")).cast("double").alias(f"_syy_{name}"),
            F.sum((x * y).cast("decimal(28,10)")).cast("double").alias(f"_sxy_{name}"),
        ]
    m = df.groupBy(*group_cols).agg(*aggs)
    out = [*group_cols, F.col("_n").alias("n_rows")]
    for _, _, name in pairs:
        n = F.col("_n")
        vx = n * F.col(f"_sxx_{name}") - F.col(f"_sx_{name}") * F.col(f"_sx_{name}")
        vy = n * F.col(f"_syy_{name}") - F.col(f"_sy_{name}") * F.col(f"_sy_{name}")
        cov = n * F.col(f"_sxy_{name}") - F.col(f"_sx_{name}") * F.col(f"_sy_{name}")
        r = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
        out.append((F.round(r, round_digits) + 0.0).alias(name))
    return m.select(*out)


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    sample_col: str,
    a: str,
    b: str,
    scale: int = 100,
    digits: int = 4,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the ``a`` and
    ``b`` populations of ``sample_col``: D = max |F_a(v) - F_b(v)|,
    the distribution-drift test that PSI's fixed binning can miss.
    Returns one row (n_a, n_b, ks_stat); if either population is empty
    the statistic is undefined and ``ks_stat`` is NULL (the counts
    still report which side was empty).

    The value is quantized to integers (``scale`` = 10^decimals, the
    same exact-rendering discipline as :func:`benford_audit`) and the
    corpus immediately collapses to a per-VALUE histogram (one
    partial-aggregated shuffle, rows after = |value domain|, bounded
    by quantization — not by corpus size). The CDF walk is a window
    over that histogram: cumulative counts are exact integers, each
    |F_a - F_b| is two divisions + rounding (fixed IEEE sequence), and
    the global max is order-independent. The single-partition window
    ranks the value DOMAIN, never rows."""
    v = F.round(F.col(value_col).cast("double") * scale, 0).cast("long")
    s = F.col(sample_col)
    hist = (
        df.filter(s.isin(a, b))
        .select(
            v.alias("v"),
            F.when(s == a, 1).otherwise(0).alias("ia"),
            F.when(s == b, 1).otherwise(0).alias("ib"),
        )
        .groupBy("v")
        .agg(F.sum("ia").alias("ca"), F.sum("ib").alias("cb"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.select(
        F.sum("ca").over(w).alias("fa"), F.sum("cb").over(w).alias("fb")
    )
    tot = hist.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    # try_divide: an EMPTY population (na or nb = 0) must surface as a
    # NULL ks_stat next to the true counts, not as an ANSI
    # divide-by-zero from inside the CDF walk
    d = F.round(
        F.abs(
            F.try_divide(F.col("fa").cast("double"), F.col("na").cast("double"))
            - F.try_divide(F.col("fb").cast("double"), F.col("nb").cast("double"))
        ),
        digits,
    )
    return (
        cum.join(F.broadcast(tot))
        .agg(F.max(d).alias("_d"), F.max("na").alias("n_a"), F.max("nb").alias("n_b"))
        .select("n_a", "n_b", (F.col("_d") + 0.0).alias("ks_stat"))
    )


def categorical_dependence(
    df: DataFrame,
    x_col: str,
    y_col: str,
    digits: int = 6,
) -> DataFrame:
    """Mutual information (nats) and Pearson chi-squared between two
    categorical columns in ONE contingency pass — the feature-
    dependence audit behind redundant-column pruning and
    stratification checks. Returns one row (n, n_x, n_y, mi_nats,
    chi2).

    The corpus collapses to the |X| x |Y| contingency table in one
    partial-aggregated shuffle; marginals come from window sums OVER
    THE TABLE (cell-domain-sized, never corpus rows — the
    single-partition window ranks at most |X|*|Y| cells). Per-cell
    terms are rounded then summed in DECIMAL, so the float-sum order
    never differs between engines. Chi-squared includes unobserved
    cells exactly without materializing them:
    sum_all (O-E)^2/E = sum_obs [(O-E)^2/E - E] + N."""
    from pyspark.sql.window import Window

    cells = df.groupBy(
        F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
    ).agg(F.count(F.lit(1)).alias("nxy"))
    per = cells.select(
        "_x",
        "_y",
        "nxy",
        F.sum("nxy").over(Window.partitionBy("_x")).alias("nx"),
        F.sum("nxy").over(Window.partitionBy("_y")).alias("ny"),
        F.sum("nxy").over(Window.partitionBy()).alias("n"),
    )
    nd = F.col("n").cast("double")
    mi_term = (F.col("nxy") / nd) * F.log(
        F.col("nxy") * nd / (F.col("nx") * F.col("ny")).cast("double")
    )
    e = (F.col("nx") * F.col("ny")).cast("double") / nd
    chi_adj = (F.col("nxy").cast("double") - e) * (F.col("nxy") - e) / e - e
    agg = per.agg(
        F.max("n").alias("_n"),
        F.countDistinct("_x").alias("n_x"),
        F.countDistinct("_y").alias("n_y"),
        F.sum(F.round(mi_term, 10).cast("decimal(38,12)")).alias("_mi"),
        F.sum(F.round(chi_adj, 6).cast("decimal(38,8)")).alias("_chi"),
    )
    return agg.select(
        F.col("_n").alias("n"),
        "n_x",
        "n_y",
        (F.round(F.col("_mi").cast("double"), digits) + 0.0).alias("mi_nats"),
        (
            F.round(F.col("_chi").cast("double") + F.col("_n"), digits) + 0.0
        ).alias("chi2"),
    )


def woe_iv(
    df: DataFrame,
    cat_col: str,
    flag_col: str,
    digits: int = 6,
) -> DataFrame:
    """Weight-of-evidence encoding + information-value terms of a
    categorical feature against a binary outcome — the credit-scoring
    / feature-screening audit ("does this category separate the
    classes, and how much"). Returns one row per category:
    (cat_col, n, n_pos, n_neg, woe, iv_term); sum(iv_term) is the
    feature's IV.

    woe = ln(((pos+0.5)/(P+1)) / ((neg+0.5)/(N+1))) with the 0.5
    Laplace smoothing making empty cells finite; iv_term =
    (pos_rate - neg_rate) * woe before rounding. One
    partial-aggregated groupBy (rows after = |categories|) plus a
    broadcast 1-row total — category count never touches shuffle
    width. Counts are exact integers; woe/iv are one fixed IEEE
    sequence, rounded last."""
    flag = F.col(flag_col).cast("boolean")
    cells = df.groupBy(F.col(cat_col)).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(flag, 1).otherwise(0)).alias("n_pos"),
    )
    cells = cells.withColumn("n_neg", F.col("n") - F.col("n_pos"))
    tot = cells.agg(
        F.sum("n_pos").alias("_p"), F.sum("n_neg").alias("_ng")
    )
    pr = (F.col("n_pos") + 0.5) / (F.col("_p") + 1.0)
    nr = (F.col("n_neg") + 0.5) / (F.col("_ng") + 1.0)
    woe = F.log(pr / nr)
    return (
        cells.join(F.broadcast(tot))
        .select(
            cat_col,
            "n",
            "n_pos",
            "n_neg",
            (F.round(woe, digits) + 0.0).alias("woe"),
            (F.round((pr - nr) * woe, digits) + 0.0).alias("iv_term"),
        )
        .orderBy(cat_col)
    )

def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    value_scale: int = 100,
    digits: int = 2,
) -> DataFrame:
    """Per-group weighted (lower) median: the smallest value v whose
    cumulative weight reaches half the total — the robust center when
    observations carry volume (price weighted by quantity), immune to
    the float-summation-order hazards of interpolated quantiles
    because EVERYTHING here is integer: values quantize to
    ``value_scale`` units, weights cast to long, and the pick rule is
    2*cum_weight >= total_weight (no halving). Returns
    (group_cols..., total_w, w_median). Groups whose TOTAL weight is
    <= 0 (all-zero, or negatives outweighing positives) report
    ``w_median`` NULL — with no positive mass the pick rule would
    otherwise degenerate to "the smallest value", a fabricated center.

    The corpus collapses to a per-(group, value) histogram in one
    partial-agg shuffle; the cumulative walk windows over the VALUE
    DOMAIN per group (bounded by quantization, not corpus), and the
    pick is a min over qualifying domain rows."""
    from pyspark.sql.window import Window

    v = F.round(F.col(value_col).cast("double") * value_scale, 0).cast("long")
    wgt = F.col(weight_col).cast("long")
    hist = df.groupBy(*group_cols, v.alias("_v")).agg(F.sum(wgt).alias("_w"))
    wc = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "_v",
        F.sum("_w").over(wc).alias("_cum"),
        F.sum("_w").over(wt).alias("_tot"),
    )
    picked = (
        cum.filter(2 * F.col("_cum") >= F.col("_tot"))
        .groupBy(*group_cols)
        .agg(
            F.max("_tot").alias("total_w"),
            (
                F.round(F.min("_v") / F.lit(float(value_scale)), digits) + 0.0
            ).alias("_wm"),
        )
    )
    return picked.select(
        *group_cols,
        "total_w",
        F.when(F.col("total_w") > 0, F.col("_wm")).alias("w_median"),
    )


def gini_concentration(
    df: DataFrame,
    group_cols: list[str],
    entity_col: str,
    value_col: str,
    value_scale: int = 100,
    digits: int = 6,
) -> DataFrame:
    """Per-group Gini coefficient of how concentrated ``value_col`` is
    across entities — the inequality metric behind "does 20% of the
    customer base drive 80% of revenue" concentration audits. Input is
    ENTITY grain (one row per (group, entity)). Returns
    (group_cols..., n_entities, total_value, gini).

    Engine-exact by integer discipline: values quantize to
    ``value_scale`` units (long), ranks come from a TOTAL order
    (value, entity id), and the closed form
    ``G = (2*SUM(rank*x) - (n+1)*SUM(x)) / (n*SUM(x))`` keeps numerator
    and denominator in BIGINT — one double division + round at the end,
    identical in any engine.

    Scale shape: the rank window partitions by group (one shuffle,
    skew-bounded by group sizes); the closing agg partial-aggregates
    map-side. No self-joins, no all-pairs |x_i - x_j| form."""
    from pyspark.sql.window import Window

    x = F.round(F.col(value_col).cast("double") * value_scale, 0).cast("long")
    w = Window.partitionBy(*group_cols).orderBy("_x", entity_col)
    ranked = df.select(*group_cols, entity_col, x.alias("_x")).withColumn(
        "_r", F.row_number().over(w)
    )
    n = F.count(F.lit(1))
    sx = F.sum("_x")
    srx = F.sum(F.col("_r") * F.col("_x"))
    return ranked.groupBy(*group_cols).agg(
        n.alias("n_entities"),
        (F.round(sx / F.lit(float(value_scale)), 2) + 0.0).alias("total_value"),
        F.when(
            (n * sx) != 0,
            F.round(
                (2 * srx - (n + 1) * sx).cast("double") / (n * sx).cast("double"),
                digits,
            )
            + 0.0,
        ).alias("gini"),
    )


def largest_remainder_allocation(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    total_col: str,
    order_col: str,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Integer proration (largest-remainder / Hamilton method): split
    each group's integer ``total_col`` across its rows proportionally
    to integer ``weight_col`` so the parts SUM EXACTLY to the total —
    the allocation discipline financial rollups need (floats drift;
    floor-only leaves cents unallocated). base_i = total*w_i DIV W;
    the leftover total - SUM(base) goes one unit each to the rows with
    the largest remainder (total*w_i MOD W), ties to the lower
    ``order_col``. ALL integer arithmetic — any engine reproduces it.

    Returns (group_col, order_col, *passthrough, weight, allocated,
    bumped); groups whose weight sum is <= 0 (no mass to prorate by)
    report NULL allocated/bumped with their rows still visible.
    ``passthrough`` columns ride the window pass unchanged,
    so callers that need sibling attributes downstream (a rollup key,
    a currency) avoid a second fact-sized join back to the input.
    Scale shape: two window passes over the same (group) partitioning
    — one shuffle total; no joins."""
    from pyspark.sql.window import Window

    wg = Window.partitionBy(group_col)
    wr = Window.partitionBy(group_col).orderBy(
        F.col("_mod").desc(), F.col(order_col)
    )
    extra = list(passthrough or [])
    staged = (
        df.select(
            group_col,
            order_col,
            *extra,
            F.col(weight_col).cast("long").alias("_w"),
            F.col(total_col).cast("long").alias("_t"),
        )
        .withColumn("_wsum", F.sum("_w").over(wg))
        # proration is undefined without positive weight mass: a group
        # whose weight sum is <= 0 emits NULL allocations (rows stay
        # visible; NULL propagates into any downstream rollup) instead
        # of an ANSI divide-by-zero out of the DIV
        .withColumn(
            "_base",
            F.when(F.col("_wsum") > 0, F.expr("_t * _w DIV _wsum")),
        )
        .withColumn(
            "_mod",
            F.when(
                F.col("_wsum") > 0, (F.col("_t") * F.col("_w")) % F.col("_wsum")
            ),
        )
    )
    return (
        staged.withColumn("_rem", F.col("_t") - F.sum("_base").over(wg))
        .withColumn("_rk", F.row_number().over(wr))
        .select(
            group_col,
            order_col,
            *extra,
            F.col("_w").alias("weight"),
            (F.col("_base") + (F.col("_rk") <= F.col("_rem")).cast("long")).alias(
                "allocated"
            ),
            (F.col("_rk") <= F.col("_rem")).alias("bumped"),
        )
    )


def largest_remainder_rollup(
    facts: DataFrame,
    group_col: str,
    weight_col: str,
    headers: DataFrame,
    header_key: str,
    total_col: str,
    rollup_cols: list[str],
) -> DataFrame:
    """Closed-form rollup of largest_remainder_allocation: per rollup
    key (header attributes), (n_items, alloc_cents, n_bumped) WITHOUT
    materializing the per-row allocation. The identities (all integer):

        sum_i base_i = sum_i (t*w_i DIV W)          with W = sum_i w_i
        rem          = t - sum_i base_i             in [0, n) for W > 0
        n_bumped     = #(rk <= rem) = clamp(rem, 0, n)
        sum_i alloc_i = sum_i base_i + n_bumped     ( = t when W > 0 )

    so the row-level operator's tie-break ``order_col`` never matters
    to the rollup — WHICH rows are bumped depends on it, HOW MANY does
    not (clamp covers totals outside [0, W), where the row-level
    ``rk <= rem`` comparison bumps none/all). Groups with W <= 0
    contribute NULL alloc/bumped (exactly the row-level operator's
    NULL-allocation rows under a skipping SUM); their rows still count
    in n_items.

    Plan shape: ONE partial-agg shuffle of (group, weight) collecting
    the per-group weight array (groups are small: lineitems per order),
    an equi-join against the header relation that reuses the aggregate's
    hash partitioning on the fact side, then per-row array expressions —
    no windows, no sorts, no row_number, and the weight column is the
    only fact payload shuffled. The row-level operator stays the
    per-row audit path; the planted-data unit test pins the two to
    identical rollups."""
    # repartition by the group key BEFORE the aggregate: collect_list's
    # partial aggregation ships every weight regardless, so map-side
    # combining saves nothing — while a row-group-bounded scan (one
    # task at sf0.1) would otherwise build every array serially. The
    # explicit width pins the exchange against AQE's byte-minimum
    # coalescing (same discipline as the co-purchase edge build).
    from lakeapi_spark.operators.scale import plan_partitions

    spark_ctx = facts.sparkSession.sparkContext
    staged = facts.select(
        F.col(group_col).alias("_k"), F.col(weight_col).cast("long").alias("_w")
    )
    staged = staged.repartition(
        max(spark_ctx.defaultParallelism, plan_partitions(staged)), "_k"
    )
    per_group = staged.groupBy("_k").agg(
        F.collect_list("_w").alias("_ws"),
        F.count(F.lit(1)).alias("_n"),
        F.sum("_w").alias("_wsum"),
    )
    j = per_group.join(
        headers.select(
            F.col(header_key).alias("_k"),
            F.col(total_col).cast("long").alias("_t"),
            *rollup_cols,
        ),
        "_k",
    )
    terms = j.select(
        *rollup_cols,
        "_n",
        "_t",
        F.when(
            F.col("_wsum") > 0,
            F.expr("aggregate(_ws, 0L, (a, x) -> a + (_t * x) div _wsum)"),
        ).alias("_bsum"),
    ).select(
        *rollup_cols,
        "_n",
        "_bsum",
        # guard on _bsum: least/greatest SKIP nulls, so an unguarded
        # clamp would turn a W<=0 group's NULL remainder into n bumps
        F.when(
            F.col("_bsum").isNotNull(),
            F.greatest(
                F.lit(0).cast("long"),
                F.least(F.col("_n"), F.col("_t") - F.col("_bsum")),
            ),
        ).alias("_bump"),
    )
    return terms.groupBy(*rollup_cols).agg(
        F.sum("_n").alias("n_items"),
        F.sum(F.col("_bsum") + F.col("_bump")).cast("long").alias("alloc_cents"),
        F.sum("_bump").alias("n_bumped"),
    )


def roc_auc(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    digits: int = 6,
) -> DataFrame:
    """Per-group EXACT ROC-AUC of ``score_col`` predicting the binary
    ``label_col`` — the Mann-Whitney U identity with midrank tie
    handling, kept INTEGER until the single final division:

        2*R_pos = sum over tie-groups of p_g * (2*before_g + n_g + 1)
        AUC     = (2*R_pos - P*(P+1)) / (2*P*N)

    where p_g/n_g are positives/rows at one score value and before_g
    the rows strictly below it. No per-row ranks materialize: the
    corpus collapses to a per-(group, score) histogram in one
    partial-agg shuffle, the cumulative walk windows over the SCORE
    DOMAIN, and the numerator/denominator are exact int64 — the same
    trick as weighted_median. Returns (group_cols..., n_pos, n_neg,
    auc); degenerate groups (single class) drop."""
    from pyspark.sql.window import Window

    lbl = F.col(label_col).cast("long")
    hist = df.groupBy(*group_cols, F.col(score_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("_n"), F.sum(lbl).alias("_p")
    )
    wb = (
        Window.partitionBy(*group_cols)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.select(
        *group_cols,
        "_n",
        "_p",
        F.coalesce(F.sum("_n").over(wb), F.lit(0)).alias("_before"),
    )
    agg = cum.groupBy(*group_cols).agg(
        F.sum("_p").alias("n_pos"),
        (F.sum("_n") - F.sum("_p")).alias("n_neg"),
        F.sum(F.col("_p") * (2 * F.col("_before") + F.col("_n") + 1)).alias("_r2"),
    )
    auc = (
        (F.col("_r2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
        / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
    )
    return agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0)).select(
        *group_cols,
        "n_pos",
        "n_neg",
        (F.round(auc, digits) + 0.0).alias("auc"),
    )


#: fixed-point scale for average_precision's per-threshold precision
#: quotient: 12 digits keeps the AP exact to ~1e-12 before the final
#: 6-digit round, and (cum_p * SCALE) stays inside int64 up to ~9.2M
#: positives per group — past that, drop a digit per 10x
_AP_SCALE = 1_000_000_000_000


def average_precision(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    label_col: str,
    digits: int = 6,
) -> DataFrame:
    """Per-group EXACT average precision (area under the precision-
    recall step curve, tie-aware) of ``score_col`` predicting the
    binary ``label_col`` — the ranking-eval companion to :func:`roc_auc`
    that class imbalance doesn't wash out:

        AP = sum over distinct scores s (descending) of
             (p_s / P) * (cum_p_s / cum_all_s)

    where p_s is positives AT score s, cum_* the counts at-or-above s
    (the threshold's recall increment times its precision). The inner
    precision quotient is computed in fixed-point integer division
    (``_AP_SCALE``) so both engines derive bit-identical sums — no
    per-row ranks, no float accumulation order: the corpus collapses
    to a per-(group, score) histogram in one partial-agg shuffle and
    the cumulative walk windows over the score domain, same shape as
    roc_auc. Returns (group_cols..., n_pos, n, ap); groups with no
    positives drop."""
    from pyspark.sql.window import Window

    lbl = F.col(label_col).cast("long")
    hist = df.groupBy(*group_cols, F.col(score_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("_n"), F.sum(lbl).alias("_p")
    )
    wd = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("_s").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        *group_cols,
        "_n",
        "_p",
        F.sum("_p").over(wd).alias("_cp"),
        F.sum("_n").over(wd).alias("_cn"),
    )
    agg = cum.groupBy(*group_cols).agg(
        F.sum("_p").alias("n_pos"),
        F.sum("_n").alias("n"),
        F.sum(
            F.col("_p") * F.expr(f"(_cp * {_AP_SCALE}) div _cn")
        ).alias("_num"),
    )
    ap = F.col("_num").cast("double") / (
        F.col("n_pos") * F.lit(_AP_SCALE)
    ).cast("double")
    return agg.filter(F.col("n_pos") > 0).select(
        *group_cols, "n_pos", "n", (F.round(ap, digits) + 0.0).alias("ap")
    )


def acf_zero_filled(
    daily: DataFrame,
    day_col: str,
    val_col: str,
    max_lag: int = 7,
    digits: int = 6,
) -> DataFrame:
    """Sample autocorrelation function of a daily integer series at
    lags 1..``max_lag`` — the seasonality probe run before picking a
    forecast model (a weekly cycle shows as a lag-7 spike). The series
    is the ZERO-FILLED span [min_day, max_day]: days absent from
    ``daily`` count as 0, so the estimator matches the textbook ACF
    over a regular grid without materializing gap rows:

        acf_k = sum_t (x_t - mean)(x_{t+k} - mean) / sum_t (x_t - mean)^2

    Multiplying both sides by n^2 clears the rational mean: numerator
    n^2*A_k - n*S*B_k + (n-k)*S^2, denominator n^2*Q - n*S^2, where
    A_k = sum x_t*x_{t+k} (observed-day equi-join on d+k — zeros
    contribute nothing), B_k = 2S - head_k - tail_k (the k boundary
    days each end), S/Q the plain sum / sum of squares. Every input is
    an exact int64 (caller keeps values inside ~3e15 — sum-of-squares
    must not overflow), so the one final double expression is
    engine-deterministic. Scale shape: one series-sized aggregate, one
    k-exploded equi-join (series stays tiny relative to the fact table
    it aggregates), no per-lag passes. Returns (lag, n_pairs, acf)."""
    # r13 single-pass shape: the series is GRID-BOUNDED (one row per
    # observed day — thousands of rows regardless of fact-table size),
    # so the whole estimator collapses into one aggregation row: sort
    # the (day, value) points, expand to the dense zero-filled span as
    # an int64 array, and compute every A_k / boundary sum as
    # higher-order array folds. The previous spelling (persist + a
    # k-exploded self-join + two more joins) paid ~14 extra Spark jobs
    # of scheduler overhead for identical integers. All arithmetic
    # stays exact int64 until the single final double expression,
    # which is written in the same order as before.
    zero = F.lit(0).cast("long")
    row = daily.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(day_col).cast("long").alias("d"),
                    F.col(val_col).cast("long").alias("x"),
                )
            )
        ).alias("_pts")
    ).filter(F.size("_pts") > 0)
    pts = F.col("_pts")
    # dense span [mn, mx]: each point contributes (gap zeros ++ [x]);
    # observed-day mask alongside so row-presence semantics match the
    # old observed-day equi-join exactly (a lag row only exists when
    # some (d, d+k) pair is OBSERVED, even if its values are 0)
    gap = lambda p, i: F.when(i == 0, F.lit(0)).otherwise(  # noqa: E731
        p["d"] - F.element_at(pts, i)["d"] - 1
    ).cast("int")
    row = row.select(
        F.flatten(
            F.transform(
                pts,
                lambda p, i: F.concat(
                    F.array_repeat(zero, gap(p, i)), F.array(p["x"])
                ),
            )
        ).alias("_dx"),
        F.flatten(
            F.transform(
                pts,
                lambda p, i: F.concat(
                    F.array_repeat(F.lit(0), gap(p, i)), F.array(F.lit(1))
                ),
            )
        ).alias("_ob"),
    )
    dx, ob = F.col("_dx"), F.col("_ob")
    n_i = F.size(dx)
    s_i = F.aggregate(dx, zero, lambda a, v: a + v)
    q_i = F.aggregate(dx, zero, lambda a, v: a + v * v)
    # per-lag folds over index positions: element_at is O(1) on arrays
    lags = F.transform(
        F.sequence(F.lit(1), F.lit(max_lag)),
        lambda k: F.struct(
            k.cast("long").alias("k"),
            F.aggregate(
                F.sequence(F.lit(1), F.greatest(n_i - k, F.lit(1))),
                zero,
                lambda a, i: a
                + F.when(
                    i <= n_i - k, F.element_at(dx, i) * F.element_at(dx, i + k)
                ).otherwise(zero),
            ).alias("ak"),
            F.aggregate(
                F.sequence(F.lit(1), F.greatest(n_i - k, F.lit(1))),
                zero,
                lambda a, i: a
                + F.when(
                    i <= n_i - k,
                    (F.element_at(ob, i) * F.element_at(ob, i + k)).cast("long"),
                ).otherwise(zero),
            ).alias("npob"),
            F.aggregate(F.slice(dx, 1, k.cast("int")), zero, lambda a, v: a + v)
            .alias("head"),
            F.aggregate(
                F.slice(dx, -k.cast("int"), k.cast("int")), zero, lambda a, v: a + v
            ).alias("tail"),
        ),
    )
    ex = row.select(
        n_i.cast("long").alias("_n"),
        s_i.alias("_s"),
        q_i.alias("_q"),
        F.explode(lags).alias("_l"),
    ).filter(F.col("_l.npob") > 0)
    n = F.col("_n").cast("double")
    s = F.col("_s").cast("double")
    q = F.col("_q").cast("double")
    kd = F.col("_l.k").cast("double")
    bk = 2 * s - F.col("_l.head").cast("double") - F.col("_l.tail").cast("double")
    num = n * n * F.col("_l.ak").cast("double") - n * s * bk + (n - kd) * s * s
    den = n * n * q - n * s * s
    return ex.select(
        F.col("_l.k").alias("lag"),
        (F.col("_n") - F.col("_l.k")).cast("long").alias("n_pairs"),
        (F.round(num / den, digits) + 0.0).alias("acf"),
    )


#: Poisson(1) inverse-CDF thresholds (cumulative e^-1 * 1/k! sums),
#: written as full-precision double literals so both engines compare
#: the same doubles; weights cap at 8 (P(X>8) ~ 1e-6)
_POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.919698602928606,
    0.9810118431238462,
    0.9963401531726563,
    0.999405815182418,
    0.9999167588507119,
    0.9999897508033253,
]


def bootstrap_mean_ci(
    df: DataFrame,
    id_col: str,
    val_col: str,
    n_reps: int = 40,
    trim: int = 1,
    unit: float = 1.0,
    digits: int = 6,
    cache_handles: list | None = None,
) -> DataFrame:
    """Percentile-bootstrap confidence interval for the mean of
    ``val_col`` (int64) via the ONLINE Poisson bootstrap (Oza-Russell /
    Chamandy et al.): instead of resampling n rows with replacement
    (which needs n known and a global shuffle per replicate), each
    row's multiplicity in replicate b is a Poisson(1) draw — here
    DERANDOMIZED from the row id, so both engines draw identical
    weights and the whole statistic is value-exact, not just
    distributionally right.

    One md5 per ROW seeds a per-row LCG whose b-th state is jumped to
    directly with precomputed (A_b, C_b) literals — h_b = (A_b*seed +
    C_b) mod 2^31, all exact int64 — so the per-replicate uniform
    costs one multiply-add-mod instead of one md5 (40x fewer hash
    calls; md5 dominated the first implementation's runtime).
    Within-row replicate draws are LCG-correlated rather than fully
    independent — immaterial for percentile intervals, which average
    within replicates and only order across them.

    Scale shape: one row -> ``n_reps`` weighted copies via an exploded
    sequence (no data shuffle — the only exchange is the B-group
    partial-aggregated sum), replicate means are exact integer ratios,
    and the CI is an order statistic over the B-row relation: drop the
    ``trim`` lowest/highest replicate means (trim=1, B=40 ~ a 95%
    percentile interval); the high bound is rank-picked DESCENDING so
    it survives replicates dropped for all-zero weights. Returns one
    row (n_replicates, ci_lo, mean_full, ci_hi) — n_replicates is the
    SURVIVING replicate count (< n_reps flags a degenerate tiny
    input), values divided by ``unit`` (e.g. 100 for cents->currency)
    and rounded.

    ``mean_full`` rides the SAME exploded pass as a pseudo-replicate
    ``b = -1`` whose weight is the constant 1 (r13, guide §2.4): its
    group sums are then exactly sum(x) / count(*) in int64, so the
    rounded mean is bit-identical to a separate full-table aggregate —
    which used to be one, scanning the input a second time. The
    (n_reps + 1)-row group aggregate is persisted so the CI branch and
    the mean branch share one corpus pass."""
    from pyspark.sql.window import Window

    from lakeapi_spark.operators.scale import TEXT_TASK_BYTES, fan_out, lit_array
    from lakeapi_spark.operators.text import portable_hash60

    m_mod = 1 << 31
    jumps = _lcg_jumps(n_reps)

    # fan_out before the explode (guide §2.5): the n_reps-way row
    # expansion and its per-copy md5/LCG arithmetic are the operator's
    # whole cost, and a narrow single-file scan would run them all in
    # one task (r13: the 40x explode of a one-row-group orders table
    # was a single 0.67 s task; spread, the stage tracks core count).
    base = fan_out(
        df.select(F.col(id_col).alias("_id"), F.col(val_col).alias("_x")),
        per_partition_bytes=TEXT_TASK_BYTES,
    )
    seeded = base.select(
        "_x",
        (portable_hash60(F.col("_id").cast("string")) % F.lit(m_mod)).alias("_h0"),
    )
    r = seeded.select(
        "_x", "_h0",
        F.explode(F.sequence(F.lit(-1), F.lit(n_reps - 1))).alias("b"),
    )
    # b = -1 is the mean_full pseudo-replicate: weight 1 for every row.
    # Its LCG index is clamped to a valid array slot (the drawn uniform
    # is never used on that branch).
    idx = F.greatest(F.col("b") + 1, F.lit(1))
    # one parsed literal array each, not 2*n_reps F.lit round-trips
    # (scale.lit_array — guide §5)
    A_b = F.element_at(lit_array([a for a, _ in jumps], "long"), idx)
    C_b = F.element_at(lit_array([c for _, c in jumps], "long"), idx)
    u = ((A_b * F.col("_h0") + C_b) % F.lit(m_mod)).cast("double") / F.lit(
        float(m_mod)
    )
    w = F.when(F.col("b") == -1, F.lit(1)).when(u < _POISSON1_CDF[0], F.lit(0))
    for k in range(1, len(_POISSON1_CDF)):
        w = w.when(u < _POISSON1_CDF[k], F.lit(k))
    w = w.otherwise(F.lit(len(_POISSON1_CDF)))
    m = (
        r.select("b", (w.cast("long") * F.col("_x")).alias("_wx"), w.cast("long").alias("_w"))
        .groupBy("b")
        .agg(F.sum("_wx").alias("_s"), F.sum("_w").alias("_n"))
        .filter(F.col("_n") > 0)
        # (n_reps + 1) rows: CI branch + mean branch share the persisted
        # relation. coalesce(1) narrows only the FINAL agg merge (the
        # partial aggregation of the exploded corpus stays at stage
        # width) so every downstream job over the 41-row cache runs 1
        # task instead of 32 — and the rank windows' SinglePartition
        # requirement is already satisfied.
        .coalesce(1)
        .persist()
    )
    # cache_handles: the (n_reps+1)-row aggregate above is persisted;
    # long-lived serving sessions pass a list and unpersist() after
    # their action (the dsir/minhash release convention — ADVICE r13:
    # repeated calls otherwise accumulate orphaned cache entries until
    # an external clearCache)
    if cache_handles is not None:
        cache_handles.append(m)
    mean_b = F.round(
        F.col("_s").cast("double") / F.col("_n").cast("double") / F.lit(unit),
        digits,
    )
    # ci_hi comes from a DESCENDING rank so it stays correct when a
    # degenerate replicate (all Poisson weights zero) is filtered out:
    # an ascending rank of n_reps - trim would match nothing and
    # silently NULL the bound. n_replicates reports the SURVIVING
    # count so a dropped replicate is visible in the output.
    #
    # ONE aggregate over the 41-row cache (r14, guide §5): the rank
    # windows PARTITION on the is-replicate flag instead of filtering
    # first, so the b = -1 mean_full row rides the same relation and
    # the former ci ⨯ full crossJoin (two branch jobs over the cache)
    # folds into a single pass. Ranks within the b >= 0 partition are
    # identical to the filtered formulation; the b = -1 partition's
    # rank is never read.
    is_rep = F.col("b") >= 0
    rk = m.select("b", "_s", "_n", mean_b.alias("mean_b")).select(
        "b",
        "_s",
        "_n",
        "mean_b",
        F.row_number()
        .over(Window.partitionBy(is_rep).orderBy("mean_b", "b"))
        .alias("rnk"),
        F.row_number()
        .over(
            Window.partitionBy(is_rep).orderBy(
                F.col("mean_b").desc(), F.col("b").desc()
            )
        )
        .alias("rnk_d"),
    )
    # min-over-guarded-when keeps the one-row shape on EMPTY input
    return rk.agg(
        # coalesce: SUM over an empty relation is NULL where the old
        # COUNT(*) over the filtered branch was 0
        F.coalesce(F.sum(is_rep.cast("long")), F.lit(0))
        .cast("long")
        .alias("n_replicates"),
        (
            F.min(F.when(is_rep & (F.col("rnk") == trim + 1), F.col("mean_b")))
            + 0.0
        ).alias("ci_lo"),
        (
            F.round(
                F.min(F.when(F.col("b") == -1, F.col("_s"))).cast("double")
                / F.min(F.when(F.col("b") == -1, F.col("_n"))).cast("double")
                / F.lit(unit),
                digits,
            )
            + 0.0
        ).alias("mean_full"),
        (
            F.min(F.when(is_rep & (F.col("rnk_d") == trim + 1), F.col("mean_b")))
            + 0.0
        ).alias("ci_hi"),
    )


def _lcg_jumps(n_reps: int) -> list[tuple[int, int]]:
    """(A_b, C_b) jump constants so h_b = (A_b*seed + C_b) mod 2^31
    lands the b-th state of the glibc LCG directly — shared by the
    Poisson bootstrap and the permutation test (one md5 per row, one
    multiply-add-mod per replicate)."""
    a_mul, c_add, m_mod = 1103515245, 12345, 1 << 31
    out = []
    A, C = 1, 0
    for _ in range(n_reps):
        A = (a_mul * A) % m_mod
        C = (a_mul * C + c_add) % m_mod
        out.append((A, C))
    return out


def permutation_test_means(
    df: DataFrame,
    id_col: str,
    val_col: str,
    group_col: str,
    n_reps: int = 60,
    digits: int = 6,
) -> DataFrame:
    """Two-sample permutation test for a difference in means — the
    assumption-free significance readout (no normality, no equal
    variance) an experiment pipeline runs when the z-test's
    assumptions are in doubt. ``group_col`` must be 0/1. Under H0 the
    labels are exchangeable: each replicate b re-assigns every row to
    pseudo-group A with probability n_a/n, DERANDOMIZED — the row's
    md5 seed jumped to replicate b with precomputed LCG literals
    (:func:`_lcg_jumps`), and the Bernoulli threshold test done as an
    EXACT integer cross-multiplication (h_b * n < n_a * 2^31), so
    both engines materialize identical pseudo-assignments. p_value =
    (1 + #{b : |diff_b| >= |diff_obs|}) / (B + 1), the standard
    add-one estimator. Replicate stats are rationals of exact int64
    sums; comparisons are engine-identical doubles.

    Scale shape: the bootstrap's — rows explode xB with no raw-data
    shuffle, one B-group partial-aggregated sum, order statistics
    over the B-row relation. Returns one row
    (n_a, n_b, diff_obs, n_reps, n_ge, p_value)."""
    from lakeapi_spark.operators.scale import lit_array
    from lakeapi_spark.operators.text import portable_hash60

    m_mod = 1 << 31
    jumps = _lcg_jumps(n_reps)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(val_col).cast("long").alias("_x"),
        F.col(group_col).cast("int").alias("_g"),
    )
    tot = base.agg(
        F.sum(F.col("_g").cast("long")).alias("n_a"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("_g") == 1, F.col("_x"))).alias("sa"),
        F.sum(F.when(F.col("_g") == 0, F.col("_x"))).alias("sb"),
        F.sum(
            F.when(F.col("_g").isin(0, 1), F.lit(0)).otherwise(F.lit(1))
        ).alias("n_bad"),
    ).first()
    # Contract checks on the same (already-run) totals aggregate — a
    # violated contract must raise a named error here, not surface as
    # int(None) TypeError / ZeroDivisionError downstream.
    if tot.n_bad:
        raise ValueError(
            f"permutation_test_means: {group_col} must be 0/1; "
            f"{tot.n_bad} row(s) have other/null values"
        )
    n_a, n = int(tot.n_a or 0), int(tot.n)
    n_b = n - n_a
    if n_a <= 0 or n_b <= 0:
        raise ValueError(
            f"permutation_test_means: both groups must be non-empty "
            f"({group_col}=1: {n_a} rows, {group_col}=0: {n_b} rows)"
        )
    sa, sb = int(tot.sa), int(tot.sb)
    diff_obs = abs(sa / n_a - sb / n_b)
    seeded = base.select(
        "_x",
        (portable_hash60(F.col("_id").cast("string")) % F.lit(m_mod)).alias("_h0"),
    )
    r = seeded.select(
        "_x", "_h0",
        F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1))).alias("b"),
    )
    A_b = F.element_at(lit_array([a for a, _ in jumps], "long"), F.col("b") + 1)
    C_b = F.element_at(lit_array([c for _, c in jumps], "long"), F.col("b") + 1)
    hb = (A_b * F.col("_h0") + C_b) % F.lit(m_mod)
    in_a = (hb * F.lit(n)) < F.lit(n_a * m_mod)  # exact integer Bernoulli
    rep = (
        r.select(
            "b",
            F.when(in_a, F.col("_x")).alias("_xa"),
            F.when(~in_a, F.col("_x")).alias("_xb"),
        )
        .groupBy("b")
        .agg(
            F.sum("_xa").alias("_sa"),
            F.count("_xa").alias("_na"),
            F.sum("_xb").alias("_sb"),
            F.count("_xb").alias("_nb"),
        )
        .filter((F.col("_na") > 0) & (F.col("_nb") > 0))
    )
    stat = F.abs(
        F.col("_sa").cast("double") / F.col("_na").cast("double")
        - F.col("_sb").cast("double") / F.col("_nb").cast("double")
    )
    agg = rep.agg(
        F.sum((stat >= F.lit(diff_obs)).cast("long")).alias("n_ge"),
        F.count(F.lit(1)).alias("n_used"),
    )
    return agg.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        (F.round(F.lit(diff_obs), digits) + 0.0).alias("diff_obs"),
        F.col("n_used").cast("long").alias("n_reps"),
        F.col("n_ge").cast("long").alias("n_ge"),
        (
            F.round(
                (F.col("n_ge") + 1).cast("double")
                / (F.col("n_used") + 1).cast("double"),
                digits,
            )
            + 0.0
        ).alias("p_value"),
    )


def isotonic_fit_minimax(
    binned: DataFrame,
    bin_col: str,
    pos_col: str,
    n_col: str,
    digits: int = 6,
) -> DataFrame:
    """Weighted isotonic regression of a per-bin positive rate — the
    monotone calibrator (PAV fit) behind isotonic probability
    calibration, computed EXACTLY through the minimax identity instead
    of the sequential pool-adjacent-violators loop:

        iso(i) = max over j<=i of  min over k>=i of
                 ( sum pos[j..k] / sum n[j..k] )

    which is declarative: prefix sums over the BIN relation, an
    (i, j, k) triple join with j<=i<=k, and two tiny groupBys (min
    over k per (i,j), max over j per i). O(B^3) in the number of BINS
    — the whole point: the corpus collapses to B rows in one
    partial-agg shuffle first, and B is a dial (20 here), so the
    cubic term is constant work while PAV's sequential pooling would
    need a driver loop or a stateful kernel. Interval means are
    rationals of exact int64 prefix sums evaluated identically in
    both engines. Returns (bin, n, pos, raw_rate, iso_rate), iso_rate
    monotone non-decreasing in bin."""
    from pyspark.sql.window import Window

    b = binned.select(
        F.col(bin_col).alias("_b"),
        F.col(pos_col).cast("long").alias("_p"),
        F.col(n_col).cast("long").alias("_n"),
    )
    w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    pre = b.select(
        "_b", "_p", "_n",
        F.sum("_p").over(w).alias("_cp"),
        F.sum("_n").over(w).alias("_cn"),
    )
    j = pre.select(
        F.col("_b").alias("_j"),
        (F.col("_cp") - F.col("_p")).alias("_cpj"),  # prefix BEFORE j
        (F.col("_cn") - F.col("_n")).alias("_cnj"),
    )
    k = pre.select(
        F.col("_b").alias("_k"), F.col("_cp").alias("_cpk"), F.col("_cn").alias("_cnk")
    )
    i = pre.select("_b", "_p", "_n")
    mean_jk = (F.col("_cpk") - F.col("_cpj")).cast("double") / (
        F.col("_cnk") - F.col("_cnj")
    ).cast("double")
    triples = (
        i.join(F.broadcast(j), F.col("_j") <= F.col("_b"))
        .join(F.broadcast(k), F.col("_k") >= F.col("_b"))
        .filter(F.col("_j") <= F.col("_k"))
        .select("_b", "_p", "_n", "_j", mean_jk.alias("_m"))
    )
    inner = triples.groupBy("_b", "_p", "_n", "_j").agg(F.min("_m").alias("_mn"))
    iso = inner.groupBy("_b", "_p", "_n").agg(F.max("_mn").alias("_iso"))
    raw = F.col("_p").cast("double") / F.col("_n").cast("double")
    return iso.select(
        F.col("_b").alias("bin"),
        F.col("_n").alias("n"),
        F.col("_p").alias("pos"),
        (F.round(raw, digits) + 0.0).alias("raw_rate"),
        (F.round(F.col("_iso"), digits) + 0.0).alias("iso_rate"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    order_cols: list[str],
    n_bins: int = 10,
    score_scale: int = 100,
    digits: int = 6,
) -> DataFrame:
    """Reliability diagram data: rows sort into ``n_bins`` equal-count
    bins by (score, order_cols) — ntile over a TOTAL order, so the
    binning is engine-deterministic even with tied scores — and each
    bin reports its mean score vs observed positive rate plus the
    |gap| term that sums to expected calibration error. Means are
    exact integer ratios (scores quantize to ``score_scale`` units,
    labels are 0/1 counts), so both engines emit identical doubles.
    Returns (bin, n, mean_score, pos_rate, abs_gap).

    Scale note (r13 window-audit sweep): with a single tiebreak column
    the equal-count bins come from the BANDED path — exact boundary
    tuples via histogram-guided selection + map-side assignment
    (operators/windows.ntile_banded, NTILE-identical by construction)
    — so score columns of any size bin without a global sort. The
    multi-tiebreak fallback keeps the unpartitioned ntile window and
    inherits its eval-set boundedness argument."""
    from pyspark.sql.window import Window

    sq = F.round(F.col(score_col).cast("double") * score_scale, 0).cast("long")
    if len(order_cols) == 1:
        from lakeapi_spark.operators.windows import ntile_banded

        base = df.select(
            F.col(score_col).alias("_s"),
            F.col(order_cols[0]).alias("_k"),
            F.col(label_col).cast("long").alias("_y"),
        )
        binned = ntile_banded(base, "_s", "_k", n_bins, tile_col="bin").select(
            F.round(F.col("_s").cast("double") * score_scale, 0)
            .cast("long")
            .alias("_sq"),
            "_y",
            "bin",
        )
        return _calibration_readout(binned, score_scale, digits)
    w = Window.orderBy(F.col(score_col), *[F.col(c) for c in order_cols])
    binned = df.select(
        sq.alias("_sq"),
        F.col(label_col).cast("long").alias("_y"),
        F.ntile(n_bins).over(w).alias("bin"),
    )
    return _calibration_readout(binned, score_scale, digits)


def _calibration_readout(binned: DataFrame, score_scale: int, digits: int) -> DataFrame:
    mean_score = F.sum("_sq").cast("double") / (
        F.count(F.lit(1)) * score_scale
    ).cast("double")
    pos_rate = F.sum("_y").cast("double") / F.count(F.lit(1)).cast("double")
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(mean_score, digits) + 0.0).alias("mean_score"),
        (F.round(pos_rate, digits) + 0.0).alias("pos_rate"),
        (F.round(F.abs(mean_score - pos_rate), digits) + 0.0).alias("abs_gap"),
    )


def ndcg_at_k(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    rel_col: str,
    order_cols: list[str],
    k: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Per-group NDCG@k — the ranking-quality metric for search/RAG
    retrievers: DCG sums (2^rel - 1)/log2(rank+1) down the SCORE
    ordering, IDCG down the ideal (relevance) ordering, NDCG their
    ratio. Both orderings break ties through ``order_cols`` so ranks
    are total and engine-identical; each position's term is ROUNDED(9)
    and accumulated in DECIMAL before the one final division (the same
    round-before-sum discipline as text.unigram_logprob — a bare double
    SUM's value depends on partition order). Returns
    (group_cols..., dcg, idcg, ndcg); groups with zero ideal gain drop.

    Two windows over the per-group candidate lists (bounded by the
    retriever's candidate count, never the corpus) + one partial-agg
    groupBy."""
    from pyspark.sql.window import Window

    tie = [F.col(c) for c in order_cols]
    w_act = Window.partitionBy(*group_cols).orderBy(F.col(score_col).desc(), *tie)
    w_idl = Window.partitionBy(*group_cols).orderBy(F.col(rel_col).desc(), *tie)
    gain = F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - 1.0
    ranked = df.select(
        *group_cols,
        F.round(gain / F.log2(F.row_number().over(w_act) + 1), 9)
        .cast("decimal(28,12)")
        .alias("_dg"),
        F.round(gain / F.log2(F.row_number().over(w_idl) + 1), 9)
        .cast("decimal(28,12)")
        .alias("_ig"),
        F.row_number().over(w_act).alias("_ra"),
        F.row_number().over(w_idl).alias("_ri"),
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("_ra") <= k, F.col("_dg")).otherwise(F.lit(0)))
        .cast("double")
        .alias("_dcg"),
        F.sum(F.when(F.col("_ri") <= k, F.col("_ig")).otherwise(F.lit(0)))
        .cast("double")
        .alias("_idcg"),
    )
    return agg.filter(F.col("_idcg") > 0).select(
        *group_cols,
        (F.round(F.col("_dcg"), digits) + 0.0).alias("dcg"),
        (F.round(F.col("_idcg"), digits) + 0.0).alias("idcg"),
        (F.round(F.col("_dcg") / F.col("_idcg"), digits) + 0.0).alias("ndcg"),
    )


def cuped_adjusted_means(
    per_user: DataFrame,
    variant_col: str,
    pre_col: str,
    post_col: str,
    digits: int = 6,
) -> DataFrame:
    """CUPED variance reduction for experiment readouts: given one row
    per unit with a PRE-period covariate x and the POST-period metric
    y, compute theta = cov(x,y)/var(x) on the POOLED data (the
    covariate predates assignment, so pooling is unbiased) and report
    each variant's raw and adjusted means —

        mean_y_adj(v) = mean_y(v) - theta * (mean_x(v) - mean_x)

    the group-mean form of y_i - theta*(x_i - mean_x), so no per-unit
    adjusted column ever materializes. Every sum accumulates in DECIMAL
    (x, y are metric values quantized upstream); theta and the means
    are then one fixed IEEE sequence — engine-exact, like ols_trend.
    Returns (variant, n_units, mean_pre, mean_post, mean_post_adj,
    theta). Degenerate var(x)=0 inputs drop (nothing to adjust with).

    Scale: the per-unit relation is |units|-sized (built by the caller
    with one fact-table groupBy); this adds one variant-keyed
    partial-agg shuffle and a broadcast single-row global-moments
    join."""
    x = F.col(pre_col).cast("double")
    y = F.col(post_col).cast("double")
    d = lambda c: c.cast("decimal(28,10)")  # noqa: E731
    per_variant = per_user.groupBy(F.col(variant_col).alias("variant")).agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(d(x)).cast("double").alias("_sx"),
        F.sum(d(y)).cast("double").alias("_sy"),
    )
    g = per_user.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(d(x)).cast("double").alias("_gsx"),
        F.sum(d(y)).cast("double").alias("_gsy"),
        F.sum(d(x * x)).cast("double").alias("_gsxx"),
        F.sum(d(x * y)).cast("double").alias("_gsxy"),
    )
    j = per_variant.crossJoin(F.broadcast(g))
    den = F.col("_n") * F.col("_gsxx") - F.col("_gsx") * F.col("_gsx")
    theta = (
        F.col("_n") * F.col("_gsxy") - F.col("_gsx") * F.col("_gsy")
    ) / den
    mean_x_g = F.col("_gsx") / F.col("_n")
    mean_x_v = F.col("_sx") / F.col("n_units")
    mean_y_v = F.col("_sy") / F.col("n_units")
    adj = mean_y_v - theta * (mean_x_v - mean_x_g)
    return j.filter(den != 0).select(
        "variant",
        "n_units",
        (F.round(mean_x_v, digits) + 0.0).alias("mean_pre"),
        (F.round(mean_y_v, digits) + 0.0).alias("mean_post"),
        (F.round(adj, digits) + 0.0).alias("mean_post_adj"),
        (F.round(theta, digits) + 0.0).alias("theta"),
    )


def conformal_interval_report(
    per_obs: DataFrame,
    split_col: str,
    y_col: str,
    pred_col: str,
    alpha: float = 0.1,
    digits: int = 6,
) -> DataFrame:
    """Split-conformal calibration: given per-observation rows tagged
    'cal' / 'test' in ``split_col`` with a prediction column, find the
    conformal half-width q_hat = the k-th smallest calibration
    |residual| with k = ceil((n_cal + 1) * (1 - alpha)) — the
    finite-sample rule whose intervals cover with probability >=
    1 - alpha — then report empirical coverage of |y - pred| <= q_hat
    on the test split. Everything is rank-picked or an integer ratio:
    no quantile interpolation, so both engines agree exactly. Returns
    one row (n_cal, k, q_hat, n_test, n_covered, coverage).

    Scale (r13 window-audit sweep): residuals are computed map-side;
    the rank pick runs through operators/windows.order_statistics —
    3-pass histogram-guided selection, so the calibration split can be
    corpus-sized without ever collapsing to one partition (the old
    global row_number is gone). q_hat is a K-bounded driver value by
    contract (it broadcasts into the coverage filter either way);
    coverage is one aggregate over the test stream."""
    import math

    from lakeapi_spark.operators.windows import order_statistics

    resid = F.abs(F.col(y_col).cast("double") - F.col(pred_col).cast("double"))
    cal = per_obs.filter(F.col(split_col) == "cal").select(resid.alias("_r"))
    info: dict[str, int] = {}

    def _rank_fn(n: int) -> list[int]:
        # same IEEE product as the old F.ceil((count+1) * (1-alpha))
        k = math.ceil((n + 1) * (1.0 - alpha))
        info.update(n_cal=n, k=k)
        return [min(k, n)]

    sel = order_statistics(cal, "_r", None, _rank_fn)
    spark = per_obs.sparkSession
    schema = "n_cal long, k long, _r double"
    rows = [(info["n_cal"], info["k"], float(sel[0][3]))] if sel else []
    q_hat = spark.createDataFrame(rows, schema).select(
        "n_cal", "k", (F.round(F.col("_r"), digits) + 0.0).alias("q_hat")
    )
    test = per_obs.filter(F.col(split_col) == "test").select(resid.alias("_r"))
    cov = test.crossJoin(F.broadcast(q_hat)).groupBy("n_cal", "k", "q_hat").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum((F.round(F.col("_r"), digits) <= F.col("q_hat")).cast("long")).alias(
            "n_covered"
        ),
    )
    return cov.select(
        "n_cal",
        "k",
        "q_hat",
        "n_test",
        "n_covered",
        (
            F.round(
                F.col("n_covered").cast("double") / F.col("n_test").cast("double"),
                digits,
            )
            + 0.0
        ).alias("coverage"),
    )


def spearman_corr(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    digits: int = 6,
) -> DataFrame:
    """Per-group Spearman rank correlation — Pearson over MIDRANKS,
    the monotonic-dependence measure robust to outliers and nonlinear
    scales that Pearson (pearson_corr) misses. Midranks stay INTEGER
    via the doubled form 2*mr = 2*(rank-1) + ties + 1 (rank = RANK()
    over the value order, ties = the value's multiplicity), so every
    sum is exact in DECIMAL(38,0) and rho is one fixed IEEE sequence —
    engine-identical, no rank interpolation to reconcile.

    Plan: both midrank windows partition by the SAME group key (one
    exchange, two sorts), then a single partial-agg groupBy. Degenerate
    groups (any zero rank variance: a constant column) drop."""
    from pyspark.sql.window import Window

    def mr2(col: str) -> "Column":
        w = Window.partitionBy(*group_cols).orderBy(col)
        wc = Window.partitionBy(*group_cols, col)
        return (
            2 * (F.rank().over(w) - 1) + F.count(F.lit(1)).over(wc) + 1
        ).cast("long")

    ranked = df.select(*group_cols, mr2(x_col).alias("_rx"), mr2(y_col).alias("_ry"))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(d(F.col("_rx"))).cast("double").alias("_sx"),
        F.sum(d(F.col("_ry"))).cast("double").alias("_sy"),
        F.sum(d(F.col("_rx") * F.col("_rx"))).cast("double").alias("_sxx"),
        F.sum(d(F.col("_ry") * F.col("_ry"))).cast("double").alias("_syy"),
        F.sum(d(F.col("_rx") * F.col("_ry"))).cast("double").alias("_sxy"),
    )
    vx = F.col("n_rows") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = F.col("n_rows") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    rho = (
        F.col("n_rows") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    ) / F.sqrt(vx * vy)
    return m.filter((vx > 0) & (vy > 0)).select(
        *group_cols, "n_rows", (F.round(rho, digits) + 0.0).alias("spearman_rho")
    )


def kendall_tau_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    digits: int = 6,
) -> DataFrame:
    """Per-group Kendall tau-a over a PRE-AGGREGATED (group, period)
    series — the Mann-Kendall-style monotonic trend test that pairs
    naturally with :func:`theil_sen_trend`'s slope (same bounded
    O(periods^2) pair join, same 'is the trend real' question):

        tau = (concordant - discordant) / (n_pairs)

    over all x1 < x2 pairs, y-ties counting as neither. Concordance is
    integer counting, the division one IEEE op — engine-exact. Returns
    (group_cols..., n_pairs, n_concordant, n_discordant, tau); groups
    with < 2 points drop."""
    series = df.select(
        *group_cols,
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    )
    b = series.select(
        *group_cols, F.col("_x").alias("_x2"), F.col("_y").alias("_y2")
    )
    pairs = series.join(b, on=list(group_cols)).filter(F.col("_x") < F.col("_x2"))
    sign = F.signum(F.col("_y2") - F.col("_y"))
    agg = pairs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((sign > 0).cast("long")).alias("n_concordant"),
        F.sum((sign < 0).cast("long")).alias("n_discordant"),
    )
    tau = (
        (F.col("n_concordant") - F.col("n_discordant")).cast("double")
        / F.col("n_pairs").cast("double")
    )
    return agg.select(
        *group_cols,
        "n_pairs",
        "n_concordant",
        "n_discordant",
        (F.round(tau, digits) + 0.0).alias("tau"),
    )


# ---------------------------------------------------------------------------
# Round 11: rank-sum test, contingency independence, portable normal CDF
# ---------------------------------------------------------------------------


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    digits: int = 6,
) -> DataFrame:
    """Mann-Whitney U rank-sum test of ``group_a`` vs ``group_b``
    values (two-sided normal approximation WITH tie correction) — the
    nonparametric two-sample test to reach for when a t/z test's
    normality assumption is the question. One row:
    (n_a, n_b, u_stat, z).

    Never ranks rows: the same histogram-collapse shape as the
    ROC-AUC query — aggregate to per-distinct-value (n_a, n_b) counts
    first (one keyed shuffle over the fact stream), then rank
    arithmetic over the BOUNDED distinct-value relation. Midranks are
    half-integers, so they sum exactly in DECIMAL(28,1); U derives
    from that exact sum, and only the final (U - mu) / sigma touches
    floating point — the same expression spelling on both engines.

        avg_rank(v) = (#values < v) + (tie_count(v) + 1) / 2
        U  = R_A - n_a(n_a+1)/2
        mu = n_a n_b / 2
        sigma^2 = n_a n_b / 12 * ((N+1) - sum(t^3 - t) / (N(N-1)))
    """
    from pyspark.sql.window import Window

    vals = df.filter(
        F.col(group_col).isin(group_a, group_b) & F.col(value_col).isNotNull()
    ).select(
        F.col(value_col).alias("_v"),
        (F.col(group_col) == group_a).cast("long").alias("_a"),
    )
    hist = vals.groupBy("_v").agg(
        F.sum("_a").alias("na"), F.sum(F.lit(1) - F.col("_a")).alias("nb")
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    t = F.col("na") + F.col("nb")
    ranked = hist.select(
        "na",
        t.alias("t"),
        F.coalesce(F.sum(F.col("na") + F.col("nb")).over(w), F.lit(0)).alias(
            "before"
        ),
    )
    avg_rank = (
        F.col("before").cast("decimal(28,1)")
        + (F.col("t") + 1).cast("decimal(28,1)") / 2
    )
    agg = ranked.agg(
        F.sum(F.col("na").cast("decimal(28,1)") * avg_rank).alias("ra"),
        F.sum("na").alias("n_a"),
        F.sum(F.col("t") - F.col("na")).alias("n_b"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("ties"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    n = n_a + n_b
    u = F.col("ra").cast("double") - (n_a * (n_a + 1)).cast("double") / 2
    mu = (n_a * n_b).cast("double") / 2
    sigma = F.sqrt(
        (n_a * n_b).cast("double")
        / 12
        * (
            (n + 1).cast("double")
            - F.col("ties").cast("double") / (n * (n - 1)).cast("double")
        )
    )
    return agg.select(
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        u.alias("u_stat"),
        # degenerate contract: an empty side or an all-tied pool has no
        # sampling distribution — NULL, never an IEEE infinity
        F.when(sigma > 0, F.round((u - mu) / sigma, digits) + 0.0).alias("z"),
    )


def chi_square_independence(
    df: DataFrame, a_col: str, b_col: str, digits: int = 6
) -> DataFrame:
    """Pearson chi-square test of independence for two categorical
    columns, plus Cramér's V effect size. One row:
    (n, dof, chi2, cramers_v).

    One fact-stream aggregate to the (a, b) contingency cells; row and
    column margins come from windows OVER THE CELL RELATION (bounded
    by the category product, not the data). Each cell's (O-E)^2/E is
    computed in double with a fixed expression order, then
    decimal-cast before the final sum so the reduction commutes — the
    engine-parity discipline of the rest of this module."""
    from pyspark.sql.window import Window

    cells = (
        df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .groupBy(F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    wa = Window.partitionBy("_a")
    wb = Window.partitionBy("_b")
    wt = Window.partitionBy()
    m = cells.select(
        "_a",
        "_b",
        "o",
        F.sum("o").over(wa).alias("ra"),
        F.sum("o").over(wb).alias("cb"),
        F.sum("o").over(wt).alias("n"),
    )
    e = F.col("ra").cast("double") * F.col("cb").cast("double") / F.col("n").cast("double")
    contrib = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    agg = m.agg(
        F.sum(contrib.cast("decimal(28,10)")).alias("chi2d"),
        F.countDistinct("_a").alias("r"),
        F.countDistinct("_b").alias("c"),
        F.max("n").alias("n"),
    )
    chi2 = F.col("chi2d").cast("double")
    mindim = F.least(F.col("r") - 1, F.col("c") - 1)
    return agg.select(
        F.col("n"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        (F.round(chi2, digits) + 0.0).alias("chi2"),
        F.when(
            mindim > 0,
            F.round(
                F.sqrt(chi2 / (F.col("n").cast("double") * mindim.cast("double"))),
                digits,
            )
            + 0.0,
        ).alias("cramers_v"),  # single-category margin: V undefined -> NULL
    )


def normal_sf_two_sided(z) -> "F.Column":
    """Two-sided normal-tail p-value 2*(1 - Phi(|z|)) via the
    Abramowitz & Stegun 26.2.17 polynomial (|error| < 7.5e-8) — pure
    arithmetic + exp, spelled IDENTICALLY in the SQL twin
    (:data:`NORMAL_SF_TWO_SIDED_SQL`), because neither engine ships a
    normal CDF. p = 2 * phi(z) * poly(t), t = 1/(1 + 0.2316419 |z|)."""
    az = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * az)
    poly = t * (
        F.lit(0.319381530)
        + t
        * (
            F.lit(-0.356563782)
            + t
            * (
                F.lit(1.781477937)
                + t * (F.lit(-1.821255978) + t * F.lit(1.330274429))
            )
        )
    )
    pdf = F.lit(0.3989422804014327) * F.exp(-az * az / 2)
    return 2 * pdf * poly


#: the DuckDB spelling of :func:`normal_sf_two_sided` — substitute the
#: z expression for {z}
NORMAL_SF_TWO_SIDED_SQL = (
    "2 * 0.3989422804014327 * EXP(-ABS({z}) * ABS({z}) / 2) * "
    "((1.0 / (1.0 + 0.2316419 * ABS({z}))) * (0.319381530 + "
    "(1.0 / (1.0 + 0.2316419 * ABS({z}))) * (-0.356563782 + "
    "(1.0 / (1.0 + 0.2316419 * ABS({z}))) * (1.781477937 + "
    "(1.0 / (1.0 + 0.2316419 * ABS({z}))) * (-1.821255978 + "
    "(1.0 / (1.0 + 0.2316419 * ABS({z}))) * 1.330274429)))))"
)
