"""Join operators beyond Spark's built-in surface.

The reference itself implements no joins (SURVEY §2.4) — equi/semi/anti
joins and set ops are inherited through its SQL endpoint, and ours
through ``spark.sql`` / ``DataFrame.join``. This module adds the one
time-series join large pipelines keep re-inventing and Spark lacks as a
built-in: the **as-of join** (for each left row, the most recent right
row at-or-before it, per key).

Spark-first formulation — the union + running-last trick:

    union(left tagged 1, right tagged 0 with payload struct)
      -> window last(payload, ignoreNulls) over
         (PARTITION BY keys ORDER BY ts, tag ROWS UNBOUNDED PRECEDING)
      -> keep tag=1 rows

One shuffle on the join keys, one sort within partitions — the same
cost profile as a sort-merge join, with no range-explosion. Skewed keys
are handled by AQE; a billion-row right side never builds a per-key
array (state is a single running struct per window frame).

Right rows sort BEFORE left rows at equal timestamps (tag 0 < 1), so
the match is inclusive: right.ts <= left.ts — the same semantics as
DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` (the oracle used in the
driver check) and pandas ``merge_asof(direction='backward')``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def range_join_binned(
    facts: DataFrame,
    val_col: str,
    ranges: DataFrame,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Interval join (fact value in [lo, hi)) via the binning trick.

    A naive inequality join is a nested-loop: every fact row against
    every range. Instead each range explodes into the fixed-width bins
    it covers and each fact row computes its single bin — the join
    becomes an EQUI-join on bin id (hashable, broadcastable, AQE-
    skew-splittable), with an exact [lo, hi) post-filter for bin edge
    overlap. Cost is |ranges| * (range_width / bin_width) extra rows on
    the (small) range side, zero expansion on the fact side — the side
    that is 100 TB.
    """
    bins = F.sequence(
        F.floor(F.col(lo_col) / bin_width).cast("long"),
        F.floor((F.col(hi_col) - 1e-9) / bin_width).cast("long"),
    )
    rb = ranges.withColumn("__bin", F.explode(bins))
    fb = facts.withColumn("__bin", F.floor(F.col(val_col) / bin_width).cast("long"))
    return (
        fb.join(F.broadcast(rb), "__bin")
        .filter((F.col(val_col) >= F.col(lo_col)) & (F.col(val_col) < F.col(hi_col)))
        .drop("__bin")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str],
    payload_cols: list[str],
    payload_prefix: str = "right_",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``payload_cols`` from
    the latest ``right`` row with ``right.ts <= left.ts`` within the
    same ``by`` keys (nulls when no such row exists).

    The matched right timestamp is exposed as ``{prefix}{ts_col}``.
    Deterministic when (by, ts) is unique on the right side; with
    duplicate right timestamps the in-frame order (and thus the match)
    is tie-broken arbitrarily — pre-aggregate the right side if that
    matters.
    """
    payload = F.struct(F.col(ts_col).alias(ts_col), *[F.col(c) for c in payload_cols])
    rp = right.select(
        *[F.col(c) for c in by],
        F.col(ts_col),
        payload.alias("__p"),
        F.lit(0).alias("__tag"),
    )
    lp = left.select("*", F.lit(None).cast(rp.schema["__p"].dataType).alias("__p"), F.lit(1).alias("__tag"))
    unioned = lp.unionByName(rp, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__m", F.last("__p", ignorenulls=True).over(w)).filter(
        F.col("__tag") == 1
    )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col(f"__m.{ts_col}").alias(f"{payload_prefix}{ts_col}"))
    out_cols.extend(F.col(f"__m.{c}").alias(f"{payload_prefix}{c}") for c in payload_cols)
    return matched.select(*out_cols)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str],
    payload_cols: list[str],
    tolerance_s: int | None = None,
    payload_prefix: str = "right_",
) -> DataFrame:
    """Forward as-of join: every ``left`` row, plus ``payload_cols``
    from the EARLIEST ``right`` row with ``right.ts >= left.ts`` within
    the same ``by`` keys — optionally only when it lands within
    ``tolerance_s`` seconds (outside-tolerance matches become NULLs,
    like pandas ``merge_asof(direction='forward', tolerance=...)``).

    Same union-and-window shape as :func:`asof_join` (one shuffle on
    ``by``, no range self-join): sort DESCENDING so the running
    last-non-null sees exactly the rows at-or-after the probe, with
    right rows winning ties so an equal timestamp matches. The
    tolerance is a post-hoc null-out — if the earliest following match
    is outside tolerance, no following match is inside it.
    """
    payload = F.struct(F.col(ts_col).alias(ts_col), *[F.col(c) for c in payload_cols])
    rp = right.select(
        *[F.col(c) for c in by],
        F.col(ts_col),
        payload.alias("__p"),
        F.lit(0).alias("__tag"),
    )
    lp = left.select(
        "*",
        F.lit(None).cast(rp.schema["__p"].dataType).alias("__p"),
        F.lit(1).alias("__tag"),
    )
    unioned = lp.unionByName(rp, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).desc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__m", F.last("__p", ignorenulls=True).over(w)).filter(
        F.col("__tag") == 1
    )
    in_tol = F.lit(True)
    if tolerance_s is not None:
        in_tol = F.unix_timestamp(F.col(f"__m.{ts_col}")) - F.unix_timestamp(
            F.col(ts_col)
        ) <= F.lit(tolerance_s)
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(
        F.when(in_tol, F.col(f"__m.{ts_col}")).alias(f"{payload_prefix}{ts_col}")
    )
    out_cols.extend(
        F.when(in_tol, F.col(f"__m.{c}")).alias(f"{payload_prefix}{c}")
        for c in payload_cols
    )
    return matched.select(*out_cols)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str],
    payload_cols: list[str],
    tolerance_s: int | None = None,
    payload_prefix: str = "right_",
) -> DataFrame:
    """Nearest as-of join (pandas ``merge_asof(direction='nearest')``):
    every ``left`` row, plus payload from whichever ``right`` row is
    CLOSEST in time within the same ``by`` keys — backward and forward
    candidates compete on absolute gap; equal gaps prefer the backward
    (at-or-before) match; ``tolerance_s`` nulls out matches farther
    than the bound. Adds ``{prefix}{ts_col}``, the payload columns,
    ``{prefix}direction`` ('backward'/'forward'/NULL) and
    ``{prefix}gap_s``.

    Composition, not a new algorithm: the backward pass
    (:func:`asof_join`) feeds the forward pass
    (:func:`asof_join_forward`) as its left side — two union+window
    passes, each ONE shuffle on ``by``, no range self-join. Requires
    unique (by, ts) on the right (pre-aggregate otherwise), or ties
    are matched arbitrarily like the underlying passes."""
    back = asof_join(left, right, ts_col, by, payload_cols, payload_prefix="__b_")
    both = asof_join_forward(
        back, right, ts_col, by, payload_cols, payload_prefix="__f_"
    )
    lts = F.unix_timestamp(F.col(ts_col))
    bts = F.unix_timestamp(F.col(f"__b_{ts_col}"))
    fts = F.unix_timestamp(F.col(f"__f_{ts_col}"))
    gap_b = lts - bts  # >= 0 when matched; whole-second resolution
    gap_f = fts - lts
    pick_back = bts.isNotNull() & (fts.isNull() | (gap_b <= gap_f))
    gap = F.when(pick_back, gap_b).otherwise(gap_f)
    in_tol = gap.isNotNull() & (
        F.lit(True) if tolerance_s is None else gap <= F.lit(int(tolerance_s))
    )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(
        F.when(
            in_tol,
            F.when(pick_back, F.col(f"__b_{ts_col}")).otherwise(
                F.col(f"__f_{ts_col}")
            ),
        ).alias(f"{payload_prefix}{ts_col}")
    )
    out_cols.extend(
        F.when(
            in_tol,
            F.when(pick_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")),
        ).alias(f"{payload_prefix}{c}")
        for c in payload_cols
    )
    out_cols.append(
        F.when(in_tol, F.when(pick_back, "backward").otherwise("forward")).alias(
            f"{payload_prefix}direction"
        )
    )
    out_cols.append(
        F.when(in_tol, gap).cast("long").alias(f"{payload_prefix}gap_s")
    )
    return both.select(*out_cols)


def blocked_fuzzy_pairs(
    df: DataFrame,
    key_col: str,
    block,
    max_dist: int,
) -> DataFrame:
    """Blocked fuzzy self-join — the entity-resolution candidate step:
    distinct keys are grouped by a cheap ``block`` expression (first
    token, soundex, prefix, ...), and ONLY within-block pairs are
    scored with Levenshtein edit distance; pairs with
    dist <= ``max_dist`` survive. Returns (name_a, name_b, dist) with
    name_a < name_b (each pair once).

    Scale shape: the naive fuzzy self-join is O(n^2) edit distances —
    unrunnable at corpus scale. Blocking turns it into one equi-join
    shuffled by block key, so compute is sum over blocks of |b|^2, and
    the block expression is the dial (tighter blocks = fewer candidate
    pairs = lower recall for cross-block typos). Distances run on the
    DISTINCT-key relation, not raw rows, and levenshtein() is a
    built-in JVM expression — no UDF. Skewed mega-blocks are split by
    AQE skew-join handling like any other hot key.

    ``block`` is a callable Column -> Column building the block key
    from the key column."""
    keys = df.select(F.col(key_col).alias("name_a")).distinct().select(
        "name_a", block(F.col("name_a")).alias("_blk")
    )
    right = keys.select(F.col("name_a").alias("name_b"), F.col("_blk"))
    return (
        keys.join(right, "_blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )


def _make_jaro_winkler():
    """Factory for the classic Jaro-Winkler scorer (Winkler's census
    record-linkage variant: boost threshold 0.7, prefix cap 4, scaling
    0.1), written to be BIT-IDENTICAL as a double to DuckDB's
    ``jaro_winkler_similarity`` (verified exact on 20k random pairs),
    so SQL oracles can use the built-in. Empty strings score 0 even
    against themselves — DuckDB's convention. Returned as a NESTED
    function so cloudpickle ships it by value into executor closures
    (the self-contained-closure rule: executors may not have
    lakeapi_spark on sys.path when the driver runs off-repo)."""

    def jw(a: str, b: str) -> float:
        la, lb = len(a), len(b)
        if la == 0 or lb == 0:
            return 0.0
        if a == b:
            return 1.0
        window = max(la, lb) // 2 - 1
        if window < 0:
            window = 0
        fa = [False] * la
        fb = [False] * lb
        m = 0
        for i in range(la):
            lo = max(0, i - window)
            hi = min(lb, i + window + 1)
            for j in range(lo, hi):
                if not fb[j] and a[i] == b[j]:
                    fa[i] = fb[j] = True
                    m += 1
                    break
        if m == 0:
            return 0.0
        t = 0
        j2 = 0
        for i in range(la):
            if fa[i]:
                while not fb[j2]:
                    j2 += 1
                if a[i] != b[j2]:
                    t += 1
                j2 += 1
        t //= 2
        jr = (m / la + m / lb + (m - t) / m) / 3
        if jr > 0.7:
            l = 0
            for x, y in zip(a, b):
                if x == y and l < 4:
                    l += 1
                else:
                    break
            jr = jr + l * 0.1 * (1 - jr)
        return jr

    return jw


#: driver-side handle (tests, ad-hoc scoring); kernels capture their
#: own _make_jaro_winkler() result as a closure value instead
_jaro_winkler = _make_jaro_winkler()


def jaro_winkler_pairs(
    df: DataFrame,
    key_col: str,
    block,
    threshold: float,
) -> DataFrame:
    """Blocked entity-resolution pairs scored with Jaro-Winkler — the
    record-linkage companion to :func:`blocked_fuzzy_pairs`: edit
    distance punishes transpositions and long shared prefixes equally;
    JW is the census-bureau standard for exactly those name-typo
    shapes. Same scale shape as the Levenshtein variant (distinct
    keys, one block-keyed equi-join, per-block quadratic candidates,
    AQE splits mega-blocks); scoring runs in an Arrow-batched
    mapInPandas kernel — per-pair Python like the multimodal codecs,
    justified because JW's zig-zag matching loop has no vectorized
    form and the blocked pair relation is tiny next to the corpus.
    Returns (name_a, name_b, jw) with name_a < name_b and
    jw = round(similarity, 4) >= ``threshold``."""
    keys = df.select(F.col(key_col).alias("name_a")).distinct().select(
        "name_a", block(F.col("name_a")).alias("_blk")
    )
    right = keys.select(F.col("name_a").alias("name_b"), F.col("_blk"))
    cand = keys.join(right, "_blk").filter(F.col("name_a") < F.col("name_b"))
    score = _make_jaro_winkler()  # closure-captured BY VALUE (nested fn)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            jw = [
                round(score(x, y), 4)
                for x, y in zip(pdf["name_a"], pdf["name_b"])
            ]
            out = pd.DataFrame(
                {"name_a": pdf["name_a"], "name_b": pdf["name_b"], "jw": jw}
            )
            yield out[out["jw"] >= threshold]

    return cand.select("name_a", "name_b").mapInPandas(
        kernel, schema="name_a string, name_b string, jw double"
    )


def interval_overlap_pairs(
    intervals: DataFrame,
    id_cols: list[str],
    start_col: str,
    end_col: str,
    bucket_s: int,
) -> DataFrame:
    """All unordered pairs of intervals that overlap in time
    ([start, end] inclusive, epoch seconds) — the interval-interval
    self-join (concurrency analysis, double-booking detection,
    co-occurring session mining). Returns (ia, ib, overlap_s) where
    ia/ib are the id-tuple structs with ia < ib and overlap_s the
    inclusive overlap length.

    Scale spelling: never an inequality cross-join. Each interval
    explodes to the time buckets it spans (width ``bucket_s``, explode
    factor span/bucket_s + 1 — pick the bucket near the typical
    interval length), candidates meet through a bucket EQUI-join that
    Spark hash-partitions like any other, each candidate pair
    materializes exactly ONCE (only in the first bucket the two
    intervals share: bk = floor(max(start_a, start_b) / bucket_s) — a
    filter, not a distinct), and the exact overlap predicate
    re-verifies candidates (same-bucket disjoint ranges drop). Long
    intervals cost explode rows, not join skew; a hot bucket splits
    under AQE like any skewed key."""
    ids = F.struct(*[F.col(c) for c in id_cols])
    base = intervals.select(
        ids.alias("iv"),
        F.col(start_col).cast("long").alias("s"),
        F.col(end_col).cast("long").alias("e"),
    )

    def spanned(side: str) -> DataFrame:
        return base.select(
            F.col("iv").alias(f"i{side}"),
            F.col("s").alias(f"s{side}"),
            F.col("e").alias(f"e{side}"),
            F.explode(
                F.sequence(
                    F.floor(F.col("s") / bucket_s).cast("long"),
                    F.floor(F.col("e") / bucket_s).cast("long"),
                )
            ).alias("bk"),
        )

    j = (
        spanned("a")
        .join(spanned("b"), "bk")
        .filter(F.col("ia") < F.col("ib"))
        .filter(
            F.col("bk")
            == F.floor(F.greatest("sa", "sb") / bucket_s).cast("long")
        )
    )
    overlap = F.least("ea", "eb") - F.greatest("sa", "sb")
    return j.filter(overlap >= 0).select(
        "ia", "ib", overlap.alias("overlap_s")
    )
