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
    weight_col: str | None = None,
) -> DataFrame:
    """Build the count-min grid over ``df[key_col]`` occurrences:
    (row, col, cnt) with one output row per NON-EMPTY cell. One scan:
    each key explodes into its ``depth`` (row, col) targets, then a
    single groupBy(row, col) count with map-side partial aggregation —
    the shuffle carries at most depth * width cells.

    ``weight_col`` builds the IDENTICAL grid from a pre-aggregated
    (key, count) relation instead of the raw occurrence stream:
    cell[r][c] = sum over keys hashing there of their counts — equal
    by commutativity to counting the occurrences one by one. Callers
    that already aggregate per-key ground truth (heavy-hitter
    demonstrations) thus hash each DISTINCT key ``depth`` times
    instead of each occurrence, and the explode fans out a vocab-sized
    relation, not the corpus."""
    key = F.col(key_col).cast("string")
    targets = _cms_targets(key, depth, width, seed)
    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col).cast("long")
    ex = df.select(w.alias("_w"), F.explode(targets).alias("t"))
    return (
        ex.select(F.col("t.row").alias("row"), F.col("t.col").alias("col"), "_w")
        .groupBy("row", "col")
        .agg(F.sum("_w").alias("cnt"))
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


# ---------------------------------------------------------------------------
# HyperLogLog — bounded-memory cardinality (Flajolet et al. 2007, plus
# the small-range linear-counting correction from the original paper).
# Same portability contract as count-min above: the register grid is an
# exact relational aggregate over the md5-derived 60-bit hash, so a SQL
# oracle re-derives registers AND estimate bit-for-bit. The estimate's
# 2^-M_j harmonic sum is computed as an exact DECIMAL(38,0) integer
# (terms are 2^(62-M_j) longs) — no float accumulation order to
# disagree on; the only floats are one final division and the ln() in
# the small-range branch.
# ---------------------------------------------------------------------------


def hll_build(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    b: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Per-group HLL registers: (group..., reg, mx) where reg is the
    low ``b`` hash bits and mx the max leading-zero rank rho of the
    remaining 60-b bits. ONE shuffle carrying at most groups * 2^b
    partially-aggregated rows — corpus size never reaches the wire.
    Registers MERGE by groupBy(reg).max(mx): union two builds and
    re-aggregate to sketch a union of corpora (tested property)."""
    m = 1 << b
    h = portable_hash60(
        F.concat(F.lit(f"hll{seed}:"), F.col(key_col).cast("string"))
    )
    w = F.shiftright(h, b)
    # highest set bit via bin() string length (portable: Spark and
    # DuckDB both print minimal-width binary for non-negative ints)
    hb = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
    rho = F.lit(60 - b) - hb + 1
    return (
        df.select(
            *[F.col(g) for g in group_cols],
            h.bitwiseAND(F.lit(m - 1)).alias("reg"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("mx"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: tuple[str, ...] = (),
    b: int = 8,
    digits: int = 2,
) -> DataFrame:
    """Cardinality estimate per group from built registers:
    E = alpha_m * m^2 / sum_j 2^-M_j, with empty registers contributing
    2^-0 and the linear-counting correction E <= 2.5m & zeros > 0 ->
    m * ln(m / zeros). The harmonic sum is the exact integer
    sum(2^(62-M_j)) in DECIMAL(38,0) (2^62 per empty register), so the
    estimate is reproducible to the bit in any engine with IEEE
    doubles. Returns (group..., n_regs_set, n_est)."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)  # standard bias constant, m >= 128
    # python-API shiftleft wants a literal bit count; the SQL form
    # accepts a column
    term = F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 62 - mx) AS DECIMAL(38,0))")
    agg = registers.groupBy(*[F.col(g) for g in group_cols]).agg(
        F.sum(term).alias("s_obs"), F.count(F.lit(1)).alias("n_obs")
    )
    zeros = F.lit(m) - F.col("n_obs")
    s = (
        F.col("s_obs") + zeros.cast("decimal(38,0)") * F.lit(1 << 62).cast("decimal(38,0)")
    ).cast("double")
    raw = F.lit(alpha) * F.lit(float(m * m * (1 << 62))) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("n_obs").alias("n_regs_set"),
        F.round(est, digits).alias("n_est"),
    )


# ---------------------------------------------------------------------------
# Bloom filter — bounded-memory membership, the shuffle-avoidance
# workhorse: build the bit set over a (small) key relation once, then
# any probe side streams map-side against the broadcast bits and only
# surviving rows continue into an exact join. False positives bounded
# ((1 - e^-kn/m)^k); false negatives impossible — so a bloom PRE-filter
# never changes join results, it only cuts shuffled volume.
# ---------------------------------------------------------------------------


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 4096, k: int = 3, seed: int = 7
) -> DataFrame:
    """The filter's set bit positions as a relation (pos), distinct —
    at most m_bits rows regardless of build cardinality. ONE shuffle
    (the distinct) of at most k rows per build key, partial-agg'd."""
    key = F.col(key_col).cast("string")
    pos = F.array(
        *[
            (portable_hash60(F.concat(F.lit(f"bloom{seed}:{i}:"), key)) % m_bits).alias(
                f"p{i}"
            )
            for i in range(k)
        ]
    )
    return (
        df.select(F.explode(pos).alias("pos")).distinct()
    )


def bloom_probe(
    probes: DataFrame,
    bits: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Probe rows with a ``bloom_pass`` flag: true iff ALL k positions
    are set. The bits relation broadcasts (<= m_bits rows); the probe
    side's only exchange is the per-key hit count — and when the probe
    key is unique per row even that is map-side partial-aggregated."""
    key = F.col(key_col).cast("string")
    pos = F.array(
        *[
            (portable_hash60(F.concat(F.lit(f"bloom{seed}:{i}:"), key)) % m_bits).alias(
                f"p{i}"
            )
            for i in range(k)
        ]
    )
    ex = probes.select(F.col(key_col).alias("key"), F.explode(pos).alias("pos"))
    hits = (
        ex.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("key")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"))
    )
    return hits.select(
        F.col("key").alias(key_col), (F.col("n_hit") == k).alias("bloom_pass")
    )


# ---------------------------------------------------------------------------
# KMV (k minimum values / bottom-k) — bounded-memory DISTINCT sketch
# with mergeable set algebra (Beyer et al., SIGMOD 2007 "On synopses
# for distinct-value estimation under multiset operations"). Unlike
# HLL registers, a KMV sketch supports INTERSECTION estimates, so two
# audiences sketched independently yield distinct counts AND overlap /
# Jaccard without ever co-shuffling the raw corpora. Everything is
# exact relational algebra over the md5-derived 60-bit hash
# (text.portable_hash60) — a SQL oracle re-derives sketches and
# estimates bit-for-bit.
# ---------------------------------------------------------------------------


def kmv_build(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 256,
    seed: int = 0,
    fan: int = 32,
) -> DataFrame:
    """Per-group bottom-``k`` sketch: (group..., h, r) — the k smallest
    DISTINCT 60-bit key hashes with rank r (1-based by h). Two-phase
    exact top-k so no single task ever ranks a corpus-sized hash set:
    after the dedup shuffle, each of ``fan`` salt buckets (h % fan)
    keeps its own bottom-k in parallel (a superset of the global
    bottom-k by pigeonhole), and only the <= fan*k survivors per group
    reach the final per-group rank. Sketches of two corpora merge by
    unioning hash sets and re-ranking — the basis of
    :func:`kmv_overlap`."""
    groups = [F.col(g) for g in group_cols]
    h = portable_hash60(
        F.concat(F.lit(f"kmv{seed}:"), F.col(key_col).cast("string"))
    )
    d = df.select(*groups, h.alias("h")).distinct()
    from pyspark.sql.window import Window

    w1 = Window.partitionBy(*group_cols, F.col("h") % fan).orderBy("h")
    pruned = (
        d.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
        .drop("r1")
    )
    w2 = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy("h")
    return pruned.withColumn("r", F.row_number().over(w2)).filter(F.col("r") <= k)


def kmv_estimate(
    sketch: DataFrame,
    group_cols: tuple[str, ...] = (),
    k: int = 256,
    digits: int = 2,
) -> DataFrame:
    """Distinct-count estimate per group from a built sketch:
    fewer than k hashes -> the sketch IS the distinct set (exact
    count); otherwise (k-1) * 2^60 / h_k with h_k the k-th smallest
    hash (the unbiased KMV estimator). One |sketch|-sized aggregation;
    the only floats are the final one-division estimate."""
    agg = sketch.groupBy(*[F.col(g) for g in group_cols]).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.max(F.when(F.col("r") == k, F.col("h"))).alias("_hk"),
    )
    est = F.when(F.col("n_obs") < k, F.col("n_obs").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("_hk").cast("double")
    )
    return agg.select(
        *group_cols,
        "n_obs",
        (F.round(est, digits) + 0.0).alias("n_est"),
    )


def kmv_overlap(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    k: int = 256,
    digits: int = 4,
) -> DataFrame:
    """Audience-overlap estimates from two single-group KMV sketches
    (columns (h, r)): one row (n_a, n_b, est_a, est_b, jaccard_est,
    intersection_est). The combined sketch is the bottom-k of the hash
    UNION; rho = how many of those combined survivors appear in BOTH
    input sketches; jaccard ~= rho / k_eff and intersection = jaccard *
    union_estimate (Beyer et al. 2007, Thm 4.2 shape). Inputs are
    <= k rows each, so every join here is a broadcast of a
    sketch-sized relation — the raw corpora are never touched."""
    from pyspark.sql.window import Window

    a = sketch_a.select(F.col("h").alias("h"), F.lit(1).alias("in_a"))
    b = sketch_b.select(F.col("h").alias("h"), F.lit(1).alias("in_b"))
    merged = a.join(b, "h", "full").select(
        "h",
        F.coalesce("in_a", F.lit(0)).alias("in_a"),
        F.coalesce("in_b", F.lit(0)).alias("in_b"),
    )
    w = Window.orderBy("h")
    ranked = merged.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    na = sketch_a.count()
    nb = sketch_b.count()
    comb = ranked.agg(
        F.count(F.lit(1)).alias("k_eff"),
        F.max("h").alias("_hk"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).alias("rho"),
    )
    union_est = F.when(
        F.col("k_eff") < k, F.col("k_eff").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("_hk").cast("double")
    )
    jac = F.col("rho").cast("double") / F.col("k_eff").cast("double")
    return comb.select(
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
        F.col("rho"),
        (F.round(jac, digits) + 0.0).alias("jaccard_est"),
        (F.round(jac * union_est, digits) + 0.0).alias("intersection_est"),
    )
