"""Deduplication operators for training-data pipelines (greenfield
extension; no reference equivalent — BASELINE.json north star).

Five escalating strategies, all shaped for 100 TB:

- exact:          hash-groupBy on normalized content. One shuffle,
                  map-side partial agg. The keeper is min(id) per group
                  (deterministic, unlike dropDuplicates).
- ngram_jaccard:  exact set-similarity via shingle self-join. Exact but
                  O(sum_g freq(g)^2) — the deterministic md5 shingle
                  sampler bounds the blow-up; use for candidate *verify*.
- minhash_lsh:    MinHash signatures (k permutations via seeded
                  xxhash64) banded into LSH buckets; candidate pairs
                  only within buckets -> near-linear scale path.
- simhash:        64-bit simhash of token hashes; near-dups = equal
                  fingerprint (or small hamming distance within buckets).
- embedding:      cosine-threshold pairs over the embeddings table
                  (see similarity.py for the ANN path).

Everything below is built-in functions only (codegen-friendly); the
LSH/simhash internals use xxhash64 which has no cross-engine twin, so
those two are verified by property tests (recall vs the exact operator)
rather than a value-level oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeapi_spark.operators.scale import fan_out
from lakeapi_spark.operators.text import tokens


def normalized(text: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def exact_dedup_keepers(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct normalized text: (fingerprint, keeper_id, n_dups).
    Deterministic keeper = min(id)."""
    return (
        df.select(F.col(id_col), F.md5(normalized(F.col(text_col))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def word_bigrams(text: Column) -> Column:
    """Adjacent-word shingles; [] for texts under 2 tokens."""
    t = tokens(text)
    return F.when(F.size(t) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.concat_ws(" ", F.element_at(t, i + 1), F.element_at(t, i + 2)),
        )
    )


def doc_shingles(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sh: array<string>) — the DISTINCT word-bigram set per doc,
    kept as a per-row array (no explode, no shuffle).

    The token array is materialized as a projected column BEFORE the
    bigram lambda runs: inlining ``tokens(text)`` into the transform
    would re-evaluate the regex split on every element_at access
    (O(tokens^2) per document — measured 20x slower at sf0.1).
    ``fan_out`` spreads narrow single-file scans across cores first:
    this stage is pure CPU and byte-sized task splits starve it."""
    toks = fan_out(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))).select(
        "id", tokens(F.col("_txt")).alias("t")
    )
    bigrams = F.when(F.size("t") < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.concat_ws(" ", F.element_at("t", i + 1), F.element_at("t", i + 2)),
        )
    )
    return toks.select("id", F.array_distinct(bigrams).alias("sh"))


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, sample_nibble: str | None
) -> DataFrame:
    """(id, shingle) rows, distinct per doc. ``sample_nibble`` keeps only
    shingles whose md5 starts with that hex char — a deterministic 1/16
    sampler identical across engines (estimated Jaccard over the sampled
    shingle universe; the estimate itself is what the oracle verifies)."""
    out = doc_shingles(df, id_col, text_col).select("id", F.explode("sh").alias("g"))
    if sample_nibble is not None:
        out = out.filter(F.md5(F.col("g")).startswith(sample_nibble))
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    sample_nibble: str | None = None,
) -> DataFrame:
    """Exact (or deterministically-sampled) word-bigram Jaccard pairs with
    jaccard >= threshold, id_a < id_b.

    Plan shape: explode->distinct (1 shuffle), self-join on shingle
    (1 shuffle), pair-count aggregate (1 shuffle) joined against
    per-doc shingle counts (broadcastable at any realistic doc count
    since it's one row per doc). The shingle relation feeds three plan
    branches — persist it instead of recomputing the explode."""
    sh = _exploded_shingles(df, id_col, text_col, sample_nibble).persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- MinHash + LSH -----------------------------------------------------------


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 128,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, sig: array<long>) — k min-hashes of the word-bigram set.

    Permutation i is xxhash64(i, shingle) (multi-arg hash: no string
    concat in the hot loop). Computed PER ROW with nested array
    transforms — sig[i] = array_min(transform(sh, g -> xxhash64(i, g)))
    — which stays entirely inside whole-stage codegen: zero shuffle,
    zero explode. The earlier explode + 128-min-column groupBy shape
    shuffled |docs|*|shingles| rows to compute the exact same values
    (~2x slower at sf0.1 and a full extra shuffle at 100 TB).

    Docs with no shingles (under 2 tokens) are dropped, matching the
    explode-based formulation where they simply had no rows. Pass
    ``shingles`` to reuse an already-computed (id, sh) relation from
    :func:`doc_shingles`."""
    sh = shingles if shingles is not None else doc_shingles(df, id_col, text_col)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform("sh", lambda g: F.xxhash64(i, g))),
    )
    return sh.filter(F.size("sh") > 0).select("id", sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 128,
    bands: int = 32,
) -> DataFrame:
    """Candidate pairs from banded MinHash, verified with exact Jaccard.

    Defaults tuned for near-dup detection at threshold 0.5: 32 bands x
    4 rows -> LSH crossover (1/32)^(1/4) ~= 0.42; recall at j=0.5 is
    1-(1-0.5^4)^32 ~= 0.87 and false-candidate rate at j=0.05 is ~2e-4
    (so candidate volume stays near-linear even when every document
    shares vocabulary). Candidates are verified with exact bigram
    Jaccard, so precision is exact; recall is property-tested vs the
    exact operator.

    Plan shape: shingle + signature are per-row codegen (no shuffle);
    the only shuffles are the bucket explode->self-join (equi-join on
    band hash), candidate distinct, and the two id-keyed verify joins.
    Verification fetches each side's shingle ARRAY and intersects
    in-row (array_intersect) — linear in candidate volume, never
    O(n^2) over the corpus. Bucket skew (a hot band-hash) is handled
    by AQE skew-join.
    """
    rows = num_hashes // bands
    sh = doc_shingles(df, id_col, text_col).persist()
    sig = minhash_signature(df, id_col, text_col, num_hashes, shingles=sh)
    band_arr = F.array(
        *[
            F.xxhash64(
                F.lit(b), *[F.element_at("sig", b * rows + r + 1) for r in range(rows)]
            )
            for b in range(bands)
        ]
    )
    # NO distinct on buckets: a pair matching in several bands yields
    # duplicate candidate rows, which cand.distinct() removes anyway —
    # de-duplicating buckets first costs a full extra shuffle (measured
    # 2-3x the whole pipeline's latency at sf0.1).
    buckets = sig.select("id", F.explode(band_arr).alias("bucket"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
    n_union = F.size("sh_a") + F.size("sh_b") - n_inter
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(n_inter / n_union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- SimHash -----------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """(id, simhash: long) — sign-sum simhash over token xxhash64 values.

    Per bit: sum of +-1 across tokens (frequency-weighted — tokens are
    NOT de-duplicated), then bit-assemble. Computed per row: token
    hashes are materialized once as an array column, then each bit is
    an array-aggregate over it — all in whole-stage codegen, zero
    shuffle, zero explode (the earlier explode + 64-sum-column groupBy
    shuffled every (doc, token) pair to compute the same values).
    Docs with no tokens are dropped, matching the explode shape.
    """
    hs = fan_out(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_txt"))).select(
        "id", F.transform(tokens(F.col("_txt")), lambda t: F.xxhash64(t)).alias("hs")
    )

    def bit_sum(i: int) -> Column:
        return F.aggregate(
            "hs",
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    fp = None
    for i in range(bits):
        bit = F.when(bit_sum(i) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(2 ** i if i < 63 else -(2 ** 63)).cast("long")
        fp = term if fp is None else fp + term
    return hs.filter(F.size("hs") > 0).select("id", fp.alias("simhash"))


def simhash_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Docs sharing an identical simhash fingerprint (hamming distance 0;
    the banded-hamming variant splits the 64 bits into 4 bands of 16 and
    buckets on each — same join shape as minhash_lsh_pairs)."""
    s = simhash(df, id_col, text_col)
    return (
        s.groupBy("simhash")
        .agg(F.min("id").alias("keeper_id"), F.count(F.lit(1)).alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


# --- Embedding near-dup ------------------------------------------------------


def embedding_dup_pairs(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All pairs with cosine similarity >= threshold (exact, O(n^2) —
    the LSH-bucketed scale path lives in similarity.py). Dot products in
    double via zip_with/aggregate: built-in, no UDF. Norms are
    precomputed per side (HOF lambdas are interpreted — recomputing
    both norms per pair triples the hot-loop cost)."""
    from lakeapi_spark.operators.similarity import dot, norm

    a = fan_out(emb).select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), norm(F.col(vec_col)).alias("na")
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), norm(F.col(vec_col)).alias("nb")
    )
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(sim, 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
