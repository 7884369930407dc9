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


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, sample_nibble: str | None
) -> DataFrame:
    """(id, shingle) rows, distinct per doc. ``sample_nibble`` keeps only
    shingles whose md5 starts with that hex char — a deterministic 1/16
    sampler identical across engines (estimated Jaccard over the sampled
    shingle universe; the estimate itself is what the oracle verifies).

    The token array is materialized as a projected column BEFORE the
    bigram lambda runs: inlining ``tokens(text)`` into the transform
    would re-evaluate the regex split on every element_at access
    (O(tokens^2) per document — measured 20x slower at sf0.1)."""
    toks = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t"))
    bigrams = F.when(F.size("t") < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.concat_ws(" ", F.element_at("t", i + 1), F.element_at("t", i + 2)),
        )
    )
    out = toks.select("id", F.explode(bigrams).alias("g")).distinct()
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
    concat in the hot loop): one explode + ONE groupBy computing all k
    mins as separate agg columns (not k passes). Pass ``shingles`` to
    reuse an already-persisted (id, g) relation."""
    sh = shingles if shingles is not None else _exploded_shingles(df, id_col, text_col, None)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("g"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


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

    Scale: everything is equi-joins/groupBys on hashed keys; no O(n^2)
    stage. Bucket skew (a hot band-hash) is handled by AQE skew-join.
    """
    rows = num_hashes // bands
    sh = _exploded_shingles(df, id_col, text_col, None).persist()
    sig = minhash_signature(df, id_col, text_col, num_hashes, shingles=sh)
    band_arr = F.array(
        *[
            F.xxhash64(
                F.lit(b), *[F.element_at("sig", b * rows + r + 1) for r in range(rows)]
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select("id", F.explode(band_arr).alias("bucket")).distinct()
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # verify ONLY candidates: intersection size via a join on
    # (candidate pair x shared shingle) — work is linear in candidate
    # volume, never O(n^2) over the corpus. `sh` is the same persisted
    # relation the signatures were built from.
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("id").alias("id_a"), "g")
    sb = sh.select(F.col("id").alias("id_b"), "g")
    inter = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "g"])  # composite-key hash join: (doc_b, shingle)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- SimHash -----------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """(id, simhash: long) — sign-sum simhash over token xxhash64 values.

    Per (doc, bit): sum of +-1 across tokens, then bit-assemble. One
    explode + one groupBy with 64 conditional-sum agg columns — stays
    entirely in codegen, no UDF.
    """
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("t"))
        .withColumn("h", F.xxhash64("t"))
    )
    aggs = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    per_bit = toks.groupBy("id").agg(*aggs)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(2 ** i if i < 63 else -(2 ** 63)).cast("long")
        fp = term if fp is None else fp + term
    return per_bit.select("id", fp.alias("simhash"))


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
    double via zip_with/aggregate: built-in, no UDF."""
    def cos(va: Column, vb: Column) -> Column:
        dot = F.aggregate(
            F.zip_with(va, vb, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        norm = lambda v: F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        return dot / (norm(va) * norm(vb))

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cos(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
