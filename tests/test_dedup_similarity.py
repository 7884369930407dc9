"""Property tests for the approximate operators (minhash-LSH, simhash,
ANN-LSH) against their exact counterparts on synthetic corpora with
KNOWN near-duplicates — the checks the DuckDB oracle can't express."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from lakeapi_spark.operators.dedup import (
    exact_dedup_keepers,
    embedding_dup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_dup_groups,
)
from lakeapi_spark.operators.similarity import brute_force_topk, lsh_topk, numpy_topk

VOCAB = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()


@pytest.fixture(scope="module")
def corpus(spark):
    """60 random docs + 10 planted near-dup pairs (one-word edits)."""
    rng = random.Random(7)
    rows = []
    for i in range(60):
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(40))))
    for j in range(10):
        base = rows[j][1].split()
        edited = list(base)
        edited[5] = "zulu"  # single-token edit -> jaccard ~0.87 on bigrams
        rows.append((100 + j, " ".join(edited)))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_keepers(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")], ["doc_id", "text"]
    )
    out = {r.fingerprint: (r.keeper_id, r.n_dups) for r in exact_dedup_keepers(df, "doc_id", "text").collect()}
    assert len(out) == 2
    assert (1, 2) in out.values()  # normalized dups collapse, min id kept


def test_minhash_lsh_recall_and_precision(corpus):
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(corpus, "doc_id", "text", threshold=0.5).collect()
    }
    approx = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(corpus, "doc_id", "text", threshold=0.5).collect()
    }
    assert len(exact) >= 10  # the planted pairs are found by the exact op
    # precision is exact by construction (candidates re-verified)
    for pair, j in approx.items():
        assert pair in exact and abs(exact[pair] - j) < 1e-9
    # recall: at j~0.87 the 32x4 banding curve is ~1.0
    planted = {p for p in exact if p[1] >= 100}
    found = planted.intersection(approx)
    assert len(found) / len(planted) >= 0.9


def test_simhash_identical_and_distinct(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "totally different words here")],
        ["doc_id", "text"],
    )
    groups = simhash_dup_groups(df, "doc_id", "text").collect()
    assert len(groups) == 1 and groups[0].n_dups == 2 and groups[0].keeper_id == 1
    fps = {r.id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    assert fps[1] == fps[2] != fps[3]


def test_simhash_near_dup_small_hamming(corpus):
    fps = {r.id: r.simhash for r in simhash(corpus, "doc_id", "text").collect()}
    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    near = [hamming(fps[j], fps[100 + j]) for j in range(10)]
    far = [hamming(fps[20], fps[21]), hamming(fps[30], fps[40])]
    assert max(near) < min(far), (near, far)


def test_embedding_dup_pairs_finds_clones(spark):
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.99, 0.01, 0.0]), (3, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = embedding_dup_pairs(df, "vec_id", "embedding", threshold=0.95).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]


def test_ann_lsh_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") <= 4)
    exact = brute_force_topk(emb, q, "vec_id", "embedding", k=10).collect()
    approx = lsh_topk(emb, q, "vec_id", "embedding", k=10).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx}
    # 8 tables x 4 planes OR-amplified: on uniform random vectors the
    # top neighbors (cos ~0.4-0.5) land in a shared bucket with high
    # probability; floor chosen well under the measured recall
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5, recall


def test_ann_ivf_recall_vs_brute_force(spark, sf_dir):
    from lakeapi_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") <= 4)
    exact = brute_force_topk(emb, q, "vec_id", "embedding", k=10).collect()
    approx = ivf_topk(emb, q, "vec_id", "embedding", k=10).collect()
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx}
    # 4 of 16 probed lists; near-uniform vectors spread, so a modest
    # floor — the dial is n_probe (=16 degrades to brute force)
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.4, recall
    # determinism: same session, same centroids, same result
    again = {(r.query_id, r.neighbor_id) for r in ivf_topk(emb, q, "vec_id", "embedding", k=10).collect()}
    assert approx_pairs == again


def test_numpy_topk_equals_builtin_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") <= 4)
    a = brute_force_topk(emb, q, "vec_id", "embedding", k=10)
    qvecs = {r["vec_id"]: list(r["embedding"]) for r in q.collect()}
    b = numpy_topk(emb, qvecs, "vec_id", "embedding", k=10)
    rows_a = sorted((r.query_id, r.neighbor_id, r.rank) for r in a.collect())
    rows_b = sorted((r.query_id, r.neighbor_id, r.rank) for r in b.collect())
    assert rows_a == rows_b


def test_multimodal_stub_deterministic(spark):
    from lakeapi_spark.operators.multimodal import attach_fake_payload, decode_stub_features

    df = spark.createDataFrame([(1, "abc"), (2, "defg")], ["doc_id", "text"])
    media = attach_fake_payload(df, "doc_id", "text")
    f1 = {r.id: r.features for r in decode_stub_features(media).collect()}
    f2 = {r.id: r.features for r in decode_stub_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())
    # L1-normalized histogram (elements rounded to 6 digits -> 8*5e-7 drift)
    assert abs(sum(f1[1]) - 1.0) < 1e-4


def test_multimodal_metadata_prunes_payload(spark):
    from lakeapi_spark.operators.multimodal import attach_fake_payload, media_metadata

    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    out = media_metadata(attach_fake_payload(df, "doc_id", "text"))
    assert "payload" not in out.columns
    assert out.collect()[0].n_bytes == 3


def test_multimodal_resize_and_frame_sample(spark):
    from lakeapi_spark.operators.multimodal import (
        attach_fake_payload,
        frame_sample_stub,
        resize_stub,
    )

    df = spark.createDataFrame(
        [(1, "x" * 100), (2, "hello world, a slightly longer fake image")],
        ["doc_id", "text"],
    )
    media = attach_fake_payload(df, "doc_id", "text")

    resized = resize_stub(media, 4, 3).collect()
    assert {r.id for r in resized} == {1, 2}
    for r in resized:
        assert (r.width, r.height, r.n_bytes) == (4, 3, 12)
        assert len(bytes(r.payload)) == 12
    # determinism
    again = {r.id: bytes(r.payload) for r in resize_stub(media, 4, 3).collect()}
    assert {r.id: bytes(r.payload) for r in resized} == again

    frames = frame_sample_stub(media, frame_bytes=16, every_n=2).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.id, []).append(r)
        assert len(bytes(r.frame)) == 16
    # doc 1: 100 bytes -> 7 frames -> sampled idx 0,2,4,6
    assert sorted(r.frame_idx for r in by_id[1]) == [0, 2, 4, 6]


def test_dup_clusters_match_union_find(spark):
    """Label propagation must agree with a reference union-find on a
    randomized edge set, including a long chain (worst-case diameter)."""
    import random

    from lakeapi_spark.operators.dedup import dup_clusters

    rnd = random.Random(7)
    n = 200
    edges = [(rnd.randrange(n), rnd.randrange(n)) for _ in range(120)]
    edges = [(a, b) for a, b in edges if a != b]
    edges += [(i, i + 1) for i in range(150, 170)]  # a 20-hop chain

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    touched = {v for e in edges for v in e}
    expect_root = {v: min(u for u in touched if find(u) == find(v)) for v in touched}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == expect_root


def test_simhash_near_pairs_finds_mutations(spark):
    """Banded-hamming simhash: lightly mutated docs pair with their
    original (small hamming), unrelated docs don't; recall for
    hamming <= 3 is exact by pigeonhole over the 4x16 bands."""
    from lakeapi_spark.operators.dedup import simhash, simhash_near_pairs

    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = [
        (1, base),
        (2, base.replace("lazy", "sleepy", 1)),  # one-token mutation
        (3, "completely different content about spark physical plans " * 8),
        (4, base),  # exact dup of 1
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    fps = {r.id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    ham12 = bin(fps[1] ^ fps[2]).count("1")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(df, "doc_id", "text", max_hamming=3).collect()
    }
    assert pairs.get((1, 4)) == 0
    if ham12 <= 3:  # mutation distance depends on token hashes
        assert (1, 2) in pairs and pairs[(1, 2)] == ham12
    assert not any(3 in p for p in pairs)


def test_ivf_partitioned_layout_prunes_files(spark, sf_dir, tmp_path):
    """The IVF scale claim made concrete: land vectors partitioned by
    their coarse-quantizer cell, and an n_probe query becomes a pruned
    SCAN (only the probed cells' files are read) instead of a join.
    Asserts actual file-read counts, mirroring the partition-pruning
    test for the reference's md5 trick."""
    from pyspark.sql import functions as F

    from lakeapi_spark.operators.similarity import _nearest_centroids, ivf_fit_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_fit_centroids(emb, "embedding", n_centroids=8, seed=7)
    path = str(tmp_path / "ivf")
    (
        emb.withColumn("cid", _nearest_centroids(F.col("embedding"), cents, 1)[0])
        .write.partitionBy("cid")
        .parquet(path)
    )
    lists = spark.read.parquet(path)
    probed = lists.filter(F.col("cid").isin([0, 3]))

    import re

    plan = probed._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the probe must be a PARTITION filter on the scan (file pruning),
    # not a post-scan Filter node
    assert re.search(r"PartitionFilters: \[[^\]]*cid[^\]]*\]", plan), plan
    # and the layout is lossless: probed + unprobed == corpus
    n_total = probed.count() + lists.filter(~F.col("cid").isin([0, 3])).count()
    assert n_total == emb.count()


def test_ivf_index_matches_adhoc_and_roundtrips(spark, sf_dir, tmp_path):
    """The persisted IVF index must serve IDENTICAL results to the
    ad-hoc ivf_topk (same seeded quantizer, cosine, tiebreaks), survive
    a parquet save/load round-trip, and the loaded lists' probe must be
    a row-group-prunable cid predicate (sorted layout)."""
    from lakeapi_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
        load_ivf_index,
        save_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") <= 4)
    ids = list(range(5, 21))
    adhoc = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in ivf_topk(
            emb, q, "vec_id", "embedding", k=10, centroid_ids=ids
        ).collect()
    }
    index = build_ivf_index(emb, "vec_id", "embedding", ids)
    try:
        served = {
            (r.query_id, r.neighbor_id, r.cosine, r.rank)
            for r in ivf_topk_indexed(index, q, "vec_id", "embedding", k=10).collect()
        }
        assert served == adhoc and len(adhoc) > 0

        path = str(tmp_path / "ivf_idx")
        save_ivf_index(index, path)
        loaded = load_ivf_index(spark, path)
        reloaded = {
            (r.query_id, r.neighbor_id, r.cosine, r.rank)
            for r in ivf_topk_indexed(loaded, q, "vec_id", "embedding", k=10).collect()
        }
        assert reloaded == adhoc
        assert loaded.cents == index.cents
    finally:
        index.unpersist()


def test_ivf_index_cache_evicts_stale_version(spark, sf_dir):
    """ivf_index_for: same identity at a new version evicts (and
    unpersists) the stale build; same (identity, version, params) is
    returned memoized."""
    from lakeapi_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ids = list(range(5, 21))
    sim._IVF_CACHE.clear()
    a = sim.ivf_index_for(emb, "vec_id", "embedding", ids, key=("t", 1))
    b = sim.ivf_index_for(emb, "vec_id", "embedding", ids, key=("t", 1))
    assert a is b
    c = sim.ivf_index_for(emb, "vec_id", "embedding", ids, key=("t", 2))
    assert c is not a and len(sim._IVF_CACHE) == 1
    c.unpersist()
    sim._IVF_CACHE.clear()


def test_dup_clusters_star_path_graph_1k(spark):
    """r2 VERDICT hardening: the alternating large-star/small-star variant
    converges on a 1000-node PATH — the adversarial diameter-1000 graph
    where plain propagation needs ~1000 rounds — inside its O(log n)
    iteration budget, labeling every node with the component min (0)."""
    from lakeapi_spark.operators.dedup import dup_clusters_star

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "id_a long, id_b long"
    )
    out = {r.id: r.cluster_id for r in dup_clusters_star(pairs, max_iter=20).collect()}
    assert len(out) == 1000
    assert set(out.values()) == {0}


def test_dup_clusters_star_matches_propagation(spark):
    """Same output contract as dup_clusters on a randomized multi-component
    graph (clusters keyed by component minimum)."""
    import random

    from lakeapi_spark.operators.dedup import dup_clusters, dup_clusters_star

    rnd = random.Random(11)
    n = 300
    edges = [(rnd.randrange(n), rnd.randrange(n)) for _ in range(260)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    a = {r.id: r.cluster_id for r in dup_clusters(pairs).collect()}
    b = {r.id: r.cluster_id for r in dup_clusters_star(pairs).collect()}
    assert a == b


def test_minhash_numpy_buckets_equal_builtin(corpus):
    """The vectorized bucket kernel must be bit-identical to the pure
    DataFrame formulation (same constants, same int64 arithmetic)."""
    from pyspark.sql import functions as F

    from lakeapi_spark.operators.dedup import (
        band_key,
        hashed_shingles,
        minhash_buckets_numpy,
        minhash_signature,
    )

    hs = hashed_shingles(corpus, "doc_id", "text")
    got = {
        (r.id, r.bucket)
        for r in minhash_buckets_numpy(hs, 128, 32).collect()
    }
    sig = minhash_signature(corpus, "doc_id", "text", 128, hashed=hs)
    band_arr = F.array(*[band_key("sig", b, 4) for b in range(32)])
    want = {
        (r.id, r.bucket)
        for r in sig.select("id", F.explode(band_arr).alias("bucket")).collect()
    }
    assert got == want and len(got) > 0


def test_minhash_engines_agree_and_release_cache(corpus):
    """numpy and builtin engines return the same pairs; cache_handles
    lets the caller unpersist the shingle relation after its action, so
    a serving session doesn't accumulate cached blocks. The check is
    delta-based: other tests' localCheckpoint RDDs live in the shared
    session and are not ours to release."""
    spark = corpus.sparkSession
    before = set(dict(spark.sparkContext._jsc.getPersistentRDDs()).keys())
    handles: list = []
    np_pairs = sorted(
        map(
            tuple,
            minhash_lsh_pairs(
                corpus, "doc_id", "text", 0.5, cache_handles=handles
            ).collect(),
        )
    )
    builtin_pairs = sorted(
        map(
            tuple,
            minhash_lsh_pairs(corpus, "doc_id", "text", 0.5, engine="builtin").collect(),
        )
    )
    assert np_pairs == builtin_pairs and len(np_pairs) >= 10
    assert len(handles) == 1
    for h in handles:
        h.unpersist(blocking=True)
    spark.catalog.clearCache()  # release the builtin run's internal persist too
    after = set(dict(spark.sparkContext._jsc.getPersistentRDDs()).keys())
    assert after <= before, "cached blocks leaked"


def test_ngram_jaccard_ids_beyond_31_bits(corpus):
    """Ids past the packed-pair budget (2^31) — a >2B-document corpus,
    exactly the 100 TB regime — must fall back to the two-column pair
    key and return CORRECT pairs instead of raising (advice finding,
    r6). The shifted corpus's pair set must equal the small-id pair
    set shifted by the same offset, jaccards identical."""
    from lakeapi_spark.operators.dedup import ngram_jaccard_pairs as njp

    small = {
        (r.id_a, r.id_b): r.jaccard
        for r in njp(corpus, "doc_id", "text", threshold=0.5).collect()
    }
    offset = (1 << 31) + 7
    shifted = corpus.withColumn("doc_id", F.col("doc_id") + F.lit(offset))
    big = {
        (r.id_a - offset, r.id_b - offset): r.jaccard
        for r in njp(shifted, "doc_id", "text", threshold=0.5).collect()
    }
    assert big == small and len(small) >= 10


def test_ngram_jaccard_null_ids_fail_loudly(spark):
    """min/max bounds ignore nulls and the pair join would silently
    drop null-id rows — the operator must raise instead (the old
    per-row guard's contract, review finding r7)."""
    from lakeapi_spark.operators.dedup import ngram_jaccard_pairs as njp

    text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(1, text), (None, text)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="null ids"):
        njp(df, "doc_id", "text", 0.5).collect()


def test_ngram_jaccard_negative_ids_fall_back(spark):
    """Negative ids are un-packable too: the two-column fallback must
    produce the right pair (and keep id_a < id_b ordering)."""
    from lakeapi_spark.operators.dedup import ngram_jaccard_pairs as njp

    text = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(-5, text), (-2, text), (7, "wholly unrelated words entirely")],
        ["doc_id", "text"],
    )
    got = [(r.id_a, r.id_b, r.jaccard) for r in njp(df, "doc_id", "text", 0.9).collect()]
    assert got == [(-5, -2, 1.0)]


def test_ngram_jaccard_cache_handle_released(corpus):
    from lakeapi_spark.operators.dedup import ngram_jaccard_pairs as njp

    spark = corpus.sparkSession
    before = set(dict(spark.sparkContext._jsc.getPersistentRDDs()).keys())
    handles: list = []
    njp(corpus, "doc_id", "text", 0.5, cache_handles=handles).count()
    assert len(handles) == 1
    for h in handles:
        h.unpersist(blocking=True)
    after = set(dict(spark.sparkContext._jsc.getPersistentRDDs()).keys())
    assert after <= before, "cached blocks leaked"


def test_png_dimensions_parse_and_reject(spark):
    """png_dimensions inverts attach_png_payload exactly and nulls out
    dims when the signature is corrupt — all JVM expressions."""
    from pyspark.sql import functions as F

    from lakeapi_spark.operators.multimodal import attach_png_payload, png_dimensions

    df = spark.createDataFrame(
        [(1, "x" * 100), (2, "hello world")], ["doc_id", "text"]
    )
    media = attach_png_payload(df, "doc_id", "text")
    got = {r.id: (r.valid_png, r.width, r.height) for r in png_dimensions(media).collect()}
    assert got == {1: (True, 100 % 64 + 1, 100 % 48 + 1), 2: (True, 12, 12)}
    # corrupt the first signature byte -> invalid, dims null
    corrupt = media.withColumn(
        "payload",
        F.concat(F.unhex(F.lit("00")), F.substring("payload", 2, 1 << 30)),
    )
    bad = {r.id: (r.valid_png, r.width) for r in png_dimensions(corrupt).collect()}
    assert bad == {1: (False, None), 2: (False, None)}


def test_quantized_topk_recall_vs_float(spark, sf_dir):
    """int8 quantization (~1/254 per-component error) barely perturbs
    cosine ranking: top-10 recall vs the float path stays high."""
    from lakeapi_spark.operators.similarity import quantized_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") <= 4)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, "vec_id", "embedding", k=10).collect()}
    quant = {(r.query_id, r.neighbor_id) for r in quantized_topk(emb, q, "vec_id", "embedding", k=10).collect()}
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, recall


def test_ivf_sq8_recall_vs_brute_force(spark, sf_dir):
    """The composed IVF-SQ8 path (coarse routing + int8 in-list rerank)
    keeps recall close to the float IVF path's."""
    from lakeapi_spark.operators.similarity import ivf_sq8_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") <= 4)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, "vec_id", "embedding", k=10).collect()}
    sq8 = {
        (r.query_id, r.neighbor_id)
        for r in ivf_sq8_topk(
            emb, q, "vec_id", "embedding", k=10, centroid_ids=list(range(5, 21))
        ).collect()
    }
    recall = len(exact & sq8) / len(exact)
    assert recall >= 0.4, recall  # same floor as the float IVF test


def test_jpeg_dimensions_walk_and_reject(spark):
    """jpeg_dimensions must WALK the segment chain (COM length varies
    per doc, shifting the SOF offset), find SOF0 exactly, and go
    invalid on: corrupt SOI, marker desync, SOS-before-SOF, and a
    segment budget too small to reach SOF."""
    from pyspark.sql import functions as F

    from lakeapi_spark.operators.multimodal import (
        attach_jpeg_payload,
        jpeg_dimensions,
    )

    texts = ["x" * n for n in (5, 17, 33, 100, 250)]  # COM lens 5,0,16,15,12
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    media = attach_jpeg_payload(df, "doc_id", "text")
    got = {
        r.id: (r.valid_jpeg, r.width, r.height)
        for r in jpeg_dimensions(media).collect()
    }
    assert got == {
        i: (True, len(t) % 200 + 1, len(t) % 120 + 1) for i, t in enumerate(texts)
    }

    # corrupt SOI -> invalid
    corrupt = media.withColumn(
        "payload", F.concat(F.unhex(F.lit("00")), F.substring("payload", 2, 1 << 30))
    )
    assert all(not r.valid_jpeg for r in jpeg_dimensions(corrupt).collect())

    # SOS with no prior SOF -> terminal, invalid (not an infinite walk)
    sos_only = spark.createDataFrame([(9,)], ["id"]).select(
        "id", F.unhex(F.lit("FFD8" + "FFDA000C03013F00023F00033F00" + "AABB")).alias("payload")
    )
    assert [r.valid_jpeg for r in jpeg_dimensions(sos_only).collect()] == [False]

    # marker desync (length field lies, lands mid-data) -> invalid
    desync = spark.createDataFrame([(7,)], ["id"]).select(
        "id", F.unhex(F.lit("FFD8" + "FFE00003" + "414243444546")).alias("payload")
    )
    assert [r.valid_jpeg for r in jpeg_dimensions(desync).collect()] == [False]

    # budget exhausted before SOF -> invalid rather than wrong dims
    assert all(
        not r.valid_jpeg for r in jpeg_dimensions(media, max_segments=1).collect()
    )


def test_semantic_dedup_matches_exact_within_clusters(spark):
    """SemDeDup property: with well-separated clusters and planted
    near-identical copies, the cluster-bounded pair set EQUALS the
    all-pairs exact set at the same threshold (no within-cluster pair
    lost, no cross-cluster pair invented), and the summary's removed
    counts match the min-id keeper rule."""
    import random as _random

    from lakeapi_spark.operators.dedup import (
        semantic_dedup_pairs,
        semantic_dedup_summary,
    )

    rng = _random.Random(11)
    dim, centers = 8, []
    for c in range(4):  # well-separated: distinct dominant axis per cluster
        base = [0.05] * dim
        base[c] = 1.0
        centers.append(base)
    rows = []
    vid = 0
    for c, base in enumerate(centers):
        for _ in range(10):
            rows.append((vid, [x + rng.uniform(-0.02, 0.02) for x in base]))
            vid += 1
    # planted near-dups: jittered copies of the first point of each cluster
    for c in range(4):
        src = rows[c * 10][1]
        rows.append((vid, [x + rng.uniform(-0.001, 0.001) for x in src]))
        vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    centroid_ids = [0, 10, 20, 30]  # one seed point per cluster
    thr = 0.999

    sem = semantic_dedup_pairs(emb, "vec_id", "embedding", centroid_ids, thr)
    got = {(r.id_a, r.id_b) for r in sem.collect()}
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(emb, "vec_id", "embedding", thr).collect()
    }
    assert got == exact and len(exact) >= 4  # every planted copy found

    summ = semantic_dedup_summary(emb, "vec_id", "embedding", centroid_ids, thr)
    srows = summ.collect()
    assert sum(r.n_docs for r in srows) == len(rows)
    removed = {r.id_b for r in sem.collect()}
    assert sum(r.n_removed for r in srows) == len(removed)
    for r in srows:
        assert 0.0 <= r.keep_frac <= 1.0


def test_substring_dup_spans_planted(spark):
    """Planted 12-token shared run inside two otherwise-unique docs ->
    exactly one span per doc covering the shared window positions; a
    doc with no repeats yields nothing."""
    from lakeapi_spark.operators.dedup import substring_dup_spans

    shared = " ".join(f"s{i}" for i in range(12))
    uniq = lambda p, n: " ".join(f"{p}{i}" for i in range(n))
    docs = [
        (1, uniq("a", 7) + " " + shared + " " + uniq("b", 5)),
        (2, uniq("c", 3) + " " + shared + " " + uniq("d", 9)),
        (3, uniq("e", 30)),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r.id: (r.start_pos, r.end_pos, r.n_windows)
        for r in substring_dup_spans(df, "doc_id", "text", window=10).collect()
    }
    # doc 1: tokens 7..18 are shared; 10-token windows starting at 7,8,9
    # (positions are 0-based starts) -> span start 7, end 9, 3 windows
    assert out == {1: (7, 9, 3), 2: (3, 5, 3)}

    # within-doc repetition is also caught: the same phrase twice in one
    # doc yields one span per occurrence (windows crossing the unique
    # middle are not duplicated, so the runs stay separate)
    rep = spark.createDataFrame(
        [(9, shared + " x0 x1 x2 " + shared)], ["doc_id", "text"]
    )
    got = {
        (r.start_pos, r.end_pos, r.n_windows)
        for r in substring_dup_spans(rep, "doc_id", "text", window=10).collect()
    }
    assert got == {(0, 2, 3), (15, 17, 3)}


def test_semantic_dedup_kmeans_autoscale_recall(spark):
    """The production path (centroid_ids=None -> k-means quantizer with
    k ~ sqrt(n)): planted near-identical copies must still be found —
    near-dup pairs sit arbitrarily close in embedding space, so any
    sane quantizer co-clusters them. Checked against the exact
    all-pairs operator."""
    import random as _random

    from lakeapi_spark.operators.dedup import semantic_dedup_pairs

    rng = _random.Random(23)
    dim = 8
    rows = []
    vid = 0
    for c in range(4):
        base = [0.05] * dim
        base[c] = 1.0
        for _ in range(12):
            rows.append((vid, [x + rng.uniform(-0.02, 0.02) for x in base]))
            vid += 1
    for c in range(4):
        src = rows[c * 12][1]
        rows.append((vid, [x + rng.uniform(-0.001, 0.001) for x in src]))
        vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    thr = 0.999
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(emb, "vec_id", "embedding", thr).collect()
    }
    planted = {(c * 12, 48 + c) for c in range(4)}
    assert planted <= exact
    got = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(
            emb, "vec_id", "embedding", None, thr
        ).collect()
    }
    # recall on the PLANTED near-identical copies: distance ~0.001, so
    # no sane quantizer separates them. Incidental borderline pairs
    # (jitter collisions at the threshold) MAY straddle a k-means
    # boundary — that is the documented SemDeDup recall trade, so they
    # are not asserted. Precision is exact by scoring:
    assert planted <= got
    assert got <= exact  # no invented pairs


def test_semantic_dedup_kernel_equals_expression(spark, sf_dir):
    """The Arrow/BLAS kernel and the built-in-expression twin must emit
    the IDENTICAL pair set with identical rounded cosines on the real
    embeddings table (same differential contract as the minhash bucket
    kernel)."""
    from lakeapi_spark.operators.dedup import semantic_dedup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ids = list(range(5, 21))
    handles = []
    kern = {
        (r.cid, r.id_a, r.id_b, r.cos_sim)
        for r in semantic_dedup_pairs(
            emb, "vec_id", "embedding", ids, 0.38, use_kernel=True
        ).collect()
    }
    expr = {
        (r.cid, r.id_a, r.id_b, r.cos_sim)
        for r in semantic_dedup_pairs(
            emb, "vec_id", "embedding", ids, 0.38,
            cache_handles=handles, use_kernel=False,
        ).collect()
    }
    assert kern == expr and len(kern) > 0
    for h in handles:
        h.unpersist()


def test_semantic_mega_cluster_split_matches_unsplit(spark):
    """The mega-cluster guard: when one hot centroid owns ~90 % of the
    corpus, the pair kernel hash-splits the cluster into blocks and
    scores (block_i, block_j) tasks — the pair set must be IDENTICAL to
    the unsplit kernel (same ids, same rounded cosines), and no task
    group may hold more than 2 x cap rows."""
    import random as _random

    from lakeapi_spark.operators.dedup import (
        _semantic_assignments,
        _semantic_pairs_kernel,
    )

    rng = _random.Random(23)
    dim = 6
    rows = []
    vid = 0
    hot = [1.0] + [0.05] * (dim - 1)
    for _ in range(90):  # one hot centroid owns ~90 % of rows
        rows.append((vid, [x + rng.uniform(-0.01, 0.01) for x in hot]))
        vid += 1
    cold = [0.05, 1.0] + [0.05] * (dim - 2)
    for _ in range(10):
        rows.append((vid, [x + rng.uniform(-0.01, 0.01) for x in cold]))
        vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    assigned = _semantic_assignments(
        emb, "vec_id", "embedding", centroid_ids=[0, 90]
    ).persist()
    thr = 0.999
    unsplit = {
        (r.cid, r.id_a, r.id_b, r.cos_sim)
        for r in _semantic_pairs_kernel(
            assigned, thr, max_cluster_rows=10**9
        ).collect()
    }
    cap = 8  # force ceil(90/8)=12 blocks on the hot cluster
    split = {
        (r.cid, r.id_a, r.id_b, r.cos_sim)
        for r in _semantic_pairs_kernel(
            assigned, thr, max_cluster_rows=cap
        ).collect()
    }
    assert split == unsplit and len(unsplit) > 0

    # per-task bound: no (cid, gi, gj) group exceeds two blocks' rows,
    # and no block exceeds ~cap rows (hash balance gives slack: 3x)
    blk = (
        assigned.withColumn("_n", F.count(F.lit(1)).over(__import__("pyspark").sql.Window.partitionBy("cid")))
        .filter(F.col("_n") > cap)
        .withColumn("_nb", F.ceil(F.col("_n") / F.lit(cap)).cast("int"))
        .withColumn("_blk", F.pmod(F.xxhash64("id"), F.col("_nb")).cast("int"))
        .groupBy("cid", "_blk")
        .count()
        .collect()
    )
    assert blk and max(r["count"] for r in blk) <= 3 * cap
    assigned.unpersist()


def test_cut_dup_spans_removes_shared_run(spark):
    """The planted shared 12-token run is excised from both docs; the
    unique prefix/suffix tokens survive; a no-dup doc passes through."""
    from lakeapi_spark.operators.dedup import cut_dup_spans

    shared = " ".join(f"s{i}" for i in range(12))
    uniq = lambda p, n: " ".join(f"{p}{i}" for i in range(n))
    docs = [
        (1, uniq("a", 7) + " " + shared + " " + uniq("b", 5)),
        (2, uniq("c", 3) + " " + shared + " " + uniq("d", 9)),
        (3, uniq("e", 30)),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r.id: (r.n_tokens_before, r.n_tokens_after, r.cleaned_text)
        for r in cut_dup_spans(df, "doc_id", "text", window=10).collect()
    }
    # doc 1: spans cover window starts 7..9 -> tokens 7..18 (the shared
    # run) removed; 7 prefix + 5 suffix tokens remain
    assert out[1] == (24, 12, uniq("a", 7) + " " + uniq("b", 5))
    assert out[2] == (24, 12, uniq("c", 3) + " " + uniq("d", 9))
    assert out[3] == (30, 30, uniq("e", 30))


def test_incremental_dedup_flags_known_content(spark):
    """A new doc repeating a corpus substring is flagged; a novel doc
    is not; flags are independent of partitioning."""
    from lakeapi_spark.operators.dedup import incremental_dedup_flags

    boiler = " ".join(f"w{i}" for i in range(15))
    corpus = spark.createDataFrame(
        [(1, "x0 x1 " + boiler + " x2"), (2, " ".join(f"y{i}" for i in range(25)))],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(10, "z0 " + boiler + " z1 z2"), (11, " ".join(f"q{i}" for i in range(25)))],
        ["doc_id", "text"],
    )
    out = {
        r.id: r.is_known
        for r in incremental_dedup_flags(new, corpus, "doc_id", "text", window=10).collect()
    }
    assert out == {10: True, 11: False}


# --- hypothesis differential: substring spans vs a naive Python twin --------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_DOCS_STRATEGY = st.lists(
    st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


def _naive_spans(docs, W):
    """Pure-Python reference: windows counted corpus-wide, duplicated
    positions merged into maximal runs."""
    from collections import Counter

    cnt = Counter()
    for _, toks in docs:
        for p in range(max(len(toks) - W + 1, 0)):
            cnt[tuple(toks[p : p + W])] += 1
    spans = {}
    for did, toks in docs:
        ps = [
            p
            for p in range(max(len(toks) - W + 1, 0))
            if cnt[tuple(toks[p : p + W])] > 1
        ]
        runs = []
        for p in ps:
            if runs and p == runs[-1][1] + 1:
                runs[-1] = (runs[-1][0], p)
            else:
                runs.append((p, p))
        spans[did] = runs
    return spans


@given(_DOCS_STRATEGY)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_substring_spans_match_naive(spark, token_docs):
    """Differential: the distributed span detection and cut must agree
    with the naive corpus-wide Python computation on tiny adversarial
    corpora (2-token vocab forces heavy window collisions)."""
    from lakeapi_spark.operators.dedup import cut_dup_spans, substring_dup_spans

    W = 3
    docs = [(i, toks) for i, toks in enumerate(token_docs)]
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs], "doc_id long, text string"
    )
    expect = _naive_spans(docs, W)
    got = {}
    for r in substring_dup_spans(df, "doc_id", "text", window=W).collect():
        got.setdefault(r.id, []).append((r.start_pos, r.end_pos))
    for did in got:
        got[did].sort()
    assert got == {d: v for d, v in expect.items() if v}

    # cut consistency: tokens removed == union of covered positions
    cut = {
        r.id: (r.n_tokens_before, r.n_tokens_after)
        for r in cut_dup_spans(df, "doc_id", "text", window=W).collect()
    }
    for did, toks in docs:
        covered = set()
        for s_, e_ in expect[did]:
            covered.update(range(s_, e_ + W))
        nb, na = cut[did]
        assert nb == len(toks) and na == len(toks) - len(covered)


def test_semantic_multiprobe_superset_of_single_probe(spark, sf_dir):
    """n_probe=2 can only ADD pairs relative to n_probe=1 (boundary
    pairs sharing a second-nearest cluster), never lose one; every pair
    still meets the threshold."""
    from lakeapi_spark.operators.dedup import (
        semantic_dedup_pairs,
        semantic_dedup_pairs_multiprobe,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ids = list(range(5, 21))
    single = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(emb, "vec_id", "embedding", ids, 0.38).collect()
    }
    multi_rows = semantic_dedup_pairs_multiprobe(
        emb, "vec_id", "embedding", ids, 0.38, n_probe=2
    ).collect()
    multi = {(r.id_a, r.id_b) for r in multi_rows}
    assert single <= multi
    assert all(r.cos_sim >= 0.38 for r in multi_rows)
    assert len(multi_rows) == len(multi)  # distinct collapsed shared-cluster finds


def test_corpus_hashes_cache_keyed_by_version(spark):
    """Same (identity, version) reuses the persisted relation; a new
    version evicts and unpersists the stale one (the BM25-index cache
    contract applied to the ingest-guard artifact)."""
    from lakeapi_spark.operators.dedup import _CORPUS_HASH_CACHE, corpus_hashes_for

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(15)))], ["doc_id", "text"]
    )
    try:
        a = corpus_hashes_for(df, "doc_id", "text", ("tbl", 1), window=10)
        b = corpus_hashes_for(df, "doc_id", "text", ("tbl", 1), window=10)
        assert a is b
        # different WINDOW at the same version is a different artifact,
        # not a cache hit (a window-10 set must not answer window-20)
        w20 = corpus_hashes_for(df, "doc_id", "text", ("tbl", 1), window=20)
        assert w20 is not a
        c = corpus_hashes_for(df, "doc_id", "text", ("tbl", 2), window=10)
        assert c is not a
        assert not any(
            k[0] == "tbl" and k[1] == 1 for k in _CORPUS_HASH_CACHE
        )  # stale version evicted (both window variants)
        assert c.count() == 6  # 15 tokens -> 6 window starts
    finally:
        for k in [k for k in _CORPUS_HASH_CACHE if k[0] == "tbl"]:
            _CORPUS_HASH_CACHE.pop(k).unpersist()


def test_semantic_autoscale_clamps_and_rejects_empty(spark):
    """n_centroids beyond the corpus size is clamped (pre-fix this
    crashed rng.choice once k outgrew the k-means driver sample — the
    exact regime the sqrt(n) auto rule targets); an empty corpus fails
    loudly instead of isqrt(-1)."""
    import random as _random

    from lakeapi_spark.operators.dedup import semantic_dedup_pairs

    rng = _random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(10)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    out = semantic_dedup_pairs(
        emb, "vec_id", "embedding", None, 0.99, n_centroids=50
    )
    assert out.count() >= 0  # runs; k clamped to corpus size

    empty = emb.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="non-empty"):
        semantic_dedup_pairs(empty, "vec_id", "embedding", None, 0.99).count()


def _synth_embeddings(spark, n: int, dim: int = 8):
    """Deterministic synthetic embedding table (tests only — the
    registry queries stay on the driver's testdata). Values are a
    hash-grid in [0.1, 1.07) so no row has a zero norm."""
    rows = [
        (i, [float(((i * 31 + j * 17) % 97) / 100.0 + 0.1) for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_kernel_assignment_equals_expression(spark):
    """Above KERNEL_CENTROID_THRESHOLD the seeded assignment switches to
    the Arrow numpy kernel; results must be IDENTICAL to the literal-
    expression path (forced via a monkeypatched threshold) — same
    inverted lists, same served top-k."""
    from lakeapi_spark.operators import similarity as sim

    emb = _synth_embeddings(spark, 400)
    q = emb.filter(F.col("vec_id") <= 3)
    ids = list(range(10, 10 + sim.KERNEL_CENTROID_THRESHOLD))  # >= threshold

    index_k = sim.build_ivf_index(emb, "vec_id", "embedding", ids)
    old = sim.KERNEL_CENTROID_THRESHOLD
    sim.KERNEL_CENTROID_THRESHOLD = 10**9
    try:
        index_e = sim.build_ivf_index(emb, "vec_id", "embedding", ids)
        lists_k = {
            (r.id, r.cid, round(r.nrm, 9)) for r in index_k.lists.collect()
        }
        lists_e = {
            (r.id, r.cid, round(r.nrm, 9)) for r in index_e.lists.collect()
        }
        assert lists_k == lists_e and len(lists_k) == 400
        served_e = {
            (r.query_id, r.neighbor_id, r.cosine, r.rank)
            for r in sim.ivf_topk_indexed(
                index_e, q, "vec_id", "embedding", k=5, n_probe=3
            ).collect()
        }
    finally:
        sim.KERNEL_CENTROID_THRESHOLD = old
        index_e.unpersist()
    try:
        served_k = {
            (r.query_id, r.neighbor_id, r.cosine, r.rank)
            for r in sim.ivf_topk_indexed(
                index_k, q, "vec_id", "embedding", k=5, n_probe=3
            ).collect()
        }
        assert served_k == served_e and len(served_k) > 0
    finally:
        index_k.unpersist()


def test_ivf_sq8_kernel_assignment_equals_expression(spark):
    """ivf_sq8_topk's coarse assignment also switches to the Arrow
    kernel above KERNEL_CENTROID_THRESHOLD; the served top-k must be
    IDENTICAL to the literal-expression path (the in-list rerank is
    integer-exact in both, so any drift would be an assignment bug)."""
    from lakeapi_spark.operators import similarity as sim

    emb = _synth_embeddings(spark, 400)
    q = emb.filter(F.col("vec_id") <= 3)
    ids = list(range(10, 10 + sim.KERNEL_CENTROID_THRESHOLD))  # >= threshold

    served_k = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in sim.ivf_sq8_topk(
            emb, q, "vec_id", "embedding", k=5, centroid_ids=ids, n_probe=3
        ).collect()
    }
    old = sim.KERNEL_CENTROID_THRESHOLD
    sim.KERNEL_CENTROID_THRESHOLD = 10**9
    try:
        served_e = {
            (r.query_id, r.neighbor_id, r.cosine, r.rank)
            for r in sim.ivf_sq8_topk(
                emb, q, "vec_id", "embedding", k=5, centroid_ids=ids, n_probe=3
            ).collect()
        }
    finally:
        sim.KERNEL_CENTROID_THRESHOLD = old
    assert served_k == served_e and len(served_k) == 4 * 5  # 4 queries x k


def test_ivf_2048_centroids_bounded_plan(spark):
    """sqrt(n)-scale quantizer: 2,048 centroids must build and serve
    with a plan whose size does NOT scale with n_centroids (the literal
    path would bake 2048 x dim doubles into the plan; the kernel path
    closure-captures them)."""
    from lakeapi_spark.operators import similarity as sim

    emb = _synth_embeddings(spark, 3000)
    ids = list(range(2048))  # 2048 centroid ids, all present in the table
    index = sim.build_ivf_index(emb, "vec_id", "embedding", ids)
    try:
        assert len(index.cents) == 2048
        plan_lists = index.lists._jdf.queryExecution().simpleString()
        assert len(plan_lists) < 20_000, len(plan_lists)

        q = emb.filter(F.col("vec_id") < 3)
        served = sim.ivf_topk_indexed(index, q, "vec_id", "embedding", k=5)
        plan_served = served._jdf.queryExecution().simpleString()
        assert len(plan_served) < 20_000, len(plan_served)
        rows = served.collect()
        assert len(rows) == 3 * 5
        # every served neighbor comes from a probed list, ranked 1..k
        assert {r.rank for r in rows} == {1, 2, 3, 4, 5}
    finally:
        index.unpersist()


def test_png_real_decode_roundtrip_and_rejects(spark):
    """decode_real is a REAL stdlib PNG decode: edge shapes (1-char text
    -> 2x2 raster, both gray and RGB) round-trip bit-exactly through
    deflate + all-five-filter encode; corrupted payloads (flipped byte
    -> CRC mismatch, truncation, bad signature) come back valid=false
    rows, never exceptions."""
    from lakeapi_spark.operators.multimodal import (
        attach_real_png_payload,
        decode_real,
    )

    rows = [
        (0, "a"),                      # 1 char -> w=2,h=2, gray, filters 0,1
        (1, "a"),                      # RGB twin, filters 1,2
        (2, "xy" * 30),                # longer, filters 2,3,4 cycle
        (3, "The quick brown fox jumps over the lazy dog"),
        (4, "z" * 47),                 # h=12 -> all five filters hit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    media = attach_real_png_payload(df, "doc_id", "text").persist()
    try:
        got = {r.id: r for r in decode_real(media).collect()}
        for rid, text in rows:
            n = len(text)
            w, h = n % 16 + 1, n % 12 + 1
            c = 1 if rid % 2 == 0 else 3
            px = [ord(text[i % n]) % 256 for i in range(w * h * c)]
            r = got[rid]
            assert r.valid, rid
            assert (r.width, r.height, r.n_channels) == (w, h, c)
            assert r.n_px == len(px)
            assert r.pixel_sum == sum(px)
            assert r.pixel_checksum == sum((i + 1) * v for i, v in enumerate(px))

        # corruption: flip one byte inside the first IDAT payload -> the
        # chunk CRC no longer matches -> valid=false
        payloads = {r.id: bytes(r.payload) for r in media.collect()}
        raw = payloads[2]
        idat_at = raw.index(b"IDAT")
        bad_crc = raw[: idat_at + 6] + bytes([raw[idat_at + 6] ^ 0xFF]) + raw[idat_at + 7 :]
        bad_rows = [(100, bad_crc), (101, raw[: len(raw) // 2]), (102, b"GIF89a" + raw)]
        bad = spark.createDataFrame(bad_rows, "id long, payload binary")
        verdicts = {r.id: r.valid for r in decode_real(bad).collect()}
        assert verdicts == {100: False, 101: False, 102: False}

        # RGBA (color type 6) decodes too: hand-build one with zlib
        import struct
        import zlib

        def chunk(typ, data):
            return (
                struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        pix = bytes(range(2 * 2 * 4))  # 2x2 RGBA
        stream = b"\x00" + pix[:8] + b"\x00" + pix[8:]
        rgba = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(stream))
            + chunk(b"IEND", b"")
        )
        r = decode_real(
            spark.createDataFrame([(7, rgba)], "id long, payload binary")
        ).collect()[0]
        assert r.valid and r.n_channels == 4 and r.pixel_sum == sum(pix)
    finally:
        media.unpersist()


def test_png_resize_roundtrip(spark):
    """png_resize: decode -> nearest-neighbor -> re-encode round-trips
    bit-exactly (downscale and upscale, gray and RGB); undecodable
    payloads drop out of the transform."""
    from lakeapi_spark.operators.multimodal import (
        attach_real_png_payload,
        decode_real,
        png_resize,
    )

    rows = [(0, "abcdefgh" * 4), (1, "xy" * 25), (2, "q")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    media = attach_real_png_payload(df, "doc_id", "text")
    for tw, th in [(3, 2), (20, 15)]:  # down- and up-scale
        out = {r.id: r for r in decode_real(png_resize(media, tw, th)).collect()}
        for rid, text in rows:
            n = len(text)
            w, h = n % 16 + 1, n % 12 + 1
            c = 1 if rid % 2 == 0 else 3
            src = [ord(text[i % n]) % 256 for i in range(h * w * c)]
            exp = [
                src[(((y * h) // th) * w + (x * w) // tw) * c + ch]
                for y in range(th)
                for x in range(tw)
                for ch in range(c)
            ]
            r = out[rid]
            assert r.valid and (r.width, r.height, r.n_channels) == (tw, th, c)
            assert r.pixel_sum == sum(exp)
            assert r.pixel_checksum == sum((i + 1) * v for i, v in enumerate(exp))

    # an undecodable payload is dropped, not poisoned
    broken = spark.createDataFrame(
        [(9, b"not a png"), (0, bytes(media.collect()[0].payload))],
        "id long, payload binary",
    ).selectExpr("id", "payload", "'image/png' AS media_type",
                 "1 AS width", "1 AS height", "CAST(9 AS LONG) AS n_bytes")
    got = decode_real(png_resize(broken, 2, 2)).collect()
    assert [r.id for r in got] == [0] and got[0].valid


def test_pq_topk_recall_and_determinism(spark, sf_dir):
    """pq_topk: ADC over 16x16 integer product codes reaches a modest
    recall floor vs brute force on structure-free uniform vectors (real
    embedding corpora cluster and do far better), and the whole
    pipeline is deterministic across runs."""
    from lakeapi_spark.operators.similarity import brute_force_topk, pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") <= 4)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, q, "vec_id", "embedding", k=10).collect()
    }
    ids = list(range(5, 21))
    approx = pq_topk(
        emb, q, "vec_id", "embedding", k=10, codebook_ids=ids, m_subspaces=16
    )
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(exact & got) / len(exact) >= 0.25
    again = {
        (r.query_id, r.neighbor_id, r.adist, r.rank)
        for r in pq_topk(
            emb, q, "vec_id", "embedding", k=10, codebook_ids=ids, m_subspaces=16
        ).collect()
    }
    assert {(r.query_id, r.neighbor_id) for r in approx.collect()} == got
    assert len(again) == 50 and all(isinstance(t[2], int) for t in again)

    with pytest.raises(ValueError, match="not divisible"):
        pq_topk(emb, q, "vec_id", "embedding", k=3, codebook_ids=ids, m_subspaces=7)


def test_cluster_loops_raise_on_max_iter_exhaustion(spark):
    """Both connected-components variants must fail loudly when
    max_iter exhausts before their fixpoint (partially-propagated
    labels are indistinguishable from converged ones otherwise), and
    still converge normally on the same input with enough rounds."""
    import pytest

    from lakeapi_spark.operators.dedup import dup_clusters, dup_clusters_star

    # a 12-node path needs ~11 propagation rounds / ~4 alternations
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    ok = dup_clusters(chain).collect()
    assert {r.cluster_id for r in ok} == {0}
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(chain, max_iter=3)

    ok_star = dup_clusters_star(chain).collect()
    assert {r.cluster_id for r in ok_star} == {0}
    with pytest.raises(RuntimeError, match="fixpoint"):
        dup_clusters_star(chain, max_iter=1)


def test_zero_norm_vector_ranks_last_and_paths_agree(spark):
    """A zero vector (failed embedding) must score cosine 0.0 — NOT
    NaN, which Spark sorts ABOVE every double and which therefore
    NaN-sorted to the TOP of every desc top-k before the cosine_parts
    guard. The JVM expression path and the numpy kernel (which always
    guarded with max(norm, 1e-12)) must agree on such corpora."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.0]),  # the failed-embed row
    ]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 1)
    a = {(r.neighbor_id, r.rank): r.cosine
         for r in brute_force_topk(emb, q, "vec_id", "embedding", k=3).collect()}
    # zero vector scores 0.0 and lands LAST, never first
    assert a[(2, 1)] > a[(3, 2)] >= 0.0
    assert a[(4, 3)] == 0.0
    b = numpy_topk(emb, {1: [1.0, 0.0, 0.0]}, "vec_id", "embedding", k=3)
    rows_b = sorted((r.neighbor_id, r.rank) for r in b.collect())
    assert rows_b == sorted(k for k in a)
