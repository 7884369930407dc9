"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent per partition layout — re-running
after a repartition yields a different sample, which poisons
train/eval splits and incremental reprocessing. The operators here
hash a STABLE KEY instead: membership is a pure function of the row's
key, identical across runs, engines, partitionings, and appends —
the same property the reference exploits for md5-derived partitions
(core/datasource.py:317-342), applied row-wise.

Hash = first 15 hex chars of md5(key-as-string) -> int64 (60 bits,
reproducible bit-for-bit in DuckDB with
``CAST(concat('0x', substr(md5(v), 1, 15)) AS BIGINT)``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakeapi_spark.operators.scale import TEXT_TASK_BYTES, fan_out, lit_array


def key_hash(col: Column) -> Column:
    """Stable 60-bit integer hash of a column's string form."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def hash_sample(df: DataFrame, key_col: str, mod: int, keep_below: int) -> DataFrame:
    """Keep rows with hash(key) % mod < keep_below — a keep_below/mod
    fraction. Sampling by a GROUPING key (user id, document id, order
    key) keeps whole groups together: all lineitems of a sampled order
    survive, which is what a train/eval split needs."""
    return df.filter(key_hash(F.col(key_col)) % mod < keep_below)


def hash_split(df: DataFrame, key_col: str, mod: int, eval_below: int) -> tuple[DataFrame, DataFrame]:
    """(train, eval) disjoint split on the same stable hash."""
    h = key_hash(F.col(key_col)) % mod
    return df.filter(h >= eval_below), df.filter(h < eval_below)


def shuffle_shard(
    df: DataFrame, key_col: str, n_shards: int, seed: int = 42
) -> DataFrame:
    """Deterministic global shuffle + sharding — the terminal export
    step of a training pipeline ("shuffle the corpus, write N shards,
    stream shards sequentially at train time"). Returns
    (key, shard, shard_pos): shard = hash(seed:key) mod n_shards
    (balanced in expectation, seed varies the permutation between
    epochs/experiments), shard_pos = the row's position within its
    shard ordered by (hash, key).

    Because order and shard are pure functions of (seed, key), the
    layout is reproducible across runs, engines, partitionings, and
    cluster sizes — df.orderBy(rand()) is none of those. Plan shape:
    ONE hash exchange on shard + an in-partition sort (the window
    partitions BY the shard key), i.e. exactly
    repartition(n_shards) + sortWithinPartitions at any scale — never
    a global total-order sort. The export would follow with
    partitionBy(shard) writes."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive: {n_shards}")
    h = key_hash(F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("h", key_col)
    return (
        df.select(F.col(key_col), h.alias("h"))
        .withColumn("shard", F.col("h") % n_shards)
        .withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .select(key_col, "shard", "shard_pos")
    )


def quota_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    quota: int,
    prefilter_keep: tuple[int, int] | None = None,
) -> DataFrame:
    """Per-group deterministic cap: keep the ``quota`` LOWEST-HASH rows
    of each group — the "no language/source may exceed N docs"
    balancing rule corpora apply before training. Because rank is by
    the stable key hash, the kept set is a uniform-at-random-looking
    but fully reproducible subset, stable under appends EXCEPT at the
    quota boundary (a new low-hash row displaces the current highest —
    the unavoidable semantics of an exact cap; use
    :func:`mixture_sample`'s rate thinning when drift-free membership
    matters more than an exact count).

    Plan: one hash exchange on the group key + in-partition rank —
    groups courser than executors parallelize by the exchange; a
    pathological mega-group ranks within one task. The 100 TB escape is
    ``prefilter_keep=(keep, mod)``: rows with ``key_hash >= 2^60 *
    keep / mod`` drop BEFORE the rank, shrinking the mega-group's
    in-task sort by ~mod/keep. Because the rank itself is by that same
    hash ascending, the prefilter keeps the EXACT winner set whenever
    every group retains ``min(total, quota)`` survivors — verified by a
    group-sized count pass that raises RuntimeError naming the first
    truncated groups when the fraction was cut too thin (loud, never a
    silently-smaller sample; same convergence-probe discipline as
    k_core / connected components).

    Cost note (dial on only): the guard is an EAGER action at call
    time — construction fails fast instead of deep inside a later
    job — and it recomputes ``df``'s lineage once more than the plain
    path (guard aggregate now + survivors scan at action time). With
    an expensive upstream pipeline, ``df.persist()`` before calling,
    or pass an already-materialized input; the operator deliberately
    does not persist for you (it cannot know the caller's storage
    budget, and an unsolicited persist pins executor memory at 100 TB
    scale)."""
    if quota <= 0:
        raise ValueError(f"quota must be positive: {quota}")
    if prefilter_keep is not None:
        keep, mod = prefilter_keep
        if not (0 < keep <= mod):
            raise ValueError(
                f"prefilter_keep must satisfy 0 < keep <= mod: {prefilter_keep}"
            )
        ceiling = (2**60 * keep) // mod  # key_hash is 60-bit; exact int math
        survivors = df.filter(key_hash(F.col(key_col)) < F.lit(ceiling))
        # one conditional-aggregate pass computes both counts (a
        # group-sized partial agg — no second scan, no join)
        truncated = (
            df.groupBy(group_col)
            .agg(
                F.count(F.lit(1)).alias("__tot"),
                F.count(
                    F.when(key_hash(F.col(key_col)) < F.lit(ceiling), 1)
                ).alias("__kept"),
            )
            .filter(F.col("__kept") < F.least(F.col("__tot"), F.lit(quota)))
            .select(group_col)
        )
        bad = [r[0] for r in truncated.limit(5).collect()]
        if bad:
            raise RuntimeError(
                f"quota_sample(prefilter_keep={prefilter_keep}): the hash "
                f"prefilter truncated group(s) {bad} below min(total, "
                f"quota={quota}) — raise the keep fraction (the result "
                f"would otherwise silently differ from the unfiltered cap)"
            )
        df = survivors
    w = Window.partitionBy(group_col).orderBy(
        key_hash(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__qr", F.row_number().over(w))
        .filter(F.col("__qr") <= quota)
        .drop("__qr")
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    rates: dict[str, tuple[int, int]],
    default: tuple[int, int] = (1, 1),
) -> DataFrame:
    """Deterministic source-mixture downsampling: keep a row iff
    ``hash(key) % mod < keep`` for its group's ``(keep, mod)`` rate —
    the "data mixing" step that reweights corpus sources (web vs code
    vs reference text) before training. Rates are exact rationals, not
    floats, so membership is bit-identical in any engine; sampling by
    the stable key hash makes the mix reproducible across runs,
    appends, and repartitionings (same property as hash_sample).

    Pure per-row expressions — a literal CASE ladder over the group
    column, no join, no shuffle: at 100 TB this is a map-only pass
    fused into whatever scan precedes it (upsampling is out of scope:
    a filter can only thin; duplication-based upweighting belongs in
    the dataloader)."""
    keep = F.lit(default[0])
    mod = F.lit(default[1])
    for g, (k, m) in sorted(rates.items()):
        if not (0 <= k <= m and m > 0):
            raise ValueError(f"rate for {g!r} must satisfy 0 <= keep <= mod: {(k, m)}")
        keep = F.when(F.col(group_col) == g, F.lit(k)).otherwise(keep)
        mod = F.when(F.col(group_col) == g, F.lit(m)).otherwise(mod)
    return df.filter(key_hash(F.col(key_col)) % mod < keep)


#: buckets ceiling for dsir's K-element literal-array score lookup
#: (ADVICE r13): at the default 1024 the parsed literal is ~25 KB —
#: one py4j call, tiny plan; at 2^17 (plausible for hashed feature
#: spaces) it would be a multi-MB expression parsed and shipped with
#: every plan. Above the ceiling the dense lookup ships as a one-row
#: broadcast relation instead (constant plan size, same fold).
LR_LOOKUP_MAX_BUCKETS = 8192


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_predicate: str,
    n: int = 2,
    buckets: int = 1024,
    cache_handles: list | None = None,
    storage_level: "StorageLevel | None" = None,
) -> DataFrame:
    """DSIR-style hashed-n-gram importance scores (after Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every document by how target-like its word
    n-gram distribution is, so a raw crawl can be resampled toward a
    small high-quality target domain (``target_predicate`` selects the
    target rows, e.g. ``"lang = 'en'"``).

    Features are word n-grams hashed into ``buckets`` fixed buckets
    (portable 60-bit md5 hash -- DuckDB re-derives every value). With
    Laplace-smoothed bucket probabilities p_t (target) and p_r (raw =
    whole corpus), a doc's score is the MEAN log importance ratio over
    its gram occurrences:

        logw_mean = avg over grams of ln(p_t(b) / p_r(b))

    computed in subtraction form ln((c_t+1)(N_r+K)) - ln((c_r+1)(N_t+K))
    over exactly-representable integer products, each bucket ratio
    ROUNDED to 6 before the per-doc average (the round-before-average
    discipline that makes double sums engine-exact, same as
    text.unigram_logprob). Returns (id, n_grams, logw_mean, keep) with
    keep = 1 iff the rounded mean is positive (more target-like than
    the corpus average).

    100 TB design (r13, guide §2.4 — remove shuffles outright): ONE
    tokenize pass materializes the per-doc bucket ARRAY (id, _tgt, bs),
    persisted once. The histogram explodes it into a map-side-combined
    aggregate whose output is at most ``buckets`` rows -- collected
    driver-side (K-bounded, the same discipline as the IVF centroid
    sample and the vocab broadcast); ln stays an ENGINE expression
    (computed over the exact integer counts in a K-row local relation,
    then collected) so the oracle's ln sees identical double inputs.
    Scoring is then a MAP-ONLY fold over each doc's bucket array
    against a K-element literal lookup -- no per-doc shuffle, no
    broadcast join: the old plan shuffled the corpus-sized exploded
    gram stream into a groupBy(doc) after a broadcast join; this one
    shuffles nothing after the histogram. The fold accumulates the
    rounded per-bucket ratios in array order -- the same order the
    exploded rows reached the old avg(), so logw_mean is bit-identical.

    ``storage_level`` controls the tokenize-once persist of the bucket
    relation: the default is DISK_ONLY — at corpus scale the relation
    is one int64 per gram occurrence (strictly smaller than the old
    3-words-per-gram exploded rows), and caching it in executor memory
    would evict working memory the histogram shuffle needs; local
    spill-to-disk reads are one sequential pass. Small/interactive
    corpora can pass MEMORY_AND_DISK to skip the serialization
    round-trip."""
    from pyspark import StorageLevel

    from lakeapi_spark.operators.text import tokens

    if storage_level is None:
        storage_level = StorageLevel.DISK_ONLY

    K = buckets
    t = tokens(F.col(text_col))
    # the when() double-reference blocks CollapseProject from inlining
    # the tokenize pipeline into every element_at (see contamination
    # _doc_grams for the measured 27x hazard)
    # fan_out before the CPU-heavy tokenize: a narrow input (single
    # small file / coalesced shuffle) spreads across cores, and the
    # persisted gram relation below inherits the parallel partitioning;
    # an already-parallel scan passes through with no added exchange.
    # Byte-capped task sizing — see scale.TEXT_TASK_BYTES.
    staged = fan_out(df, per_partition_bytes=TEXT_TASK_BYTES).select(
        F.col(id_col).alias("id"),
        F.expr(target_predicate).alias("_tgt"),
        F.when(F.size(t) >= 0, t).alias("t"),
    )
    grams_arr = F.when(F.size("t") < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - n + 1),
            lambda i: F.array_join(F.slice(F.col("t"), i, n), " "),
        )
    )
    g = (
        staged.select(
            "id",
            "_tgt",
            F.transform(grams_arr, lambda s: key_hash(s) % K).alias("bs"),
        ).persist(storage_level)
        # one row per doc with its bucket ids — feeds the histogram job
        # AND the scoring pass: tokenize once, never resident in
        # executor memory (see docstring)
    )
    if cache_handles is not None:
        cache_handles.append(g)
    # ONE K-bounded driver collect: the global totals ride the K-row
    # histogram as single-partition window sums (K rows, one tiny
    # exchange), and the log-ratio stays an ENGINE expression computed
    # over the exact integer counts — identical double inputs for the
    # oracle's ln, same products as the former two-step
    # (collect counts -> Arrow local relation -> collect ratios) shape,
    # which paid a second collect job and a driver Arrow round-trip per
    # call (r14, guide §5).
    w_all = Window.partitionBy()
    ratio_rows = (
        g.select("_tgt", F.explode("bs").alias("b"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("c_r"),
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("c_t"),
        )
        .select(
            "b",
            F.round(
                F.log(
                    ((F.col("c_t") + 1) * (F.sum("c_r").over(w_all) + K)).cast(
                        "double"
                    )
                )
                - F.log(
                    ((F.col("c_r") + 1) * (F.sum("c_t").over(w_all) + K)).cast(
                        "double"
                    )
                ),
                6,
            ).alias("lr"),
        )
        .collect()
    )
    lr_by_b = {int(r["b"]): float(r["lr"]) for r in ratio_rows}
    if K <= LR_LOOKUP_MAX_BUCKETS:
        # ONE parsed array literal: spelling it as K F.lit()/F.array
        # calls costs thousands of py4j round-trips (~0.7 s of measured
        # driver time); repr() round-trips every double exactly through
        # the SQL parser's parseDouble
        lr_lookup = F.expr(
            "array(" + ",".join(f"{lr_by_b.get(i, 0.0)!r}D" for i in range(K)) + ")"
        )
        lookup_at = lambda b: F.element_at(lr_lookup, b.cast("int") + 1)  # noqa: E731
        src = g
    else:
        # a multi-MB literal would have to parse and ship per plan
        # (ADVICE r13): above the ceiling the dense lookup rides a
        # one-row broadcast relation instead — constant plan size, one
        # tiny broadcast, same element_at fold
        import pandas as pd

        arr_rel = df.sparkSession.createDataFrame(
            pd.DataFrame({"_lrs": [[lr_by_b.get(i, 0.0) for i in range(K)]]}),
            "_lrs array<double>",
        )
        src = g.crossJoin(F.broadcast(arr_rel))
        lookup_at = lambda b: F.element_at(F.col("_lrs"), b.cast("int") + 1)  # noqa: E731
    # map-only scoring: every bucket in a doc's array is present in the
    # histogram by construction, so element_at never misses; docs with
    # zero grams produced no rows under the old explode and are
    # filtered the same way here
    scored = src.filter(F.size("bs") > 0).select(
        "id",
        F.size("bs").cast("long").alias("n_grams"),
        (
            F.round(
                F.aggregate(
                    "bs",
                    F.lit(0.0),
                    lambda acc, b: acc + lookup_at(b),
                )
                / F.size("bs"),
                4,
            )
            + F.lit(0.0)
        ).alias("logw_mean"),  # -0.0 -> +0.0
    )
    return scored.select(
        "id",
        "n_grams",
        "logw_mean",
        (F.col("logw_mean") > 0).cast("long").alias("keep"),
    )


def domain_reputation(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    lang_col: str,
    dup_threshold: float = 0.2,
    quality_threshold: float = 0.5,
) -> DataFrame:
    """Per-source (per-domain) curation rollup — the crawl-curation
    companion to the per-doc ``curation_verdicts``: before spending
    compute on a domain's documents, score the DOMAIN. Returns one row
    per source: (source, n_docs, n_dup_docs, dup_rate, avg_quality,
    top_lang, lang_share, verdict) where

    - dup_rate = fraction of the source's docs whose normalized-text
      fingerprint occurs more than once ANYWHERE in the corpus (a
      domain mirroring others is itself suspect);
    - avg_quality = mean heuristic quality, summed in DECIMAL so the
      mean is engine-exact (the money-sum discipline);
    - top_lang / lang_share = the source's modal language and its
      share (tie -> lexicographically first, nulls keyed as '');
    - verdict: 'keep' when dup_rate <= dup_threshold and avg_quality
      >= quality_threshold, else 'review' when dup_rate <= 2x the
      threshold, else 'drop'.

    Scale shape: one corpus-wide window over the fingerprint (the
    dedup shuffle), one groupBy(source) aggregate, one tiny
    (source, lang) count relation joined back — outputs are
    domain-bounded, never row-bounded."""
    from pyspark.sql.window import Window

    from lakeapi_spark.operators.dedup import normalized
    from lakeapi_spark.operators.text import quality_score

    base = df.select(
        F.col(source_col).alias("source"),
        F.coalesce(F.col(lang_col), F.lit("")).alias("lang"),
        F.md5(normalized(F.col(text_col))).alias("fp"),
        quality_score(F.col(text_col)).alias("q"),
    )
    flagged = base.withColumn(
        "c", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    )
    agg = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_dup_docs"),
        F.sum(F.col("q").cast("decimal(10,4)")).alias("sq"),
    )
    lw = Window.partitionBy("source").orderBy(
        F.col("n_lang").desc(), F.col("lang")
    )
    top_lang = (
        base.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_lang"))
        .withColumn("rn", F.row_number().over(lw))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), "n_lang")
    )
    dup_rate = F.col("n_dup_docs").cast("double") / F.col("n_docs")
    avg_q = F.round(
        F.col("sq").cast("double") / F.col("n_docs"), 4
    ) + F.lit(0.0)
    verdict = (
        F.when(
            (dup_rate <= F.lit(dup_threshold))
            & (avg_q >= F.lit(quality_threshold)),
            F.lit("keep"),
        )
        .when(dup_rate <= F.lit(2 * dup_threshold), F.lit("review"))
        .otherwise(F.lit("drop"))
    )
    return agg.join(top_lang, "source").select(
        "source",
        "n_docs",
        "n_dup_docs",
        dup_rate.alias("dup_rate"),
        avg_q.alias("avg_quality"),
        "top_lang",
        (F.col("n_lang").cast("double") / F.col("n_docs")).alias("lang_share"),
        verdict.alias("verdict"),
    )


def weighted_sample_aes(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the
    Efraimidis-Spirakis A-ES scheme (IPL 2006) — each row draws
    u = hash(seed:key)/2^60 in (0, 1] and the k rows with the largest
    u^(1/w) win; inclusion probability is proportional to weight, and
    because the "randomness" is the stable md5-derived hash, the same
    (seed, keys, weights) always select the same rows. Rows with
    weight <= 0 or NULL never qualify.

    Ranked on key = ln(u)/w (monotone in u^(1/w), one libm call
    instead of pow) ROUNDED to 9 decimals with the row key as
    tiebreak, so the selection is a total order two engines agree on
    (libm ln disagreement is ~1e-16 relative; adjacent sample keys at
    any realistic corpus size are ~1/n apart).

    Plan: per-row expressions + ONE global top-k — Spark compiles the
    orderBy(...).limit(k) to TakeOrderedAndProject (per-partition
    heaps + a k-row driver merge), so there is no full sort and no
    wide shuffle at any corpus size. Returns the winning rows plus
    ``sample_key``."""
    u = (
        key_hash(F.concat(F.lit(f"aes{seed}:"), F.col(key_col).cast("string"))).cast(
            "double"
        )
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    # + 0.0 folds IEEE -0.0 (u == 1 exactly) to +0.0 — engines differ
    # on which zero ROUND emits
    key = F.round(F.log(u) / w, 9) + F.lit(0.0)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(key_col))
        .limit(k)
    )


def weighted_sample_aes_grouped(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    group_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Per-group Efraimidis-Spirakis weighted sampling without
    replacement: the k highest-A-ES-key rows of EACH group — "200 docs
    per language, drawn proportional to quality score" in one pass.
    Same deterministic sample keys as :func:`weighted_sample_aes`;
    selection is a window rank partitioned by the group (one hash
    exchange on the group key, in-partition heapless rank). Mega-group
    caveat matches :func:`quota_sample`: rate-filter pathological
    groups first at 100 TB."""
    u = (
        key_hash(F.concat(F.lit(f"aes{seed}:"), F.col(key_col).cast("string"))).cast(
            "double"
        )
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / w, 9) + F.lit(0.0)
    ranked = (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("sample_key", key)
        .withColumn(
            "sample_rank",
            F.row_number().over(
                Window.partitionBy(group_col).orderBy(
                    F.col("sample_key").desc(), F.col(key_col)
                )
            ),
        )
    )
    return ranked.filter(F.col("sample_rank") <= k)


def budget_select(
    df: DataFrame,
    id_col: str,
    score_col: str,
    weight_col: str,
    budget: int,
    n_buckets: int = 64,
) -> DataFrame:
    """Greedy budgeted selection: walk rows in (score DESC, id ASC)
    order and keep them while the running ``weight_col`` total stays
    within ``budget`` — the "take the best documents until the token
    budget is full" curriculum step of a training-data pipeline.
    Returns the kept rows plus ``cum_weight`` (inclusive running
    total).

    The naive spelling is a GLOBAL window (one partition eats the
    corpus). This one is a distributed two-pass prefix sum:
    approxQuantile boundaries on the score split rows into
    ``n_buckets`` value-disjoint buckets map-side (ties share a
    bucket, so bucket order extends to a correct total order); bucket
    weight totals — at most ``n_buckets`` rows — come to the driver to
    form exclusive offsets; the intra-bucket running sum is a window
    PARTITIONED BY bucket. Every stage is bounded: no global sort, no
    single-partition window, driver traffic = n_buckets rows.
    """
    bnds = sorted(
        set(
            df.stat.approxQuantile(
                score_col, [i / n_buckets for i in range(1, n_buckets)], 0.001
            )
        )
    )
    arr = lit_array([float(b) for b in bnds], "double")
    # count of boundaries strictly above the score: highest scores ->
    # bucket 0, so bucket ASC == score DESC between buckets
    bucket = F.size(F.filter(arr, lambda b: b > F.col(score_col).cast("double")))
    rows = df.withColumn("_bkt", bucket)
    totals = {
        r["_bkt"]: r["_w"]
        for r in rows.groupBy("_bkt").agg(F.sum(weight_col).alias("_w")).collect()
    }
    off, offsets = 0, {}
    for b in sorted(totals):
        offsets[b] = off
        off += totals[b]
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (omap[F.col("_bkt")] + F.sum(weight_col).over(w)).cast("long")
    return (
        rows.withColumn("cum_weight", cum)
        .filter(F.col("cum_weight") <= budget)
        .drop("_bkt")
    )
