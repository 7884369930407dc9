"""Text-analysis operators for training-data pipelines (greenfield
extension, BASELINE.json north star; no reference equivalent).

All hot-path logic is built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — no Python UDFs. Each operator has an exact SQL
twin so the DuckDB oracle can verify it.

- tokens:        whitespace tokenization + counts
- quality score: length / punctuation / stopword-ratio heuristics
- language id:   stopword-hit n-gram heuristic over a tiny built-in
                 lexicon (argmax of per-language hit counts)
- fingerprint:   md5 content fingerprint of normalized text (md5 is
                 identical across engines -> strong oracle)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny public stopword lexicons (enough for a deterministic heuristic;
# real pipelines would swap in fastText/CLD3 behind the same operator)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"]


def portable_hash60(c: Column) -> Column:
    """60-bit string hash both engines compute bit-identically:
    int(md5(x)[:15 hex chars]). DuckDB twin:
    ``CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)``. Non-negative,
    so shifts/mods stay in int64 under ANSI arithmetic."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed lowercased text (empty -> [])."""
    t = F.regexp_replace(F.lower(text), r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", "")
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"[ \t\n\x0B\f\r]+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def _count_hits(toks: Column, words: list[str]) -> Column:
    from lakeapi_spark.operators.scale import lit_array

    return F.size(F.array_intersect(toks, lit_array(words, "string")))


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality score:
    0.4 * length_score (saturates at 200 chars)
    + 0.3 * (1 - punct_ratio)          (punct = .,;:!?)
    + 0.3 * stopword presence ratio    (distinct EN stopwords hit / 10)
    Rounded to 4 digits for cross-engine hash stability."""
    n = F.length(text)
    length_score = F.least(n / F.lit(200.0), F.lit(1.0))
    punct = n - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    punct_ratio = F.when(n > 0, punct / n).otherwise(F.lit(0.0))
    stop_ratio = _count_hits(tokens(text), ENGLISH_STOPWORDS) / F.lit(
        float(len(ENGLISH_STOPWORDS))
    )
    return F.round(
        F.lit(0.4) * length_score + F.lit(0.3) * (1 - punct_ratio) + F.lit(0.3) * stop_ratio,
        4,
    )


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    return {lang: _count_hits(toks, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id(text: Column, default: str = "und") -> Column:
    """Argmax of per-language distinct-stopword hits; ties broken by
    language-code order (deterministic); no hits -> ``default``.

    Expressed as a chained CASE over a fixed language list so the SQL
    twin is mechanical.
    """
    scores = lang_scores(text)
    langs = sorted(scores)  # deterministic tie-break: alphabetical
    expr = F.lit(default)
    # lang wins if its score is > 0, beats alphabetically-earlier langs
    # strictly and later langs weakly (so the first lang wins ties)
    for lang in reversed(langs):
        cond = scores[lang] > 0
        for o in langs:
            if o == lang:
                continue
            cond = cond & (
                (scores[lang] > scores[o]) if o < lang else (scores[lang] >= scores[o])
            )
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_id_oracle_sql(text_expr: str, default: str = "und") -> str:
    """The DuckDB twin of :func:`lang_id` over the same lexicon."""
    toks = (
        f"string_split_regex(regexp_replace(lower({text_expr}),"
        f" '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+')"
    )
    score = {
        lang: (
            "len(list_filter(["
            + ",".join(f"'{w}'" for w in words)
            + f"], w -> list_contains({toks}, w)))"
        )
        for lang, words in LANG_STOPWORDS.items()
    }
    langs = sorted(score)
    sql = f"'{default}'"
    for lang in reversed(langs):
        conds = [f"{score[lang]} > 0"]
        for o in langs:
            if o == lang:
                continue
            op = ">" if o < lang else ">="
            conds.append(f"{score[lang]} {op} {score[o]}")
        sql = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {sql} END"
    return sql


#: GPT-2-flavoured coarse split: letter runs, digit runs, single
#: punctuation marks. Deliberately simple enough to behave identically
#: under Java regex (Spark) and RE2 (DuckDB oracle).
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]"


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under a BPE-ish regex pre-tokenizer — the number a
    subword tokenizer's input segmentation would produce, as opposed to
    the whitespace count from :func:`token_count`. Pure codegen
    (regexp_extract_all + size), no shuffle, no UDF."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_PATTERN), 0))


#: rolling-hash modulus (2^31-ish prime): keeps acc*31+v inside int64 in
#: BOTH engines (values are pre-reduced mod p, so acc*31 < 3.2e10)
ROLLING_P = 1_000_000_007


def rolling_fingerprint(text: Column) -> Column:
    """Order-sensitive polynomial rolling hash over whitespace tokens:

        fp = fold(tokens, 0, (acc, v) -> (acc*31 + v) mod p),
        v   = int(md5(token)[:15 hex]) mod p

    Unlike the content-md5 :func:`fingerprint` this is incremental —
    the building block for streaming / windowed fingerprints (hash of a
    growing prefix is O(1) per new token). Token values go through md5
    so the DuckDB oracle can reproduce them bit-for-bit; the fold is
    one per-row array aggregate, no shuffle. Empty / whitespace-only
    text folds over [] (the :func:`tokens` contract) -> fp 0."""
    vals = F.transform(tokens(text), lambda t: portable_hash60(t) % ROLLING_P)
    return F.aggregate(
        vals, F.lit(0).cast("long"), lambda acc, v: (acc * 31 + v) % ROLLING_P
    )


def repetition_metrics(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition signals — the MassiveText/Gopher-style
    quality rules a training-data pipeline filters on (Rae et al. 2021,
    table A1: "duplicate n-gram fraction", "top token share"):

    - ``n_bigrams``         word-bigram count (order kept, repeats kept)
    - ``dup_bigram_frac``   1 - distinct/total bigrams (null if none)
    - ``top_token_share``   most-frequent token's share of all tokens

    All built-in array expressions, zero shuffle, zero UDF; each stage
    is its own projection with the when() double-reference blocker so
    CollapseProject can't inline the token array into the per-element
    lambdas (same hazard as minhash_signature). top_token_share runs as
    sort + longest-equal-run fold — O(n log n) per row, NOT the naive
    O(|distinct| * |tokens|) count-per-distinct-token form, which goes
    quadratic on a pathological 100k-token document."""
    t = tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("doc_id"), F.when(F.size(t) >= 0, t).alias("t"))
    bg = F.when(F.size("t") < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.concat_ws(" ", F.element_at("t", i + 1), F.element_at("t", i + 2)),
        )
    )
    staged = base.select("doc_id", "t", F.when(F.size("t") >= 0, bg).alias("b"))
    dup_frac = F.when(
        F.size("b") > 0,
        F.round(1 - F.size(F.array_distinct("b")) / F.size("b"), 4),
    )
    # longest equal run of the SORTED tokens == max token frequency;
    # one fold with (prev, run, best) struct state
    run_state = F.aggregate(
        F.array_sort("t"),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_share = F.when(
        F.size("t") > 0,
        F.round(run_state / F.size("t"), 4),
    )
    return staged.select(
        "doc_id",
        F.size("b").alias("n_bigrams"),
        dup_frac.alias("dup_bigram_frac"),
        top_share.alias("top_token_share"),
    )


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-unigram language-model score per document — the cheap
    stand-in for the perplexity filter big pipelines run with KenLM
    (CCNet/RefinedWeb style): avg_logprob = mean over the doc's tokens
    of ln(corpus_freq(token) / corpus_total). Docs of rare/garbled
    tokens score very negative, boilerplate scores high; filter on a
    percentile band (both tails are suspect). Returns
    (id, n_tokens, avg_logprob); token-less docs drop out.

    Two corpus-statistics passes, both scale-shaped:
    1. vocabulary frequencies: explode + groupBy(token) — ONE shuffle
       with map-side partial aggregation, output is the vocab relation
       (Heaps' law: ~millions of rows off a 100 TB corpus, GBs not TBs);
    2. score join-back: tokens ⋈ vocab with the vocab BROADCAST, so the
       corpus side never shuffles. If the vocab outgrows the broadcast
       budget (no-lowercasing, code corpora), drop the hint and this
       becomes a plain shuffle join on token — same semantics.
    The corpus total is an unpartitioned window SUM over the VOCAB
    relation (not a second corpus aggregation — a `freq.agg(sum)`
    branch would re-explode and re-aggregate the whole corpus since
    Spark doesn't share subplans across branches); collapsing the
    already-tiny vocab to one partition for that sum costs what the
    broadcast costs anyway.

    Cross-engine exactness: per-token logp is rounded to 6 digits
    before averaging and the mean to 4, absorbing libm last-ULP and
    float-sum-order differences between the JVM and the DuckDB oracle
    (abs error ~1e-13 against a 1e-4 grid)."""
    from pyspark.sql.window import Window

    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    vocab = freq.select(
        "tok",
        F.round(F.log(F.col("n") / F.sum("n").over(Window.partitionBy())), 6).alias("logp"),
    )
    return toks.join(F.broadcast(vocab), "tok").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("logp"), 4).alias("avg_logprob"),
    )


def word_id_export(
    df: DataFrame, id_col: str, text_col: str, vocab_size: int = 256
) -> DataFrame:
    """Tensor-ready id export: build the corpus vocabulary (top
    ``vocab_size`` tokens by count, rank = id), map every token to its
    id (-1 = OOV), and emit per doc (id, n_tokens, n_oov, ids_md5) —
    the md5 of the space-joined ORDERED id sequence stands in for the
    id array itself (nested columns don't survive the driver's
    canonicalization; the hash proves the exact sequence). With
    shuffle_shard + pack_sequences this completes the export chain:
    text -> ids -> packed context windows -> shards.

    Plan: vocab = one map-side-combined shuffle on token + a
    ranked_topk pick of the top ``vocab_size`` tokens
    (TakeOrderedAndProject: per-partition heap over the vocab
    relation, rank window over the k-row result only — no global sort
    of the Heaps-law vocab, r13 window-audit sweep); id mapping joins
    the BROADCAST vocab against the posexploded corpus (no corpus
    shuffle); the per-doc reassembly is the one unavoidable id-keyed
    aggregate. OOV policy is the standard dataloader contract: ids >=
    0 index the embedding table, -1 routes to the UNK embedding."""
    from lakeapi_spark.operators.pipeline import ranked_topk

    tl = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("p", "tok")
    )
    freq = tl.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    vocab = ranked_topk(
        freq, [F.col("n").desc(), F.col("tok")], k=vocab_size, rank_col="_rk"
    ).select("tok", (F.col("_rk") - 1).cast("long").alias("tid"))
    ids = tl.join(F.broadcast(vocab), "tok", "left").select(
        id_col, "p", F.coalesce("tid", F.lit(-1)).alias("tid")
    )
    seq = F.transform(
        F.array_sort(F.collect_list(F.struct("p", "tid"))), lambda s: s["tid"].cast("string")
    )
    return ids.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("tid") == -1, 1).otherwise(0)).alias("n_oov"),
        F.md5(F.array_join(seq, " ")).alias("ids_md5"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token windows — the standard
    pre-training/RAG chunking shape: windows of ``chunk_tokens``
    whitespace tokens starting every ``chunk_tokens - overlap`` tokens
    (the last window may be short; token-less docs yield no rows).

    -> (doc_id, chunk_idx, n_tokens, chunk_text)

    Pure built-ins: one ``sequence`` of window starts per row, one
    ``posexplode`` — fan-out is |tokens|/stride rows per doc, no
    shuffle, no UDF. At 100 TB this is a map-only stage whose output
    feeds straight into the dedup/quality operators (each chunk is a
    row of the same shape ``documents`` has)."""
    stride = chunk_tokens - overlap
    if stride < 1:
        raise ValueError("overlap must be smaller than chunk_tokens")
    t = tokens(F.col(text_col))
    base = df.filter(F.col(text_col).rlike(r"[^ \t\n\x0B\f\r]")).select(
        F.col(id_col).alias("doc_id"), F.when(F.size(t) >= 0, t).alias("t")
    )
    windows = F.transform(
        F.sequence(F.lit(0), F.size("t") - 1, F.lit(stride)),
        lambda s: F.struct(
            F.size(F.slice("t", s + 1, chunk_tokens)).alias("n_tokens"),
            F.array_join(F.slice("t", s + 1, chunk_tokens), " ").alias("chunk_text"),
        ),
    )
    return base.select(
        "doc_id", F.posexplode(windows).alias("chunk_idx", "c")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long"),
        F.col("c.n_tokens").cast("long").alias("n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercased text.
    (The scalable stand-in for a rolling/Rabin hash — identical across
    engines, so it gets a strong oracle.)"""
    normalized = F.regexp_replace(
        F.regexp_replace(F.lower(text), r"^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", ""), r"[ \t\n\x0B\f\r]+", " "
    )
    return F.md5(normalized)


#: PII patterns applied IN ORDER (email before phone/ip so an address
#: containing digits is redacted as one unit). Every pattern is written
#: in the common subset of Java regex (Spark executors) and RE2
#: (DuckDB oracle): no lookaround, no backreferences, ASCII \b and \d —
#: so the scrub is bit-identically reproducible by the oracle. The
#: reference has no PII surface; this is a training-data-pipeline
#: first-class op (curation before pretraining).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+\d[\d ()-]{7,}\d", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def scrub_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact PII spans in ``text_col``: sequential regexp_replace per
    :data:`PII_PATTERNS` plus a per-kind hit count (``n_<kind>``,
    counted on the ORIGINAL text so counts are order-independent) and
    their ``n_pii`` total — the filter signal for dropping PII-heavy
    documents. Pure JVM expressions (regexp_replace / regexp_count):
    zero Python cost, whole-stage-codegen'd, scales as a map-only pass
    with no shuffle."""
    scrubbed = F.col(text_col)
    for _name, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _repl in PII_PATTERNS
    ]
    out = df.select(
        F.col(id_col),
        scrubbed.alias("scrubbed"),
        *counts,
    )
    total = sum((F.col(f"n_{name}") for name, _p, _r in PII_PATTERNS), F.lit(0))
    return out.withColumn("n_pii", total.cast("long"))


def scrub_pii_oracle_sql(text_expr: str) -> str:
    """The DuckDB twin of :func:`scrub_pii` for a given text
    expression: nested regexp_replace with the 'g' flag (Spark
    replaces all occurrences by default) and regexp_extract_all
    lengths for the counts."""
    scrubbed = text_expr
    for _name, pat, repl in PII_PATTERNS:
        escaped = pat.replace("'", "''")
        scrubbed = f"regexp_replace({scrubbed}, '{escaped}', '{repl}', 'g')"
    counts = ", ".join(
        f"len(regexp_extract_all({text_expr}, '{pat}')) AS n_{name}"
        for name, pat, _repl in PII_PATTERNS
    )
    total = " + ".join(
        f"len(regexp_extract_all({text_expr}, '{pat}'))"
        for name, pat, _repl in PII_PATTERNS
    )
    return (
        f"{scrubbed} AS scrubbed, {counts}, CAST({total} AS BIGINT) AS n_pii"
    )


def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    top: int = 100,
) -> DataFrame:
    """Top collocations by pointwise mutual information over ADJACENT
    token pairs — the classic phrase-mining signal (Church & Hanks
    1990): PMI(a,b) = ln( p(a,b) / (p(a) p(b)) ) with p(a,b) over
    bigram occurrences and p(·) over unigram occurrences. Returns
    (tok_a, tok_b, n_pair, n_a, n_b, pmi6) — the ``top`` pairs with
    n_pair >= min_count, ordered (pmi6 DESC, tok_a, tok_b), a total
    order because pmi6 is pre-rounded.

    Cross-engine exactness: counts are integers; the score is a FIXED
    expression tree of engine ln's over exactly-representable integer
    inputs (each product kept under 2^53 by splitting into six log
    terms), rounded to 6 — the DSIR/unigram_logprob discipline.

    Scale shape: one tokenize pass feeds both the unigram and bigram
    counts (two keyed shuffles with map-side partial aggregation,
    output vocab- and vocab^2-bounded); the corpus totals are two
    single-row aggregates; the unigram relation joins back BROADCAST
    (Heaps-law-small, the unigram_logprob precedent); the final top-k
    is a TakeOrdered over the already-aggregated pair relation."""
    t = tokens(F.col(text_col))
    staged = df.select(F.when(F.size(t) >= 0, t).alias("t")).persist()
    try:
        uni = (
            staged.select(F.explode("t").alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
        ).persist()
        pairs = F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.struct(
                F.element_at(F.col("t"), i).alias("a"),
                F.element_at(F.col("t"), i + F.lit(1)).alias("b"),
            ),
        )
        big = (
            staged.filter(F.size("t") >= 2)
            .select(F.explode(pairs).alias("p"))
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_pair"))
        )
        n_u = int(uni.agg(F.sum("c")).collect()[0][0] or 0)
        n_b = int(big.agg(F.sum("n_pair")).collect()[0][0] or 0)
        if n_u == 0 or n_b == 0:
            return big.select(
                F.col("a").alias("tok_a"), F.col("b").alias("tok_b"),
                "n_pair", F.lit(0).alias("n_a"), F.lit(0).alias("n_b"),
                F.lit(0.0).alias("pmi6"),
            ).limit(0)
        ua = F.broadcast(uni.select(F.col("w").alias("a"), F.col("c").alias("n_a")))
        ub = F.broadcast(uni.select(F.col("w").alias("b"), F.col("c").alias("n_b")))
        # six-term log form, every argument an exactly-representable
        # int64 < 2^53; SAME left-to-right tree as the SQL oracle
        pmi = F.round(
            F.log(F.col("n_pair").cast("double"))
            + F.log(F.lit(float(n_u)))
            + F.log(F.lit(float(n_u)))
            - F.log(F.lit(float(n_b)))
            - F.log(F.col("n_a").cast("double"))
            - F.log(F.col("n_b").cast("double")),
            6,
        ) + F.lit(0.0)
        out = (
            big.filter(F.col("n_pair") >= min_count)
            .join(ua, "a")
            .join(ub, "b")
            .select(
                F.col("a").alias("tok_a"),
                F.col("b").alias("tok_b"),
                "n_pair",
                "n_a",
                "n_b",
                pmi.alias("pmi6"),
            )
            .orderBy(F.col("pmi6").desc(), "tok_a", "tok_b")
            .limit(top)
        )
        out = out.localCheckpoint(eager=True)  # sever from the persisted lineage
        return out
    finally:
        staged.unpersist()
        try:
            uni.unpersist()
        except NameError:  # n_u path failed before uni existed
            pass


def _xlnx(k) -> Column:
    """k * ln(k) with the 0*ln(0) = 0 convention, k an int64-valued
    Column — the entropy-term building block for log-likelihood
    statistics. Exactly mirrored in SQL as
    ``CASE WHEN k = 0 THEN 0 ELSE k * LN(CAST(k AS DOUBLE)) END``."""
    kk = k.cast("double")
    return F.when(k == 0, F.lit(0.0)).otherwise(kk * F.log(kk))


def llr_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    top: int = 100,
) -> DataFrame:
    """Top collocations by Dunning's log-likelihood ratio (G^2, Dunning
    1993) over ADJACENT token pairs — the phrase-mining test that,
    unlike PMI, does not explode on rare pairs (PMI is maximal for two
    hapaxes that co-occur once; G^2 weights by evidence mass, which is
    why it's the collocation default in practice). The 2x2 table is
    over BIGRAM events: k11 = count(a b), row total c1 = count(a *),
    column total c2 = count(* b), N = all bigrams, and

        G^2 = 2 * [ sum xlnx(k_ij) - xlnx(c1) - xlnx(N-c1)
                    - xlnx(c2) - xlnx(N-c2) + xlnx(N) ]

    (the entropy identity; zero cells contribute 0). Returns (tok_a,
    tok_b, n_pair, llr6) — ``top`` pairs with n_pair >= min_count,
    ordered (llr6 DESC, tok_a, tok_b), a total order via pre-round.

    Cross-engine exactness: every xlnx argument is an exact int64
    < 2^53 and the expression tree is written in the same order in
    the SQL oracle — the pmi_collocations discipline.

    Scale shape: one tokenize pass -> one bigram-keyed count shuffle;
    the row/column marginals are vocab-sized re-aggregations of the
    pair relation joined back BROADCAST; N is a single-row aggregate;
    the final top-k is a TakeOrdered."""
    t = tokens(F.col(text_col))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.struct(
            F.element_at(F.col("t"), i).alias("a"),
            F.element_at(F.col("t"), i + F.lit(1)).alias("b"),
        ),
    )
    big = (
        df.select(F.when(F.size(t) >= 0, t).alias("t"))
        .filter(F.size("t") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .persist()
    )
    try:
        n_total = int(big.agg(F.sum("n_pair")).collect()[0][0] or 0)
        if n_total == 0:
            return big.select(
                F.col("a").alias("tok_a"), F.col("b").alias("tok_b"),
                "n_pair", F.lit(0.0).alias("llr6"),
            ).limit(0)
        fa = F.broadcast(
            big.groupBy("a").agg(F.sum("n_pair").alias("c1"))
        )
        fb = F.broadcast(
            big.groupBy("b").agg(F.sum("n_pair").alias("c2"))
        )
        n = F.lit(n_total)
        k11 = F.col("n_pair")
        k12 = F.col("c1") - k11
        k21 = F.col("c2") - k11
        k22 = n - F.col("c1") - F.col("c2") + k11
        llr = F.round(
            2.0
            * (
                _xlnx(k11) + _xlnx(k12) + _xlnx(k21) + _xlnx(k22)
                - _xlnx(F.col("c1")) - _xlnx(n - F.col("c1"))
                - _xlnx(F.col("c2")) - _xlnx(n - F.col("c2"))
                + _xlnx(n)
            ),
            6,
        ) + F.lit(0.0)
        out = (
            big.filter(F.col("n_pair") >= min_count)
            .join(fa, "a")
            .join(fb, "b")
            .select(
                F.col("a").alias("tok_a"),
                F.col("b").alias("tok_b"),
                "n_pair",
                llr.alias("llr6"),
            )
            .orderBy(F.col("llr6").desc(), "tok_a", "tok_b")
            .limit(top)
        )
        return out.localCheckpoint(eager=True)  # sever persisted lineage
    finally:
        big.unpersist()


def bigram_interp_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lam_bi: float = 0.7,
    lam_uni: float = 0.3,
) -> DataFrame:
    """Interpolated bigram language-model score per document — one
    rung up from :func:`unigram_logprob` toward the KenLM perplexity
    filter: for each in-document transition (w_prev -> w),

        lp = ln( lam_bi * c(prev,w)/c_left(prev) + lam_uni * c(w)/N )

    with c_left(prev) = Σ_b c(prev,b) (bigram-left mass, a closed
    probability universe) and N the corpus token total. Returns
    (id, n_transitions, avg_logprob); docs with < 2 tokens drop.
    Fluent text scores high, garbled or boilerplate-stitched text sits
    in the tails. ``lam_bi``/``lam_uni`` are independent literals (NOT
    derived as 1-λ, which would bake float noise into the score).

    Scale shape: unigram and bigram-left relations are vocab-bounded
    and BROADCAST; the bigram-count relation is vocab²-bounded, so its
    join-back runs as a plain shuffle join on (prev, w) — the one wide
    exchange besides the per-doc aggregate.

    Exactness one notch past unigram_logprob's round-then-AVG: each
    term is scaled to an INTEGER micro-log (ROUND(lp*1e6)), summed
    exactly, and divided once at the end — AVG over rounded doubles
    can still land a mean on a 1e-4 boundary where engines' sum orders
    disagree (observed on 1 doc in 500); integer sums cannot."""
    from pyspark.sql.window import Window

    t = tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col).alias("id"), F.when(F.size(t) >= 0, t).alias("t")
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.struct(
            F.element_at(F.col("t"), i).alias("a"),
            F.element_at(F.col("t"), i + F.lit(1)).alias("b"),
        ),
    )
    tr = (
        staged.filter(F.size("t") >= 2)
        .select("id", F.explode(pairs).alias("p"))
        .select("id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    bc = tr.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    la = bc.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    uni = (
        staged.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .select("w", "c", F.sum("c").over(Window.partitionBy()).alias("n"))
    )
    lp_micro = F.round(
        F.log(
            F.lit(lam_bi) * (F.col("c_ab").cast("double") / F.col("c_a"))
            + F.lit(lam_uni) * (F.col("c").cast("double") / F.col("n"))
        )
        * F.lit(1000000.0),
        0,
    ).cast("long")
    return (
        tr.join(bc, ["a", "b"])
        .join(F.broadcast(la), "a")
        .join(F.broadcast(uni), tr["b"] == uni["w"])
        .select("id", lp_micro.alias("lp"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum("lp").alias("_slp"),
        )
        .select(
            "id",
            "n_transitions",
            (
                F.round(
                    F.col("_slp").cast("double")
                    / F.col("n_transitions")
                    / F.lit(1000000.0),
                    4,
                )
                + F.lit(0.0)
            ).alias("avg_logprob"),
        )
    )


def bpe_merge_candidates(
    df: DataFrame, text_col: str, top_n: int = 30
) -> DataFrame:
    """First iteration of BPE tokenizer training: the corpus-weighted
    counts of adjacent CHARACTER pairs inside words, ranked — the pair
    a BPE trainer would merge first. Returns
    (pair, weighted_count, rank) for the top ``top_n`` (count desc,
    pair asc — total order, engine-independent).

    Scale shape (the classic BPE-on-vocab trick): pairs are counted
    over the DISTINCT-word vocabulary weighted by word frequency, not
    over raw text — Heaps' law makes the vocab ~sqrt(corpus), so the
    expensive character-pair explode runs on the small relation. Two
    shuffles total (word counts, then pair counts), both with map-side
    partial aggregation; the final rank window runs unpartitioned over
    the AGGREGATED pair relation, which is bounded by charset^2 rows
    regardless of corpus size. All built-in expressions, no UDF."""
    from pyspark.sql.window import Window

    from lakeapi_spark.operators.scale import TEXT_TASK_BYTES, fan_out

    words = (
        fan_out(df.select(text_col), per_partition_bytes=TEXT_TASK_BYTES)
        .select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # sequence(1, length-1) needs the >=2-char guard: Spark's sequence
    # STEPS DOWNWARD for start > stop, so a 1-char word would yield
    # [1, 0] instead of the empty window list.
    pairs = F.when(
        F.length("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("w") - 1),
            lambda i: F.concat(
                F.col("w").substr(i, F.lit(1)),
                F.lit(" "),
                F.col("w").substr(i + F.lit(1), F.lit(1)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counted = (
        words.select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("weighted_count"))
    )
    from lakeapi_spark.operators.pipeline import ranked_topk

    return ranked_topk(
        counted, [F.col("weighted_count").desc(), F.col("pair")], k=top_n
    ).select("pair", "weighted_count", "rank")


def oov_rate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 1000,
    cache_handles: list | None = None,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-
    ``vocab_size`` token vocabulary — the tokenizer-coverage check run
    before committing to a vocab: (id, n_tokens, n_oov, oov_frac) with
    oov_frac an exact integer-ratio double.

    Two corpus passes by construction (the vocab must exist before
    docs are scored against it): pass 1 aggregates token counts
    (Heaps-small relation) and takes the top-K; pass 2 probes each
    doc's tokens against the K-row vocab via BROADCAST left join and
    partial-aggregates per doc. The vocab relation is persisted so the
    scoring pass does not recompute pass 1; the rank window runs over
    the aggregated vocab relation, never raw tokens."""
    from pyspark.sql.window import Window

    from lakeapi_spark.operators.scale import TEXT_TASK_BYTES, fan_out

    base = fan_out(df.select(id_col, text_col), per_partition_bytes=TEXT_TASK_BYTES)
    toks = base.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    from lakeapi_spark.operators.pipeline import ranked_topk

    vocab = (
        ranked_topk(
            toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")),
            [F.col("n").desc(), F.col("token")],
            k=vocab_size,
            rank_col="rnk",
        )
        .select("token", F.lit(1).alias("in_vocab"))
        .persist()
    )
    # same release contract as dedup's shingle relation: long-lived
    # sessions pass cache_handles and unpersist after their action
    if cache_handles is not None:
        cache_handles.append(vocab)
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias("oov_frac"),
        )
    )


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_frac_num: int = 3,
    max_frac_den: int = 10,
    delim: str = "\n",
) -> DataFrame:
    """CCNet-style boilerplate removal: a LINE (a ``delim``-separated
    segment; ``delim`` is a Java regex) is boilerplate when it occurs
    in MORE than num/den of all docs — nav bars, cookie banners, and
    license footers repeat across a crawl while real prose does not
    (Wenzek et al., CCNet, LREC 2020 — paragraph-level dedup by
    frequency). The threshold is rational so the keep test is
    integer-exact in any engine. Returns (id, n_lines, n_kept,
    kept_text) with kept lines rejoined in original order; docs whose
    every line is empty (or with null text) are absent.

    Scale shape: the line-frequency dictionary is ONE distinct + ONE
    groupBy shuffle over (line, doc) pairs; the corpus size rides the
    line-keyed exchanges, never the driver (doc count is a broadcast
    1-row aggregate). The rebuild groupBy partitions by doc id. A
    mega-hot line (the same cookie banner in 10^9 docs) is bounded by
    the distinct's map-side partial aggregation; AQE splits residual
    skew in the frequency join."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), delim)).alias("pos", "line"),
    ).filter(F.trim(F.col("line")) != "")
    ndocs = F.broadcast(df.agg(F.count(F.lit(1)).alias("n_docs")))
    dfreq = (
        lines.select("line", "id")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("docs_with"))
    )
    flagged = (
        lines.join(dfreq, "line")
        .crossJoin(ndocs)
        .withColumn(
            "keep",
            F.col("docs_with") * max_frac_den <= max_frac_num * F.col("n_docs"),
        )
    )
    return flagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct(F.col("pos"), F.col("line")))
                    )
                ),
                lambda s: s["line"],
            ),
            delim,
        ).alias("kept_text"),
    )


def feature_hash_counts(
    df: DataFrame, id_col: str, text_col: str, dim: int = 1024
) -> DataFrame:
    """Hashing-trick bag-of-words: every token OCCURRENCE maps to a
    fixed ``dim``-bucket index via the portable 60-bit md5 hash
    (operators/sampling.key_hash — DuckDB re-derives every index), and
    the per-doc bucket counts are the sparse feature vector rows
    (id, idx, cnt). This is the unbounded-vocabulary featurizer: no
    vocabulary table, no fit pass, no driver state — the property that
    matters at 100 TB where the vocab itself would be a large
    distributed relation (cf. vocab_top_tokens for the fitted twin).

    One explode + one partial-agg shuffle on (id, idx); empty docs have
    no tokens and produce no rows. ``fan_out`` first (guide §2.5 input
    parallelism): the per-occurrence portable md5 is the whole cost of
    this operator, and a narrow single-file scan would otherwise hash
    the entire corpus in one task (r13, measured 1.76 s -> the md5
    stage spread across cores)."""
    from lakeapi_spark.operators.sampling import key_hash
    from lakeapi_spark.operators.scale import TEXT_TASK_BYTES, fan_out

    toks = fan_out(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
        per_partition_bytes=TEXT_TASK_BYTES,
    ).select("id", F.explode(tokens(F.col("__t"))).alias("tok"))
    return (
        toks.select("id", (key_hash(F.col("tok")) % dim).alias("idx"))
        .groupBy("id", "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def readability_scores(
    df: DataFrame, id_col: str, text_col: str, digits: int = 4
) -> DataFrame:
    """Flesch Reading Ease per document from three regex counts —
    words (whitespace tokens), sentences (runs of [.!?], floored at
    1), syllables (vowel-group runs [aeiouy]+ over lowercased text, the
    standard cheap proxy):

        206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)

    Every count is an integer from a dialect-neutral regex (literal
    classes only — Java and RE2/DuckDB agree), and the score is one
    fixed IEEE expression over their ratios, so a SQL oracle re-derives
    it exactly. Pure map-side expressions, no shuffle, no UDF; docs
    with no tokens drop (nothing to score). Returns
    (id, n_words, n_sentences, n_syllables, flesch)."""
    t = tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_txt"),
        F.when(F.size(t) >= 0, t).alias("_t"),
    ).filter(F.size("_t") > 0)
    n_words = F.size("_t").cast("long")
    n_sentences = F.greatest(
        F.regexp_count(F.col("_txt"), F.lit(r"[.!?]+")).cast("long"), F.lit(1)
    )
    n_syllables = F.regexp_count(F.lower(F.col("_txt")), F.lit(r"[aeiouy]+")).cast(
        "long"
    )
    counted = staged.select(
        "id",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        - F.lit(84.6)
        * (F.col("n_syllables").cast("double") / F.col("n_words").cast("double"))
    )
    return counted.select(
        "id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.round(flesch, digits) + 0.0).alias("flesch"),
    )
