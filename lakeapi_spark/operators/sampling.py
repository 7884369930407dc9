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
    df: DataFrame, key_col: str, group_col: str, quota: int
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
    groups courser than executors parallelize by the exchange;
    a pathological mega-group ranks within one task, so at 100 TB cap
    extreme groups with a rate filter first (hash % m < k) and quota
    only the survivors."""
    if quota <= 0:
        raise ValueError(f"quota must be positive: {quota}")
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
