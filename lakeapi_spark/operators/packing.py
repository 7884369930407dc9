"""Sequence packing for pretraining pipelines.

The last step before a training run: concatenate documents into
fixed-length token sequences ("context windows") so no compute is
wasted on padding. The assignment — which sequence a document lands
in, at what offset — must be a deterministic function of the corpus
so that re-running after a repartition, an append, or on a different
engine reproduces the same batches.

The naive spelling is a GLOBAL running token count, which is a
single-partition window — one task sees every document, a
non-starter at 100 TB. Instead documents are sharded by a stable
key hash ([[operators/sampling.key_hash]] — pure function of doc id,
identical across engines) and packed independently within each
shard: the cumulative sum is a window PARTITIONED BY shard, so the
work distributes across `n_shards` tasks, and each shard emits an
independent stream of packed sequences (seq ids are (shard,
seq_index) pairs — training jobs consume shards in parallel anyway).
One shuffle total; packing density is unaffected by the shard count
because every shard packs greedily in stable doc-id order.

Documents longer than ``seq_len`` spill across sequence boundaries
(offset + n_tokens > seq_len), exactly like the causal-LM packing
convention where a document may straddle windows; the summary view
reports per-sequence fill to make truncation policies auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakeapi_spark.operators.sampling import key_hash
from lakeapi_spark.operators.text import token_count


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document a (shard, seq_index, seq_offset) packing
    position: documents are laid end-to-end in stable id order within
    their hash shard, and ``seq_index``/``seq_offset`` locate the
    document's first token in the shard's stream of ``seq_len``-token
    windows. Pure built-in expressions + one shard-partitioned window
    — no UDF, one shuffle."""
    t = df.select(
        F.col(id_col).alias("id"),
        (key_hash(F.col(id_col)) % n_shards).alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return c.select(
        "id",
        "shard",
        "n_tokens",
        # `div` = exact integer division on longs (a double-divide +
        # cast could truncate wrong near representation boundaries)
        F.expr(f"cum_before div {int(seq_len)}").alias("seq_index"),
        (F.col("cum_before") % seq_len).alias("seq_offset"),
    )


def packing_summary(packed: DataFrame, seq_len: int = 512) -> DataFrame:
    """Per-(shard, seq_index) fill accounting over a `pack_sequences`
    result: how many documents START in each window and how many of
    its tokens they contribute (capped at the window, so a straddling
    document counts only its in-window prefix). The training-side
    dataloader uses this to size batches; the auditor uses it to see
    padding waste. One small groupBy on (shard, seq_index)."""
    in_window = F.least(
        F.col("n_tokens"), F.lit(seq_len) - F.col("seq_offset")
    )
    return (
        packed.groupBy("shard", "seq_index")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(in_window).alias("tokens_started"),
        )
    )
