"""Scale/parallelism helpers shared by expression-heavy operators.

Spark sizes scan tasks by bytes (spark.sql.files.maxPartitionBytes), which
is right for IO-bound plans but wrong for CPU-bound derivations: a 600 KiB
documents file is one task, so tokenize/shingle/hash pipelines would run on
one core no matter how many executors exist. At 100 TB the file count makes
this moot; at any scale, the guard below is a no-op once the scan already
has enough splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions
    than the session's default parallelism. Narrow inputs (small files,
    coalesced shuffles) get spread across cores before CPU-heavy
    expression stages; already-parallel inputs pass through untouched —
    no shuffle is added on a real cluster reading many files."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
