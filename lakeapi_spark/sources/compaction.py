"""Small-file compaction (write-side storage management).

At 100 TB the dominant storage failure mode is not size but file
COUNT: streaming ingests and over-parallel writers leave millions of
KB-scale files, and every query pays per-file open/footer costs (plus
driver memory for the file listing). The reference never needs this —
it serves single files — but a Spark lakehouse engine does: this is
the batch analogue of Delta's OPTIMIZE.

Policy: size-based target. We read the source's total bytes from the
filesystem (parquet metadata would under-count post-decompression, but
compaction targets on-disk size), divide by the target file size, and
rewrite with exactly that many output tasks. Round-robin repartition
gives near-equal output files; with ``partition_by`` the repartition is
hash-on-partition-columns so each hive partition is written by few
tasks instead of every task writing to every partition (the classic
small-file explosion: tasks x partitions output files).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith("_") and not f.startswith("."):
                total += os.path.getsize(os.path.join(root, f))
    if os.path.isfile(path):
        total = os.path.getsize(path)
    return total


def plan_n_files(total_bytes: int, target_file_bytes: int = DEFAULT_TARGET_BYTES) -> int:
    """ceil(total/target), minimum 1 — pure and unit-testable."""
    return max(1, math.ceil(total_bytes / max(1, target_file_bytes)))


def compact(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_bytes: int = DEFAULT_TARGET_BYTES,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite ``src`` (parquet file/dir) into ``dest`` with ~target-size
    files. Returns the planned output file count.

    Plain tables: round-robin repartition(n) -> n near-equal files, one
    shuffle whose payload is the data being rewritten anyway.
    Partitioned tables: repartition on the partition columns so writers
    don't fan out across every partition; n still bounds total tasks.
    """
    df = spark.read.parquet(src)
    n = plan_n_files(dir_bytes(src), target_file_bytes)
    if partition_by:
        out = df.repartition(n, *partition_by)
        out.write.mode("overwrite").partitionBy(*partition_by).parquet(dest)
    else:
        out = df.repartition(n)
        out.write.mode("overwrite").parquet(dest)
    return n


def data_files(path: str) -> list[str]:
    """Non-hidden data files under a table dir (for tests/inspection)."""
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith("_") and not f.startswith("."):
                out.append(os.path.join(root, f))
    return sorted(out)
