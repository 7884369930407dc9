"""Partitioned-copy builder for the pruning operators (§2.12).

The driver testdata ships as single parquet files; the reference's
pruning trick only shows on *partitioned* storage (its fixtures write
delta tables partitioned by `cars_md5_prefix_2` etc.,
tests/create_test_data.py:221-255). This module materializes
hive-partitioned copies under ``.cache/`` once per (sf_dir, spec) so
the pruning queries read a realistically-laid-out table.

At production scale this is the write-side of the engine: you store
the table partitioned by the derived hash column so point lookups on
the logical column touch one partition out of N.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from lakeapi_spark.operators.partitioning import with_derived_partition_col

CACHE_ROOT = os.environ.get(
    "SPARK_GRAFT_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".cache")
)


def partitioned_copy(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    partition_by: list[str],
    derive: tuple[str, str, int] | None = None,
) -> DataFrame:
    """Read ``{sf_dir}/{name}.parquet``, optionally add a derived partition
    column (base, kind, n), write partitioned once, and return a reader
    over the partitioned copy."""
    tag = "_".join(partition_by)
    dest = os.path.join(
        CACHE_ROOT, "partitioned", os.path.basename(os.path.normpath(sf_dir)), f"{name}_by_{tag}"
    )
    marker = os.path.join(dest, "_SUCCESS")
    if not os.path.exists(marker):
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if derive is not None:
            df = with_derived_partition_col(df, *derive)
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(dest)
    return spark.read.parquet(dest)
