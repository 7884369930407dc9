"""Bucketed table layouts — pre-shuffled storage for co-located joins.

The reference's md5-mod partitioning (core/datasource.py:329-342) is a
poor man's bucketing: rows are routed to a fixed number of hash
buckets at WRITE time so point lookups prune. Spark's native bucketing
generalizes this to JOINS and AGGREGATIONS: two tables bucketed by the
same key into the same bucket count are already partitioned the way a
shuffle would partition them, so the exchange disappears from the
plan entirely. At 100 TB the fact-fact join (orders x lineitem) is THE
dominant shuffle; landing both bucketed by orderkey turns every
downstream join/groupBy on that key into a zero-shuffle (and with
sorted buckets, zero-sort) merge.

Trade-offs, stated: bucket count is fixed at write time (pick for the
TARGET scale — at 100 TB thousands of buckets; AQE cannot re-split a
skewed bucket, so bucket keys should be high-cardinality); writes pay
one shuffle to route rows; small-file pressure multiplies by the
bucket count (compose with sources/compaction.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sorted_buckets: bool = True,
) -> None:
    """Materialize ``df`` as a bucketed (optionally sorted) parquet
    table in the session catalog. ``path`` makes it an external table
    (tests point this at a tmp dir)."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sorted_buckets:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — bucketing metadata only survives spark.table();
    reading the parquet path directly degrades to a plain scan."""
    return spark.table(name)
