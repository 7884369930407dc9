"""Table loading for the driver testdata + decimal-exact agg helpers.

The correctness gate compares Spark results against a DuckDB oracle via
an order-insensitive value hash — so every aggregate we emit must be
bit-identical across engines. Floating sums are NOT (partial-agg order
differs), so all money/quantity sums go through DECIMAL (exact,
associative) and are rounded + cast back to double at the end. AVGs stay
double but round(4) (error ~1e-10 at these magnitudes — safe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views (the Spark analogue of
    the reference's startup route registration, core/route.py:16-142)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def dec(col: Column | str, scale: int = 4) -> Column:
    """Cast to exact decimal before summing. Precision 18 keeps
    decimal*decimal products inside 38 digits with identical
    precision/scale rules in Spark and DuckDB (both cap at 38)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def money_sum(expr: Column, out_scale: int = 2) -> Column:
    """SUM in decimal -> round -> double: deterministic across engines."""
    return F.round(F.sum(expr), out_scale).cast("double")
