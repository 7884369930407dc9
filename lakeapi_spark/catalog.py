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


def ensure_session_confs(spark: SparkSession) -> None:
    """Determinism confs that must hold even on a caller-provided session
    (the driver passes its own SparkSession to the query builders):

    - UTC session tz: timestamp->date casts must match the (naive)
      DuckDB oracle regardless of host timezone;
    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS) which the
      vectorized reader rejects (SURVEY §7 risk 3) — read as long and
      convert below;
    - partition values stay strings (md5-derived partition dirs like
      '12' must not be inferred as ints).
    All are runtime-settable SQL confs.
    """
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.sources.partitionColumnTypeInference.enabled", "false"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # immutable on some builds — best effort
            pass


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # ns-timestamp columns surface as long under nanosAsLong: convert to
    # a real timestamp (µs truncation; `div` keeps 64-bit precision —
    # float division would corrupt ~1.7e18 nano epochs)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


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
