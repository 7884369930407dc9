"""Table loading for the driver testdata + decimal-exact agg helpers.

The correctness gate compares Spark results against a DuckDB oracle via
an order-insensitive value hash — so every aggregate we emit must be
bit-identical across engines. Floating sums are NOT (partial-agg order
differs), so all money/quantity sums go through DECIMAL (exact,
associative) and are rounded + cast back to double at the end. AVGs stay
double but round(4) (error ~1e-10 at these magnitudes — safe).
"""

from __future__ import annotations

import os

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
    All are runtime-settable SQL confs. Asserted ONCE per session
    (flag on the session object, like the table memo): each conf.set is
    a ~2-3 ms py4j round-trip and ``table()`` runs ~150 times per bench
    pass — the confs are idempotent and nothing in the serving/bench
    paths unsets them mid-session.
    """
    if getattr(spark, "_lakeapi_confs_set", False):
        return
    ok = True
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.sources.partitionColumnTypeInference.enabled", "false"),
    ):
        try:
            spark.conf.set(k, v)
            if spark.conf.get(k) != v:
                ok = False
        except Exception:  # immutable on some builds — best effort
            ok = False
    # latch ONLY after every conf verifiably holds (ADVICE r13): a
    # session where any set failed keeps re-asserting per call, so the
    # old self-healing behavior is preserved for the broken-session
    # case while the healthy path pays the ~6 ms only once
    if ok:
        spark._lakeapi_confs_set = True


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan DataFrame for a testdata table, MEMOIZED per session
    and file version.

    ``spark.read.parquet`` re-reads the footer to infer the schema on
    every call — measured 80-95 ms per call on local[32], and the
    bench queries call ``table()`` ~150 times per pass, so the handles
    were costing more driver time than several queries' entire
    execution. The memo holds only the LAZY plan handle (the
    reference's register-routes-once shape, core/route.py): no data is
    cached — every action still scans the parquet file — and the key
    carries the file's (mtime, size) so a rewritten table gets a fresh
    scan with the new schema. The memo dict lives ON the session
    object, so a new session never sees a dead session's plans."""
    ensure_session_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    key = None
    try:
        st = os.stat(path)
        key = (sf_dir, name, st.st_mtime_ns, st.st_size)
    except OSError:
        pass  # odd path (dir listing race): fall through unmemoized
    memo = getattr(spark, "_lakeapi_table_memo", None)
    if memo is None:
        memo = {}
        spark._lakeapi_table_memo = memo
    if key is not None and key in memo:
        return memo[key]
    df = spark.read.parquet(path)
    # ns-timestamp columns surface as long under nanosAsLong: convert to
    # a real timestamp (µs truncation; `div` keeps 64-bit precision —
    # float division would corrupt ~1.7e18 nano epochs)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if key is not None:
        memo[key] = df
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
