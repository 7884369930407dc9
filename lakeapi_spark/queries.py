"""The verified query catalog.

Every implemented operator from SURVEY.md §2 (plus the training-data
extensions) registers here as a named query: a Spark builder
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, a DuckDB
oracle SQL string producing the identical result (same column names —
the driver sorts columns by name and hashes values).

Determinism rules (so the order-insensitive value hash matches):
- float SUMs go through DECIMAL (see catalog.dec/money_sum);
- AVGs round(4); distances/cosines round to a safe digit count;
- every LIMIT/top-k has a unique total order (tiebreak on a key);
- timestamps are cast to DATE or epoch seconds in outputs (Spark
  returns tz-aware Arrow timestamps, DuckDB naive — avoid the clash).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakeapi_spark.catalog import dec, money_sum, table
from lakeapi_spark.operators.pipeline import QueryRequest, apply_query, topk
from lakeapi_spark.operators.search import search
from lakeapi_spark.operators.nearby import nearby


@dataclass
class Query:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the pre-registered views, or None
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None, bench: bool = False):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(build=fn, oracle=oracle, bench=bench)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship joins/aggregations (exercised through spark.sql-equivalent
# DataFrame plans; §2.4/2.5 are inherited Spark operators — these prove
# the engine surface at TPC-H-like shapes)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
           CAST(ROUND(AVG(l_quantity), 4) AS DOUBLE) AS avg_qty,
           CAST(ROUND(AVG(l_extendedprice), 4) AS DOUBLE) AS avg_price,
           CAST(ROUND(AVG(l_discount), 4) AS DOUBLE) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,4)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(dec("l_quantity")).alias("sum_qty"),
            money_sum(dec("l_extendedprice")).alias("sum_base_price"),
            money_sum(dec("l_extendedprice") * (one - dec("l_discount"))).alias("sum_disc_price"),
            money_sum(
                dec("l_extendedprice") * (one - dec("l_discount")) * (one + dec("l_tax"))
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q6_revenue_forecast",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
    bench=True,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(dec("l_extendedprice") * dec("l_discount")).alias("revenue"))
    )


@register(
    "q3_shipping_priority",
    """
    SELECT o.o_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15' AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) DESC, o.o_orderkey
    LIMIT 10
    """,
    bench=True,
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(18,4)")
    rev = F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(rev.alias("__rev_exact"))
        .orderBy(F.col("__rev_exact").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.round("__rev_exact", 2).cast("double").alias("revenue"),
            "orderdate",
            "o_orderpriority",
        )
    )


@register(
    "q5_revenue_by_nation",
    """
    SELECT n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    bench=True,
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,4)")
    # region/nation/supplier are tiny — broadcast them so the only big
    # shuffle is orders|x|lineitem (AQE handles the rest at scale).
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(dec("l_extendedprice") * (one - dec("l_discount"))).alias("revenue"))
    )


@register(
    "rollup_region_nation",
    """
    SELECT COALESCE(r.r_name, '<all>') AS region_name,
           COALESCE(n.n_name, '<all>') AS nation_name,
           COUNT(c.c_custkey) AS n_customers,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            money_sum(dec("c_acctbal")).alias("total_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region_name"),
            F.coalesce("n_name", F.lit("<all>")).alias("nation_name"),
            "n_customers",
            "total_acctbal",
        )
    )


@register(
    "window_top_orders_per_segment",
    """
    SELECT * FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# Filter algebra (§2.3) — each operator exercised through the actual
# compiled pipeline (QueryRequest -> apply_query), not ad-hoc DataFrame
# code, so the oracle verifies the compiler itself.
# ---------------------------------------------------------------------------


def _pipeline_query(name: str, oracle: str, tbl: str, req: QueryRequest, prep=None, bench=False):
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = table(spark, sf_dir, tbl)
        if prep is not None:
            df = prep(df)
        return apply_query(df, req)

    QUERIES[name] = Query(build=build, oracle=oracle, bench=bench)


_pipeline_query(
    "filter_eq",
    "SELECT p_partkey, p_name, p_brand, p_size FROM part WHERE p_brand = 'Brand#13'",
    "part",
    QueryRequest(
        filters=[("p_brand", "=", "Brand#13")],
        select=[("p_partkey", None), ("p_name", None), ("p_brand", None), ("p_size", None)],
    ),
)

_pipeline_query(
    "filter_ne",
    "SELECT n_nationkey, n_name FROM nation WHERE n_name <> 'NATION_7'",
    "nation",
    QueryRequest(filters=[("n_name", "<>", "NATION_7")], select=[("n_nationkey", None), ("n_name", None)]),
)

_pipeline_query(
    "filter_lt_gte",
    "SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem WHERE l_quantity < 5 AND l_discount >= 0.08",
    "lineitem",
    QueryRequest(
        filters=[("l_quantity", "<", 5), ("l_discount", ">=", 0.08)],
        select=[("l_orderkey", None), ("l_linenumber", None), ("l_quantity", None), ("l_discount", None)],
    ),
)

_pipeline_query(
    "filter_gt_lte",
    "SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9900.0 AND c_custkey <= 1200",
    "customer",
    QueryRequest(
        filters=[("c_acctbal", ">", 9900.0), ("c_custkey", "<=", 1200)],
        select=[("c_custkey", None), ("c_acctbal", None)],
    ),
)

_pipeline_query(
    "filter_in",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_name IN ('NATION_1','NATION_3','NATION_19')",
    "nation",
    QueryRequest(filters=[("n_name", "in", ["NATION_1", "NATION_3", "NATION_19"])]),
)

_pipeline_query(
    "filter_not_in",
    "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus NOT IN ('O','P')",
    "orders",
    QueryRequest(
        filters=[("o_orderstatus", "not in", ["O", "P"])],
        select=[("o_orderkey", None), ("o_orderstatus", None)],
    ),
)

_pipeline_query(
    "filter_between",
    "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice BETWEEN 100000.0 AND 101000.0",
    "orders",
    QueryRequest(
        filters=[("o_totalprice", "between", [100000.0, 101000.0])],
        select=[("o_orderkey", None), ("o_totalprice", None)],
    ),
)

_pipeline_query(
    "filter_not_between",
    "SELECT p_partkey, p_size FROM part WHERE p_size NOT BETWEEN 5 AND 45",
    "part",
    QueryRequest(
        filters=[("p_size", "not between", [5, 45])],
        select=[("p_partkey", None), ("p_size", None)],
    ),
)

_pipeline_query(
    "filter_contains",
    "SELECT p_partkey, p_name, p_type FROM part WHERE p_type LIKE '%ONO%'",
    "part",
    QueryRequest(
        filters=[("p_type", "contains", "ONO")],
        select=[("p_partkey", None), ("p_name", None), ("p_type", None)],
    ),
)

_pipeline_query(
    "filter_not_contains",
    "SELECT p_partkey, p_type FROM part WHERE p_type NOT LIKE '%STANDARD%'",
    "part",
    QueryRequest(
        filters=[("p_type", "not contains", "STANDARD")],
        select=[("p_partkey", None), ("p_type", None)],
    ),
)

_pipeline_query(
    "filter_startswith",
    "SELECT c_custkey, c_name FROM customer WHERE c_name LIKE 'Customer#00000012%'",
    "customer",
    QueryRequest(
        filters=[("c_name", "startswith", "Customer#00000012")],
        select=[("c_custkey", None), ("c_name", None)],
    ),
)

_pipeline_query(
    "filter_has",
    """
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE list_contains(string_split(text, ' '), 'spark')
    """,
    "documents",
    QueryRequest(
        filters=[("words", "has", "spark")],
        select=[("doc_id", None), ("lang", None), ("source", None), ("n_chars", None)],
    ),
    prep=lambda df: df.withColumn("words", F.split(F.col("text"), " ")),
)

_pipeline_query(
    "filter_eq_null",
    "SELECT o_orderkey, o_orderstatus FROM orders WHERE NULLIF(o_orderstatus, 'F') IS NULL",
    "orders",
    QueryRequest(
        filters=[("status_n", "=", None)],
        select=[("o_orderkey", None), ("o_orderstatus", None)],
    ),
    prep=lambda df: df.withColumn("status_n", F.nullif(F.col("o_orderstatus"), F.lit("F"))),
)

_pipeline_query(
    "filter_ne_null",
    "SELECT o_orderkey, o_orderstatus FROM orders WHERE NULLIF(o_orderstatus, 'F') IS NOT NULL",
    "orders",
    QueryRequest(
        filters=[("status_n", "<>", None)],
        select=[("o_orderkey", None), ("o_orderstatus", None)],
    ),
    prep=lambda df: df.withColumn("status_n", F.nullif(F.col("o_orderstatus"), F.lit("F"))),
)

_pipeline_query(
    "combi_or_of_ands",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
    WHERE (o_orderstatus = 'O' AND o_orderpriority = '1-URGENT')
       OR (o_orderstatus = 'F' AND o_orderpriority = '5-LOW')
    """,
    "orders",
    QueryRequest(
        combi=[
            {"o_orderstatus": "O", "o_orderpriority": "1-URGENT"},
            {"o_orderstatus": "F", "o_orderpriority": "5-LOW"},
        ],
        select=[("o_orderkey", None), ("o_orderstatus", None), ("o_orderpriority", None)],
    ),
)

_pipeline_query(
    "select_alias_exclude",
    "SELECT s_suppkey AS supplier_id, s_name AS supplier_name FROM supplier WHERE s_nationkey = 3",
    "supplier",
    QueryRequest(
        filters=[("s_nationkey", "=", 3)],
        select=[("s_suppkey", "supplier_id"), ("s_name", "supplier_name"), ("s_acctbal", None)],
        exclude=["s_acctbal"],
    ),
)

_pipeline_query(
    "distinct_values",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer WHERE c_nationkey < 5",
    "customer",
    QueryRequest(
        filters=[("c_nationkey", "<", 5)],
        select=[("c_mktsegment", None), ("c_nationkey", None)],
        distinct=True,
    ),
)

_pipeline_query(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """,
    "orders",
    QueryRequest(
        select=[("o_orderkey", None), ("o_totalprice", None)],
        sortby=[("o_totalprice", "desc"), ("o_orderkey", "asc")],
        limit=20,
    ),
    bench=True,
)

_pipeline_query(
    "offset_paging",
    """
    SELECT c_custkey, c_name FROM customer
    ORDER BY c_custkey LIMIT 50 OFFSET 100
    """,
    "customer",
    QueryRequest(
        select=[("c_custkey", None), ("c_name", None)],
        sortby=[("c_custkey", "asc")],
        limit=50,
        offset=100,
    ),
)


# ---------------------------------------------------------------------------
# Search (§2.10) + nearby (§2.11)
# ---------------------------------------------------------------------------


@register(
    "search_like_score",
    """
    SELECT doc_id, n_chars, search_score FROM (
      SELECT doc_id, n_chars,
             NULLIF((CASE WHEN lower(concat_ws(' ', text, source)) LIKE '%spark%' THEN 1 ELSE 0 END)
                  + (CASE WHEN lower(concat_ws(' ', text, source)) LIKE '%window%' THEN 1 ELSE 0 END), 0) AS search_score
      FROM documents
    ) WHERE search_score IS NOT NULL
    """,
    bench=True,
)
def search_like_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = table(spark, sf_dir, "documents")
    return search(df, ["text", "source"], "spark window").select("doc_id", "n_chars", "search_score")


@register(
    "search_tf_score",
    """
    SELECT d.doc_id, s.search_score FROM documents d
    JOIN (
      SELECT doc_id, COUNT(*) AS search_score
      FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok FROM documents)
      WHERE tok IN ('spark','window')
      GROUP BY doc_id
    ) s ON d.doc_id = s.doc_id
    """,
)
def search_tf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeapi_spark.operators.search import tf_search

    df = table(spark, sf_dir, "documents")
    return tf_search(df, "doc_id", "text", "spark window").select("doc_id", "search_score")


@register(
    "nearby_radius",
    """
    SELECT c_custkey, CAST(ROUND(dist, 2) AS DOUBLE) AS distance_m FROM (
      SELECT c_custkey,
             6371000.0 * acos(least(greatest(
               cos(radians(46.9)) * cos(radians(45.0 + (c_custkey % 400) / 100.0))
               * cos(radians(7.0 + (c_custkey % 700) / 100.0) - radians(7.44))
               + sin(radians(46.9)) * sin(radians(45.0 + (c_custkey % 400) / 100.0)), -1.0), 1.0)) AS dist
      FROM customer
    ) WHERE dist <= 150000.0
    """,
)
def nearby_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the testdata has no lat/lon columns; derive deterministic coordinates
    # from the key (same arithmetic in the oracle) — the operator under
    # test is the haversine filter itself.
    df = (
        table(spark, sf_dir, "customer")
        .withColumn("geo_lat", F.lit(45.0) + (F.col("c_custkey") % 400) / F.lit(100.0))
        .withColumn("geo_lon", F.lit(7.0) + (F.col("c_custkey") % 700) / F.lit(100.0))
    )
    out = nearby(df, "geo_lat", "geo_lon", lat=46.9, lon=7.44, distance_m=150000.0)
    return out.select(
        "c_custkey", F.round("distance_m", 2).cast("double").alias("distance_m")
    )
