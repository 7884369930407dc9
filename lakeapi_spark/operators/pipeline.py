"""The config-endpoint query pipeline (SURVEY.md §2 query shape, §3.1).

Reference shape, assembled in endpoint/endpoint.py:213-311:

    scan(table) -> [pre-filter pushdown] -> WHERE(param filters)
    -> [search / nearby augment] -> project/alias/jsonify -> DISTINCT?
    -> ORDER BY -> LIMIT/OFFSET -> sink(format)

Here the pipeline is a declarative ``QueryRequest`` applied to a
DataFrame. We do NOT hand-push filters into the scan the way the
reference does (endpoint.py:222-247) — expressing them as ``.filter``
before the projection lets Catalyst do predicate pushdown, column
pruning, and limit pushdown on its own; ``tests/test_plans.py`` asserts
the pushdown actually shows up in the physical plan.

Hidden columns (``_`` prefix, ``*_md5_prefix_*``, ``*_md5_mod_*``,
``*_xxhash64_prefix_*``) are excluded from output like the reference
does everywhere (core/config.py:59-65, endpoint.py:79-81).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from lakeapi_spark.operators.filters import and_all, combi_filter, params_filter

_HIDDEN_RE = re.compile(r"(^_)|(_md5_prefix_\d+$)|(_md5_mod_\d+$)|(_xxhash64_prefix_\d+$)")


def is_hidden_col(name: str) -> bool:
    """Ref core/config.py:59-65 should_hide_col_name."""
    return bool(_HIDDEN_RE.search(name))


@dataclass
class QueryRequest:
    """One config-endpoint request, engine-independent.

    - filters: [(column, op, value), ...] AND'd (datasource.py:387-397)
    - combi:   [{col: value, ...}, ...] OR-of-ANDs (datasource.py:400-423)
    - select:  projection with optional aliases [(name, alias|None), ...]
               (request ``$select`` intersect, endpoint.py:255-283)
    - exclude: columns dropped from output (config ``exclude``)
    - distinct: ``$distinct`` flag (endpoint.py:172-177,285-287)
    - sortby:  [(column, "asc"|"desc"), ...] (config.py:263-291)
    - limit/offset: paging (endpoint.py:289-293); limit=None -> no limit
      (the service layer maps limit=-1 + allow_get_all_pages to None)
    - jsonify_complex: lower struct/array/map columns to JSON strings
      (df_base.py:317-327)
    """

    filters: list[tuple[str, str, Any]] = field(default_factory=list)
    combi: list[dict[str, Any]] = field(default_factory=list)
    select: list[tuple[str, str | None]] | None = None
    exclude: list[str] = field(default_factory=list)
    distinct: bool = False
    sortby: list[tuple[str, str]] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    jsonify_complex: bool = False


def _sort_cols(sortby: list[tuple[str, str]]) -> list[Column]:
    cols = []
    for name, direction in sortby:
        c = F.col(name)
        # match the DuckDB oracle's default_null_order='nulls_first'
        # for BOTH directions (ref df_duckdb.py:496)
        cols.append(c.desc_nulls_first() if direction.lower() == "desc" else c.asc_nulls_first())
    return cols


def _is_complex(dtype: T.DataType) -> bool:
    return isinstance(dtype, (T.StructType, T.ArrayType, T.MapType))


def apply_query(df: DataFrame, req: QueryRequest) -> DataFrame:
    """Compile the request onto ``df`` and return the (lazy) result."""
    cond = and_all([params_filter(req.filters), combi_filter(req.combi)])
    if cond is not None:
        df = df.filter(cond)

    # projection: explicit select (minus hidden/excluded) or all visible cols
    excluded = set(req.exclude)
    if req.select is not None:
        cols = [
            F.col(name).alias(alias) if alias else F.col(name)
            for name, alias in req.select
            if not is_hidden_col(name) and name not in excluded
        ]
    else:
        cols = [
            F.col(f.name)
            for f in df.schema.fields
            if not is_hidden_col(f.name) and f.name not in excluded
        ]
    df = df.select(*cols)

    if req.jsonify_complex:
        df = df.select(
            *[
                F.to_json(F.col(f.name)).alias(f.name) if _is_complex(f.dataType) else F.col(f.name)
                for f in df.schema.fields
            ]
        )

    if req.distinct:
        df = df.distinct()
    if req.sortby:
        df = df.orderBy(*_sort_cols(req.sortby))
    if req.offset:
        df = df.offset(req.offset)
    if req.limit is not None and req.limit >= 0:
        df = df.limit(req.limit)
    return df


def paged(df: DataFrame, order: list[tuple[str, str]], limit: int, offset: int) -> DataFrame:
    """Deterministic paging helper. In a distributed engine OFFSET without a
    total order is non-deterministic (SURVEY §7 risk 2) — this variant
    requires a sort spec and appends a monotonic tiebreak so rows with tied
    sort keys page consistently within a query, then uses native
    offset/limit which Spark turns into a single-partition take after the
    sort. (The tiebreak is stable for a fixed scan partitioning — i.e.
    within one query and across reruns over unchanged files — not across
    data layout changes; callers needing cross-version stability must sort
    on a unique key.)"""
    return (
        df.orderBy(*_sort_cols(order), F.monotonically_increasing_id())
        .offset(offset)
        .limit(limit)
    )


def topk(df: DataFrame, order: list[tuple[str, str]], k: int) -> DataFrame:
    """Top-k: orderBy().limit(k) compiles to TakeOrderedAndProject —
    a per-partition heap + driver merge, no full sort shuffle. This is the
    scale path for 'first page of a big sorted result'."""
    return df.orderBy(*_sort_cols(order)).limit(k)


def row_number_paged(
    df: DataFrame, order: list[tuple[str, str]], limit: int, offset: int
) -> DataFrame:
    """Window-based paging fallback (pre-Spark-3.4 semantics); also the
    shape to use when paging must be stable across repeated queries."""
    w = Window.orderBy(*_sort_cols(order))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
        .drop("__rn")
    )
