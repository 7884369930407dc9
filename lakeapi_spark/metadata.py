"""Metadata operators (SURVEY §2.15).

The reference's ``/metadata`` + ``/{route}/metadata_detail`` endpoints
(endpoint/detail_endpoint.py:24-212) return: a recursive schema tree
with type strings, partition columns + their distinct values, max
string lengths (jsonified complex columns included), and the table's
modified date. Spark mapping: ``df.schema`` traversal + two small agg
queries; modified date from file mtimes (Delta history when available).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakeapi_spark.operators.pipeline import is_hidden_col


def schema_tree(schema: T.StructType) -> list[dict[str, Any]]:
    """Recursive name/type tree (ref detail_endpoint.py:156-188), hidden
    columns excluded."""

    def dtype_node(dt: T.DataType) -> dict[str, Any]:
        if isinstance(dt, T.StructType):
            return {
                "type": "struct",
                "fields": [
                    {"name": f.name, **dtype_node(f.dataType)}
                    for f in dt.fields
                    if not is_hidden_col(f.name)
                ],
            }
        if isinstance(dt, T.ArrayType):
            return {"type": "list", "element": dtype_node(dt.elementType)}
        if isinstance(dt, T.MapType):
            return {
                "type": "map",
                "key": dtype_node(dt.keyType),
                "value": dtype_node(dt.valueType),
            }
        return {"type": dt.simpleString()}

    return [
        {"name": f.name, **dtype_node(f.dataType)}
        for f in schema.fields
        if not is_hidden_col(f.name)
    ]


def max_string_lengths(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """MAX(length(col)) per string column in ONE aggregate pass (the
    reference runs one combined query too — detail_endpoint.py:123-154);
    complex columns are measured on their JSON form."""
    if columns is None:
        columns = [f.name for f in df.schema.fields if not is_hidden_col(f.name)]
    aggs = []
    for name in columns:
        dt = df.schema[name].dataType
        if isinstance(dt, (T.StructType, T.ArrayType, T.MapType)):
            src = F.to_json(F.col(name))
        elif isinstance(dt, T.StringType):
            src = F.col(name)
        else:
            continue
        aggs.append(F.max(F.length(src)).cast("long").alias(name))
    return df.agg(*aggs)


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """One-pass data-quality profile: per column (column, n_nulls,
    n_distinct, min_value, max_value) with min/max stringified for a
    uniform schema — the summary a pipeline inspects before trusting a
    new drop of data (beyond-reference; the reference's metadata detail
    stops at string lengths).

    Plan shape: ONE aggregate over a single scan computes every
    column's four metrics (Catalyst expands the multi-distinct into one
    pass), then a per-row ``stack`` unpivots to the long form — no
    second scan, no shuffle beyond the aggregate itself. At extreme
    widths or cardinalities swap count_distinct for
    approx_count_distinct (HLL) — same shape, bounded state."""
    aggs = []
    for c in columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__nn_{c}`, `__nd_{c}`, `__mn_{c}`, `__mx_{c}`" for c in columns
    )
    return wide.selectExpr(
        f"stack({len(columns)}, {stack_args}) as (column, n_nulls, n_distinct, min_value, max_value)"
    )


def distinct_partition_values(df: DataFrame, partition_cols: list[str]) -> DataFrame:
    """SELECT DISTINCT partition_cols (ref detail_endpoint.py:90-99).
    On a partitioned source this is metadata-only after AQE: the scan
    reads just the partition columns (column pruning)."""
    return df.select(*partition_cols).distinct()


def modified_date(uri: str) -> float | None:
    """Latest file mtime under the table uri (ref df_base.py:379-399 uses
    delta log / file stats)."""
    if os.path.isfile(uri):
        return os.path.getmtime(uri)
    latest: float | None = None
    for root, _dirs, files in os.walk(uri):
        for fn in files:
            t = os.path.getmtime(os.path.join(root, fn))
            latest = t if latest is None or t > latest else latest
    return latest


def metadata_detail(df: DataFrame, uri: str | None = None, partition_cols: list[str] | None = None) -> dict[str, Any]:
    """The full metadata_detail payload (ref types.py:148-158)."""
    pcols = partition_cols or []
    return {
        "schema": schema_tree(df.schema),
        "partition_columns": pcols,
        "partition_values": (
            [r.asDict() for r in distinct_partition_values(df, pcols).collect()] if pcols else []
        ),
        "max_string_lengths": (
            max_string_lengths(df).first().asDict() if df.schema.fields else {}
        ),
        "modified_date": modified_date(uri) if uri else None,
    }
