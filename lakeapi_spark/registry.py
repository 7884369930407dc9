"""Table registry + request compiler — the service core (ref §3.1).

``TableRegistry`` is the Spark analogue of the reference's startup route
registration (core/route.py:16-142): each configured table becomes a
lazily-read DataFrame (schema cached per table version, ref
schema_cache.py) with the datasource defaults applied. ``compile_request``
is the request-time pipeline (endpoint/endpoint.py:160-326): raw query
params -> operator routing -> partition-pruning filters -> QueryRequest
-> DataFrame.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from lakeapi_spark.config import TableConfig, clamp_limit, merge_config_from_data
from lakeapi_spark.operators.filters import split_param_postfix
from lakeapi_spark.operators.partitioning import apply_partition_pruning
from lakeapi_spark.operators.pipeline import QueryRequest, apply_query
from lakeapi_spark.operators.nearby import nearby as nearby_op
from lakeapi_spark.operators.search import search as search_op
from lakeapi_spark.sources.readers import expand_wildcard, read_source


class UnknownTableError(KeyError):
    pass


class TableRegistry:
    def __init__(
        self,
        spark: SparkSession,
        accounts: dict[str, dict[str, str]] | None = None,
        data_path: str | None = None,
    ):
        """``accounts``/``data_path`` mirror the reference's service-level
        settings (source_uri.py:42-61): named credential sets for
        object-store uris, and the base dir relative uris resolve
        against."""
        self.spark = spark
        self.accounts = accounts or {}
        self.data_path = data_path
        self._tables: dict[str, TableConfig] = {}
        self._schema_cache: dict[tuple[str, int, int | None], T.StructType] = {}

    def _resolve_uri(self, cfg: TableConfig) -> str:
        """Normalize the configured uri to its Hadoop form and apply any
        account credentials to the live session (sources/uris.py)."""
        from lakeapi_spark.sources.uris import apply_hadoop_conf, normalize_uri

        uri, hconf = normalize_uri(
            cfg.datasource.uri, cfg.datasource.account, self.accounts, self.data_path
        )
        if hconf:
            apply_hadoop_conf(self.spark, hconf)
        return uri

    def register(self, cfg: TableConfig) -> None:
        """Wildcard configs (name='*', uri='folder/*') expand to one table
        per child (ref config.py:341-382). ``config_from_data`` merges
        config shipped inside the table (delta ``lakeapi.config`` property,
        parquet KV metadata, or sidecar — ref config.py:227-254)."""
        if cfg.config_from_data:
            # probe the RESOLVED uri: the raw one may be data_path-
            # relative and the carriers are checked with local os.path
            cfg = merge_config_from_data(cfg, resolved_uri=self._resolve_uri(cfg))
        if cfg.name == "*":
            assert cfg.datasource.uri.endswith("/*")
            for child_name, child_uri in expand_wildcard(self.spark, self._resolve_uri(cfg)):
                import copy

                child = copy.deepcopy(cfg)
                child.name = child_name
                child.datasource.uri = child_uri
                self._tables[child_name] = child
            return
        self._tables[cfg.name] = cfg

    def names(self) -> list[str]:
        return sorted(self._tables)

    def config(self, name: str) -> TableConfig:
        if name not in self._tables:
            raise UnknownTableError(name)
        return self._tables[name]

    def dataframe(
        self, name: str, delta_predicates: list[tuple] | None = None
    ) -> DataFrame:
        """``delta_predicates``: closed-range boxes (from
        ``predicates_from_filters``) that let a delta fallback table
        skip whole files by LOG stats before Spark ever lists them —
        the metadata layer of pruning, on top of Catalyst's
        row-group/partition pruning. Results never change; only IO."""
        cfg = self.config(name)
        df = read_source(
            self.spark,
            self._resolve_uri(cfg),
            cfg.datasource.file_type,
            dict(cfg.datasource.options),
            delta_predicates=delta_predicates,
        )
        return df

    def schema(self, name: str) -> T.StructType:
        """Cached per (table, config version, DATA modified date). The
        reference re-checks its cached delta meta incrementally on
        every access (utils/meta_cache.py:46-58 update_incremental), so
        a table rewritten underneath the server — its datamove test,
        tests/test_datamove.py:16-42 — serves the NEW schema without a
        restart. The modified-date probe is one FS listing per call
        (the same freshness signal the BM25 index cache keys on);
        non-filesystem sources (odbc/sqlite) fall back to the config
        version only."""
        from lakeapi_spark.sources.fs import latest_modification

        cfg = self.config(name)
        try:
            mtime = latest_modification(self.spark, self._resolve_uri(cfg))
        except Exception:
            mtime = None
        key = (name, cfg.version, mtime)
        if key not in self._schema_cache:
            for stale in [k for k in self._schema_cache if k[0] == name and k != key]:
                self._schema_cache.pop(stale)
            self._schema_cache[key] = self.dataframe(name).schema
        return self._schema_cache[key]

    def create_views(self) -> None:
        for name in self._tables:
            self.dataframe(name).createOrReplaceTempView(name)


def route_params(
    cfg: TableConfig, raw_params: dict[str, Any]
) -> tuple[list[tuple[str, str, Any]], list[dict[str, Any]]]:
    """Query-string names -> (filters, combi groups) using postfix routing
    (ref model.py:41-72 + datasource.py:400-423)."""
    declared = {p.name: p for p in cfg.params}
    filters: list[tuple[str, str, Any]] = []
    combi_groups: dict[str, dict[str, Any]] = {}
    for qname, value in raw_params.items():
        pname, op = split_param_postfix(qname, declared.keys())
        p = declared[pname]
        if p.combi:
            # combi param: value is a list of dicts, each ANDing its keys
            for i, group in enumerate(value if isinstance(value, list) else [value]):
                combi_groups.setdefault(f"{pname}:{i}", {}).update(group)
            continue
        if op not in p.operators and not (op == "=" and not p.operators):
            raise ValueError(f"operator {op!r} not allowed for param {pname!r}")
        filters.append((p.col, op, value))
    return filters, list(combi_groups.values())


def compile_request(
    registry: TableRegistry,
    name: str,
    params: dict[str, Any] | None = None,
    *,
    select: list[str] | None = None,
    distinct: bool = False,
    limit: int | None = None,
    offset: int | None = None,
    search_text: str | None = None,
    nearby_point: tuple[float, float, float] | None = None,
    jsonify_complex: bool = False,
) -> DataFrame:
    """The full §3.1 request lifecycle on Spark."""
    cfg = registry.config(name)
    ds = cfg.datasource

    filters, combi = route_params(cfg, params or {})
    # baked-in datasource pre-filters (ref config 'filters')
    for f in ds.filters:
        filters.append((f["col"], f.get("op", "="), f.get("value")))

    # delta log-stats file skipping from the request's AND filters:
    # pure-IO pruning a level above Catalyst (files are dropped before
    # Spark lists them); combi (OR) groups don't contribute
    delta_preds = None
    if ds.file_type == "delta":
        from lakeapi_spark.sources.delta import predicates_from_filters

        # schema-aware folding: raw params arrive untyped ('5' against
        # a bigint column) and date/timestamp stats are isoformat
        # strings — coercion per the table type keeps skipping sound
        delta_preds = predicates_from_filters(filters, registry.schema(name)) or None
    df = registry.dataframe(name, delta_predicates=delta_preds)

    # derived partition pruning (§2.12) before the logical filters
    if ds.partition_columns:
        df = apply_partition_pruning(df, ds.partition_columns, filters)

    sel: list[tuple[str, str | None]] | None = None
    if ds.select is not None:
        sel = [(s["name"], s.get("alias")) for s in ds.select]
    if select is not None:
        base = sel or [(f.name, None) for f in df.schema.fields]
        sel = [(n, a) for n, a in base if (a or n) in set(select)]

    sortby = [(s["by"], s.get("direction", "asc")) for s in ds.sortby]

    clamped = clamp_limit(limit, cfg.allow_get_all_pages)
    req = QueryRequest(
        filters=filters,
        combi=combi,
        select=sel,
        exclude=list(ds.exclude),
        distinct=distinct,
        sortby=sortby,
        limit=clamped,
        offset=offset,
        jsonify_complex=jsonify_complex,
    )

    if search_text is not None:
        # The reference appends the score column, the `score IS NOT NULL`
        # filter, and `ORDER BY score DESC` (append=False — REPLACING the
        # config sortby) to the SAME Select that carries LIMIT/OFFSET
        # (endpoint.py:295-301, endpoint_search.py:56-59), so scoring and
        # score-ordering apply BEFORE paging. Compile the request without
        # sort/paging, score, then page the scored result.
        assert cfg.search, f"table {name} has no search config"
        req.sortby, req.limit, req.offset = [], None, None
        out = apply_query(df, req)
        sc = cfg.search[0]
        if sc.method == "bm25":
            # Served from the per-table-version inverted index, like the
            # reference's duckdb FTS path (df_duckdb.py:321-379): the
            # index covers the FULL table version (request filters don't
            # change corpus statistics), scores broadcast-join onto the
            # filtered request. Inner join == the reference's
            # `score IS NOT NULL` drop of non-matching rows.
            assert sc.id_column, "bm25 search requires SearchConfig.id_column"
            from pyspark.sql import functions as F

            from lakeapi_spark.operators.search import bm25_index_for, bm25_scores

            full = registry.dataframe(name)
            text = F.concat_ws(" ", *[F.col(c) for c in sc.columns])
            try:
                from lakeapi_spark.sources.fs import latest_modification

                version = latest_modification(registry.spark, ds.uri)
            except Exception:  # non-file sources: key by config version
                version = cfg.version
            idx = bm25_index_for(
                full.select(F.col(sc.id_column), text.alias("__text")),
                sc.id_column,
                "__text",
                key=(f"search:{name}:{ds.uri}", version),
            )
            scores = bm25_scores(idx, search_text, score_col="search_score")
            out = out.join(
                scores.withColumnRenamed("__id", sc.id_column), sc.id_column, "inner"
            )
        else:
            out = search_op(out, sc.columns, search_text)
        # Page with the same deterministic-tiebreak discipline as paged():
        # scores are small integers with many ties, so score-desc alone
        # makes page N and N+1 overlap/drop rows. Secondary keys: the
        # table's configured sortby, then a monotonic id.
        from pyspark.sql import functions as F

        from lakeapi_spark.operators.pipeline import _sort_cols

        out = out.orderBy(
            F.col("search_score").desc(),
            *_sort_cols(sortby),
            F.monotonically_increasing_id(),
        )
        if offset:
            out = out.offset(offset)
        if clamped is not None and clamped >= 0:
            out = out.limit(clamped)
    else:
        out = apply_query(df, req)

    if nearby_point is not None:
        # Nearby stays AFTER paging: the reference wraps the already-limited
        # query in a CTE and applies distance filter/order outside it
        # (endpoint_nearby.py:66-79).
        assert cfg.nearby, f"table {name} has no nearby config"
        lat, lon, dist = nearby_point
        nb = cfg.nearby[0]
        out = nearby_op(out, nb.lat_col, nb.lon_col, lat, lon, dist, dist_name=nb.name)
    return out


def serve_request(
    registry: TableRegistry,
    name: str,
    params: dict[str, Any] | None = None,
    *,
    fmt: str = "json",
    csv_separator: str = ",",
    encoding: str | None = None,
    **kwargs: Any,
):
    """The serialization step the reference's HTTP handler performs
    after compiling a request (core/response.py:87-170,315-352):
    bounded results serialize to whole ``bytes``; an UNBOUNDED request
    (``limit=-1`` on an ``allow_get_all_pages`` table) returns a chunk
    ITERATOR via :func:`lakeapi_spark.serialize.stream_serialize`, so a
    full-table export never materializes on the driver — exactly the
    reference's temp-file chunk streaming, Spark-shaped. Formats that
    need a seekable whole-file sink (arrow file, xlsx, html, xml) stay
    whole-bytes in either case."""
    from lakeapi_spark import serialize as ser

    df = compile_request(registry, name, params, **kwargs)
    cfg = registry.config(name)
    unbounded = clamp_limit(kwargs.get("limit"), cfg.allow_get_all_pages) is None
    if unbounded and fmt not in ("arrow", "xlsx", "html", "xml"):
        return ser.stream_serialize(
            df, fmt, csv_separator=csv_separator, encoding=encoding
        )
    return ser.serialize(df, fmt, csv_separator=csv_separator, encoding=encoding)
