"""End-to-end config->request lifecycle (the reference's test_app.py
golden-request style, minus HTTP)."""

from __future__ import annotations

import pytest

from lakeapi_spark.config import DatasourceConfig, ParamConfig, TableConfig, clamp_limit
from lakeapi_spark.registry import TableRegistry, UnknownTableError, compile_request


@pytest.fixture(scope="module")
def registry(spark, sf_dir):
    reg = TableRegistry(spark)
    reg.register(
        TableConfig(
            name="parts",
            datasource=DatasourceConfig(
                uri=f"{sf_dir}/part.parquet",
                select=[
                    {"name": "p_partkey", "alias": "id"},
                    {"name": "p_brand"},
                    {"name": "p_size"},
                    {"name": "p_name"},
                ],
                sortby=[{"by": "p_partkey", "direction": "asc"}],
            ),
            params=[
                ParamConfig(name="brand", colname="p_brand"),
                ParamConfig(name="p_size", operators=["=", ">=", "<=", "in"]),
            ],
        )
    )
    reg.register(TableConfig(name="*", datasource=DatasourceConfig(uri=sf_dir + "/*")))
    return reg


def test_wildcard_expansion(registry):
    names = registry.names()
    assert "lineitem" in names and "orders" in names and "parts" in names


def test_unknown_table(registry):
    with pytest.raises(UnknownTableError):
        registry.config("nope")


def test_schema_cache(registry):
    s1 = registry.schema("parts")
    s2 = registry.schema("parts")
    assert s1 is s2  # cached per (name, version)


def test_compile_request_filters_and_alias(spark, registry):
    out = compile_request(registry, "parts", {"brand": "Brand#13", "p_size_gte": 40})
    rows = out.collect()
    assert rows, "expected matches"
    assert set(out.columns) == {"id", "p_brand", "p_size", "p_name"}
    assert all(r.p_brand == "Brand#13" and r.p_size >= 40 for r in rows)
    # default sortby ascending id
    ids = [r.id for r in rows]
    assert ids == sorted(ids)


def test_compile_request_operator_not_allowed(registry):
    with pytest.raises(ValueError, match="not allowed"):
        compile_request(registry, "parts", {"brand_contains": "Brand"})


def test_compile_request_select_subset_and_paging(registry):
    out = compile_request(registry, "parts", {}, select=["id", "p_size"], limit=5, offset=2)
    rows = out.collect()
    assert out.columns == ["id", "p_size"]
    assert len(rows) == 5
    assert rows[0].id == 2  # offset applied after the configured sort


@pytest.fixture(scope="module")
def search_registry(spark, sf_dir):
    from lakeapi_spark.config import SearchConfig

    reg = TableRegistry(spark)
    reg.register(
        TableConfig(
            name="parts_searchable",
            datasource=DatasourceConfig(
                uri=f"{sf_dir}/part.parquet",
                sortby=[{"by": "p_partkey", "direction": "asc"}],
            ),
            search=[SearchConfig(name="search", columns=["p_name"])],
        )
    )
    return reg


def test_search_scores_before_paging(spark, search_registry):
    """Regression for the r1 advice: the reference applies the score column,
    `score IS NOT NULL`, and ORDER BY score in the SAME Select as LIMIT
    (endpoint.py:295-301), so search must see the whole table, not the
    first page."""
    full = compile_request(
        search_registry, "parts_searchable", {}, search_text="widget", limit=-1
    )
    # limit=-1 without allow_get_all_pages clamps to 1000, enough at sf0.001
    n_matches = full.count()
    assert n_matches > 5, "fixture needs several matches for the paging check"

    page = compile_request(
        search_registry, "parts_searchable", {}, search_text="widget", limit=5
    )
    rows = page.collect()
    assert len(rows) == 5
    # every returned row is a real match, even though a pre-scoring LIMIT 5
    # (first 5 by p_partkey) would include non-matches
    assert all("widget" in r.p_name for r in rows)
    assert all(r.search_score == 1 for r in rows)

    unscored_first_5 = compile_request(search_registry, "parts_searchable", {}, limit=5)
    assert not all("widget" in r.p_name for r in unscored_first_5.collect())


def test_limit_clamping():
    assert clamp_limit(None, False) == 100
    assert clamp_limit(50000, False) == 1000
    assert clamp_limit(-1, False) == 1000
    assert clamp_limit(-1, True) is None
    assert clamp_limit(50000, True) == 50000
