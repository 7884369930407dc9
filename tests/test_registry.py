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


def test_limit_clamping():
    assert clamp_limit(None, False) == 100
    assert clamp_limit(50000, False) == 1000
    assert clamp_limit(-1, False) == 1000
    assert clamp_limit(-1, True) is None
    assert clamp_limit(50000, True) == 50000
