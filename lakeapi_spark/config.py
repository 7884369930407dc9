"""Declarative table/endpoint config (ref core/config.py).

The reference's YAML maps tables to datasources with default
projection/sort/filters, param declarations (name + operators + combi),
search/nearby configs, and paging policy. This module is the same
declarative surface as plain dataclasses (YAML loading is a thin
``from_dict`` away and needs no extra dependency).

Citations: Config core/config.py:172-195, DatasourceConfig :133-155,
Param :96-127, SearchConfig/NearbyConfig core/types.py:118-128, paging
endpoint/endpoint.py:164,210-211,289-293.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

DEFAULT_LIMIT = 100  # ref endpoint.py:164
MAX_LIMIT = 1000  # clamp unless allow_get_all_pages (ref endpoint.py:210-211)


@dataclass
class ParamConfig:
    """A declared query parameter (ref core/config.py:96-127)."""

    name: str
    colname: str | None = None  # defaults to name
    operators: list[str] = field(default_factory=lambda: ["="])
    combi: list[str] | None = None  # composite-key OR-of-ANDs member

    @property
    def col(self) -> str:
        return self.colname or self.name


@dataclass
class SearchConfig:
    name: str
    columns: list[str]


@dataclass
class NearbyConfig:
    name: str
    lat_col: str
    lon_col: str


@dataclass
class DatasourceConfig:
    uri: str
    file_type: str = "parquet"
    select: list[dict[str, str]] | None = None  # [{name, alias}]
    exclude: list[str] = field(default_factory=list)
    sortby: list[dict[str, str]] = field(default_factory=list)  # [{by, direction}]
    filters: list[dict[str, Any]] = field(default_factory=list)  # baked-in pre-filters
    partition_columns: list[str] = field(default_factory=list)
    options: dict[str, str] = field(default_factory=dict)


@dataclass
class TableConfig:
    name: str
    datasource: DatasourceConfig
    tag: str = "default"
    version: int = 1
    params: list[ParamConfig] = field(default_factory=list)
    search: list[SearchConfig] = field(default_factory=list)
    nearby: list[NearbyConfig] = field(default_factory=list)
    allow_get_all_pages: bool = False
    engine: str = "spark"

    @property
    def route(self) -> str:
        """/api/v{version}/{tag}/{name} (ref config.py:172-195)."""
        return f"/api/v{self.version}/{self.tag}/{self.name}"

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> TableConfig:
        ds = d["datasource"]
        return cls(
            name=d["name"],
            tag=d.get("tag", "default"),
            version=int(d.get("version", 1)),
            datasource=DatasourceConfig(
                uri=ds["uri"],
                file_type=ds.get("file_type", "parquet"),
                select=ds.get("select"),
                exclude=list(ds.get("exclude", [])),
                sortby=[
                    {"by": s, "direction": "asc"} if isinstance(s, str) else s
                    for s in ds.get("sortby", [])
                ],
                filters=list(ds.get("filters", [])),
                partition_columns=list(ds.get("partition_columns", [])),
                options=dict(ds.get("options", {})),
            ),
            params=[
                ParamConfig(name=p) if isinstance(p, str) else ParamConfig(
                    name=p["name"],
                    colname=p.get("colname"),
                    operators=list(p.get("operators", ["="])),
                    combi=p.get("combi"),
                )
                for p in d.get("params", [])
            ],
            search=[SearchConfig(**s) for s in d.get("search", [])],
            nearby=[NearbyConfig(**n) for n in d.get("nearby", [])],
            allow_get_all_pages=bool(d.get("allow_get_all_pages", False)),
            engine=d.get("engine", "spark"),
        )


def clamp_limit(limit: int | None, allow_get_all_pages: bool) -> int | None:
    """Paging policy (ref endpoint.py:164,210-211,289-293): default 100,
    clamp to 1000, limit=-1 -> unbounded only when allowed."""
    if limit is None:
        return DEFAULT_LIMIT
    if limit == -1:
        return None if allow_get_all_pages else MAX_LIMIT
    return min(limit, MAX_LIMIT) if not allow_get_all_pages else limit
