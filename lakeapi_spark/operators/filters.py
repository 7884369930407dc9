"""Filter algebra: HTTP-param semantics compiled to Spark ``Column``s.

Reference semantics (all cited from /root/reference/bmsdna/lakeapi):
- operator set & null-aware ``=``/``<>``: core/datasource.py:502-600
- ``in``/``not in`` (empty list -> no-op): datasource.py:563-570
- ``between`` arity validation (2 values or error): datasource.py:571-594
- ``contains``/``not contains`` -> LIKE '%v%': datasource.py:539-549
- ``startswith`` -> LIKE 'v%': datasource.py:551-553
- ``has`` -> array_contains: datasource.py:555-561
- combi params (OR of ANDs, null-aware): datasource.py:400-423,486-496
- AND concatenation of all params: datasource.py:387-397 (concat_expr)
- param-name postfix routing (casefold, space->underscore):
  core/model.py:41-72,156-168

Everything here is a pure function ``-> Column`` — Catalyst sees plain
comparisons and pushes them into the scan (predicate pushdown + parquet
row-group / partition pruning), which is the whole point: no custom
execution, just correctly-shaped predicates.
"""

from __future__ import annotations

import operator as _op
from collections.abc import Iterable, Mapping, Sequence
from functools import reduce
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


class FilterArityError(ValueError):
    """between/not between needs exactly two values (ref datasource.py:577-594
    raises HTTP 400; we raise a typed error for the service layer to map)."""


#: operators supported on params (ref core/types.py:40-55 OperatorType)
OPERATORS = (
    "=",
    "<>",
    "<",
    ">",
    "<=",
    ">=",
    "in",
    "not in",
    "between",
    "not between",
    "contains",
    "not contains",
    "startswith",
    "has",
    "null",
    "not null",
)

#: query-string postfix -> operator (ref core/model.py:41-72). The empty
#: postfix means equality; ``_ne`` style postfixes are appended to the
#: param name in the query string.
POSTFIX_TO_OP: dict[str, str] = {
    "": "=",
    "ne": "<>",
    "lt": "<",
    "gt": ">",
    "lte": "<=",
    "gte": ">=",
    "in": "in",
    "not_in": "not in",
    "between": "between",
    "not_between": "not between",
    "contains": "contains",
    "not_contains": "not contains",
    "startswith": "startswith",
    "has": "has",
    "null": "null",
    "not_null": "not null",
}


def normalize_param_name(name: str) -> str:
    """Casefold + spaces->underscores (ref core/model.py:64,156-168)."""
    return name.casefold().replace(" ", "_")


def split_param_postfix(query_name: str, known_params: Iterable[str]) -> tuple[str, str]:
    """Resolve a query-string name like ``price_gte`` to (param, operator).

    Longest-postfix match against the known param names, mirroring the
    reference's generated pydantic field names (model.py:171-236).
    """
    qname = normalize_param_name(query_name)
    known = {normalize_param_name(p): p for p in known_params}
    if qname in known:
        return known[qname], "="
    # try postfixes, longest first, so ``_not_in`` wins over ``_in``
    for postfix in sorted((p for p in POSTFIX_TO_OP if p), key=len, reverse=True):
        suffix = "_" + postfix
        if qname.endswith(suffix):
            base = qname[: -len(suffix)]
            if base in known:
                return known[base], POSTFIX_TO_OP[postfix]
    raise KeyError(f"no param matches query name {query_name!r}")


_CMP = {"<": _op.lt, ">": _op.gt, "<=": _op.le, ">=": _op.ge}


def _like_escape(value: str) -> str:
    """Escape LIKE wildcards in user input (ref df_base.py:200-215 term_like
    builds the pattern from raw input; we escape to keep '%'/'_' literal)."""
    return value.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")


def filter_expr(col: Column | str, op: str, value: Any) -> Column | None:
    """Compile one (column, operator, value) filter to a Column.

    Returns ``None`` for no-op filters (empty ``in`` list — ref
    datasource.py:563-570 skips them).

    Null-aware equality: ``= None`` -> IS NULL, ``<> None`` -> IS NOT
    NULL (ref datasource.py:523-537).
    """
    c = F.col(col) if isinstance(col, str) else col
    if op == "=":
        return c.isNull() if value is None else (c == F.lit(value))
    if op == "<>":
        return c.isNotNull() if value is None else (c != F.lit(value))
    if op in _CMP:
        return _CMP[op](c, F.lit(value))
    if op in ("in", "not in"):
        values = list(value) if isinstance(value, (list, tuple, set)) else [value]
        if not values:
            return None
        e = c.isin(values)
        return ~e if op == "not in" else e
    if op in ("between", "not between"):
        values = list(value) if isinstance(value, (list, tuple)) else [value]
        if len(values) != 2:
            raise FilterArityError(
                f"between requires exactly 2 values, got {len(values)}"
            )
        e = c.between(F.lit(values[0]), F.lit(values[1]))
        return ~e if op == "not between" else e
    if op in ("contains", "not contains"):
        e = c.like(f"%{_like_escape(str(value))}%")
        return ~e if op == "not contains" else e
    if op == "startswith":
        return c.like(f"{_like_escape(str(value))}%")
    if op == "has":
        return F.array_contains(c, F.lit(value))
    if op == "null":
        return c.isNull()
    if op == "not null":
        return c.isNotNull()
    raise ValueError(f"unsupported operator {op!r}")


def and_all(exprs: Iterable[Column | None]) -> Column | None:
    """AND-concatenate, skipping no-ops (ref concat_expr datasource.py:387-397)."""
    parts = [e for e in exprs if e is not None]
    if not parts:
        return None
    return reduce(_op.and_, parts)


def or_all(exprs: Iterable[Column | None]) -> Column | None:
    parts = [e for e in exprs if e is not None]
    if not parts:
        return None
    return reduce(_op.or_, parts)


def combi_filter(groups: Sequence[Mapping[str, Any]]) -> Column | None:
    """Combi params: OR of per-dict ANDs, each key=value null-aware
    (ref datasource.py:400-423,486-496; config 'combi' in config_test.yml:34-46).

    ``[{"a": 1, "b": "x"}, {"a": 2}]`` -> ``(a=1 AND b='x') OR (a=2)``.
    """
    return or_all(
        and_all(filter_expr(k, "=", v) for k, v in group.items()) for group in groups
    )


def params_filter(
    filters: Sequence[tuple[str, str, Any]],
) -> Column | None:
    """Compile ``[(column, op, value), ...]`` to one AND'd Column."""
    return and_all(filter_expr(col, op, val) for col, op, val in filters)
