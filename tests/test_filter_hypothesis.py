"""Differential property test for the filter compiler.

Hypothesis generates (operator, value) pairs over a fixed corpus with
nulls and tricky strings; filter_expr's Spark result is compared to a
pure-Python evaluator implementing the REFERENCE semantics
(null-aware =/<>, SQL three-valued comparisons, LIKE-based contains
with escaped wildcards, array has). Any divergence between what we
compiled and what the reference's datasource.py:502-594 would keep is
a bug — this catches the classes example-based tests miss (wildcard
injection, null threading, empty in-lists).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakeapi_spark.operators.filters import filter_expr

ROWS = [
    # (k, s, i, arr)
    (0, None, None, []),
    (1, "", 0, ["a"]),
    (2, "alpha", 1, ["a", "b"]),
    (3, "Alpha", -1, ["b"]),
    (4, "al%pha", 5, ["a", "c", "c"]),
    (5, "al_pha", 10, None),
    (6, "beta", 100, ["%", "_"]),
    (7, " beta ", -100, [""]),
    (8, "a" * 50, 2**31, ["long"]),
    (9, "100", 7, ["a", None]),
]

STR_VALUES = st.sampled_from(
    ["alpha", "Alpha", "al", "%", "_", "", " ", "beta", "a", "100", "\\", "zz"]
)
INT_VALUES = st.sampled_from([None, -100, -1, 0, 1, 5, 7, 10, 100, 2**31, 42])


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(
        ROWS, "k long, s string, i long, arr array<string>"
    ).cache()
    df.count()
    return df


def ref_eval(row, col, op, value):
    """The reference's filter semantics in plain Python."""
    v = row[col]
    if op == "=":
        return v is None if value is None else (v is not None and v == value)
    if op == "<>":
        return v is not None if value is None else (v is not None and v != value)
    if op in ("<", ">", "<=", ">="):
        if v is None or value is None:
            return False
        import operator as _op

        return {"<": _op.lt, ">": _op.gt, "<=": _op.le, ">=": _op.ge}[op](v, value)
    if op == "in":
        return v is not None and v in value
    if op == "not in":
        # SQL NOT IN: null operand or null in list -> no row qualifies
        return v is not None and all(x is not None for x in value) and v not in value
    if op == "between":
        return v is not None and value[0] <= v <= value[1]
    if op == "not between":
        return v is not None and not (value[0] <= v <= value[1])
    if op == "contains":
        return v is not None and str(value) in v
    if op == "not contains":
        return v is not None and str(value) not in v
    if op == "startswith":
        return v is not None and v.startswith(str(value))
    if op == "has":
        return row["arr"] is not None and value in [x for x in row["arr"] if x is not None]
    raise AssertionError(op)


def run_case(corpus, col, op, value):
    e = filter_expr(col, op, value)
    if e is None:  # empty in-list -> no-op (keep everything)
        got = {r.k for r in corpus.collect()}
        expect = {r[0] for r in ROWS}
    else:
        got = {r.k for r in corpus.filter(e).collect()}
        rows = [dict(zip(("k", "s", "i", "arr"), r)) for r in ROWS]
        expect = {r["k"] for r in rows if ref_eval(r, col, op, value)}
    assert got == expect, (col, op, value, got, expect)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(op=st.sampled_from(["=", "<>", "<", ">", "<=", ">="]), value=INT_VALUES)
def test_int_comparisons(corpus, op, value):
    if value is None and op not in ("=", "<>"):
        value = 0
    run_case(corpus, "i", op, value)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    op=st.sampled_from(["=", "<>", "contains", "not contains", "startswith"]),
    value=STR_VALUES,
)
def test_string_ops(corpus, op, value):
    run_case(corpus, "s", op, value)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    op=st.sampled_from(["in", "not in"]),
    values=st.lists(INT_VALUES.filter(lambda v: v is not None), max_size=4),
)
def test_in_lists(corpus, op, values):
    run_case(corpus, "i", op, values)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    op=st.sampled_from(["between", "not between"]),
    lo=INT_VALUES.filter(lambda v: v is not None),
    hi=INT_VALUES.filter(lambda v: v is not None),
)
def test_between(corpus, op, lo, hi):
    run_case(corpus, "i", op, [lo, hi])


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(value=st.sampled_from(["a", "b", "c", "%", "_", "", "long", "zz"]))
def test_has(corpus, value):
    run_case(corpus, "arr", "has", value)


def test_split_param_postfix_property():
    """Property fuzz of the postfix router: for any param name (even one
    that itself ends in an operator-looking suffix) and any operator
    postfix, `<name>_<postfix>` resolves back to (name, op) — exact
    param-name matches always win over postfix interpretation, and
    longest postfix wins (`_not_in` over `_in`)."""
    import random

    from lakeapi_spark.operators.filters import POSTFIX_TO_OP, split_param_postfix

    rng = random.Random(7)
    bases = ["price", "ship_date", "price_gte", "a", "not_in", "x_lt_y"]
    postfixes = [p for p in POSTFIX_TO_OP if p]
    for _ in range(500):
        base = rng.choice(bases)
        post = rng.choice(postfixes)
        qname = f"{base}_{post}"
        # exact-match param shadows the postfix reading
        assert split_param_postfix(qname, [qname]) == (qname, "=")
        # postfix reading when only the base is declared
        got = split_param_postfix(qname, [base])
        assert got == (base, POSTFIX_TO_OP[post]), (qname, got)
        # longest-postfix precedence
        if not post.startswith("not_"):
            notq = f"{base}_not_{post}"
            if f"not_{post}" in POSTFIX_TO_OP:
                assert split_param_postfix(notq, [base]) == (
                    base,
                    POSTFIX_TO_OP[f"not_{post}"],
                ), notq
    import pytest as _pytest

    with _pytest.raises(KeyError):
        split_param_postfix("unknown_gte", ["price"])
