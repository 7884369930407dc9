"""SQL endpoint: validated pass-through to ``spark.sql`` (§2.8, §3.2).

The reference parses user SQL with sqlglot, whitelists the statement
node type (Select / Union / Intersect / Except / CTE -> anything else
is HTTP 400), extracts referenced table names from the AST, registers
only those configured tables, and executes the original SQL string
(endpoint/sql_endpoint.py:89-190).

sqlglot isn't available in this environment, so validation is a small
conservative lexer: strip comments/strings, require the first keyword
to be SELECT/WITH/VALUES-free read-only form, reject any write/DDL/meta
keyword anywhere at top level, and require balanced parens. Table
references are extracted from FROM/JOIN tokens for selective-register
semantics (the reference's security property: only configured,
non-ODBC tables are visible — sql_endpoint.py:15-43).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


class SqlValidationError(ValueError):
    """Maps to HTTP 400 in the service layer (ref sql_endpoint.py:118-124)."""


_STRING_OR_COMMENT = re.compile(
    r"""
    '(?:[^']|'')*'          # single-quoted string ('' escape)
  | "(?:[^"]|"")*"          # double-quoted identifier
  | `(?:[^`]|``)*`          # backtick identifier
  | --[^\n]*                # line comment
  | /\*.*?\*/               # block comment
    """,
    re.VERBOSE | re.DOTALL,
)

#: statement kinds the reference allows (sql_endpoint.py:118-124)
_ALLOWED_FIRST = {"select", "with"}

#: anything that mutates/escapes read-only semantics
_FORBIDDEN = {
    "insert", "update", "delete", "merge", "drop", "create", "alter",
    "truncate", "grant", "revoke", "set", "reset", "call", "copy",
    "attach", "detach", "use", "analyze", "vacuum", "optimize", "msck",
    "refresh", "cache", "uncache", "add", "describe", "show", "explain",
}

_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*")


def _scrub(sql: str) -> str:
    return _STRING_OR_COMMENT.sub(" '' ", sql)


def validate_sql(sql: str) -> None:
    """Raise SqlValidationError unless ``sql`` is a single read-only
    SELECT/UNION/INTERSECT/EXCEPT/CTE statement."""
    scrubbed = _scrub(sql)
    if scrubbed.count("(") != scrubbed.count(")"):
        raise SqlValidationError("unbalanced parentheses")
    # single statement: no interior semicolons (trailing one is ok)
    body = scrubbed.strip().rstrip(";")
    if ";" in body:
        raise SqlValidationError("multiple statements are not allowed")
    words = [w.lower() for w in _WORD.findall(body)]
    if not words or words[0] not in _ALLOWED_FIRST:
        raise SqlValidationError(
            "only SELECT / WITH (union/intersect/except) statements are allowed"
        )
    bad = _FORBIDDEN.intersection(words)
    if bad:
        raise SqlValidationError(f"forbidden keyword(s): {sorted(bad)}")


def referenced_tables(sql: str) -> set[str]:
    """Names appearing after FROM/JOIN (ref _register_tables,
    sql_endpoint.py:15-43 registers only referenced configured tables)."""
    body = _scrub(sql)
    names = set()
    for m in re.finditer(r"\b(?:from|join)\s+([A-Za-z_][A-Za-z0-9_.]*)", body, re.IGNORECASE):
        names.add(m.group(1).split(".")[0].lower())
    return names


def run_sql(
    spark: SparkSession,
    sql: str,
    allowed_tables: set[str] | None = None,
) -> DataFrame:
    """Validate, check table visibility, execute."""
    validate_sql(sql)
    if allowed_tables is not None:
        refs = referenced_tables(sql)
        # CTE names are legitimate "tables" — allow them
        ctes = {
            m.group(1).lower()
            for m in re.finditer(
                r"\b(?:with|,)\s*([A-Za-z_][A-Za-z0-9_]*)\s+as\s*\(", _scrub(sql), re.IGNORECASE
            )
        }
        unknown = refs - {t.lower() for t in allowed_tables} - ctes
        if unknown:
            raise SqlValidationError(f"unknown or unauthorized tables: {sorted(unknown)}")
    return spark.sql(sql)
