"""Validated SQL endpoint (SURVEY §2.8, §3.2)."""

from lakeapi_spark.sql.endpoint import SqlValidationError, run_sql, validate_sql

__all__ = ["SqlValidationError", "run_sql", "validate_sql"]
