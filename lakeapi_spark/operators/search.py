"""Full-text search scorer (§2.10).

The reference has two paths:
- DuckDB: persisted FTS index + BM25 ``match_bm25`` (df_duckdb.py:321-379)
- portable (polars & others): per-space-separated-term
  ``CASE WHEN concat(cols) LIKE '%term%' THEN 1 ELSE 0 END`` summed,
  ``NULLIF(sum, 0)``, rows with NULL score dropped, ordered score desc
  (df_base.py:354-377; contract tests tests/test_search.py:11-35:
  descending scores + each hit matches >= 1 term).

Parity target is the portable scorer (SURVEY §2.10). We add a TF-IDF
style scorer as the scale extension: tokenize -> explode -> join against
a broadcast term list -> aggregate, which is how you'd score 100 TB of
documents without a LIKE scan per term.

Minimum search length is 3 chars (ref core/config.py:76).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MIN_SEARCH_LENGTH = 3


class SearchTooShortError(ValueError):
    pass


def _terms(text: str) -> list[str]:
    if len(text) < MIN_SEARCH_LENGTH:
        raise SearchTooShortError(f"search text must be >= {MIN_SEARCH_LENGTH} chars")
    return [t for t in text.split(" ") if t]


def search_score_expr(columns: list[str], search_text: str) -> Column:
    """Portable scorer: NULLIF(sum_of_term_hits, 0) over lower(concat(cols)).

    Mirrors df_base.py:354-377 including the lower() on both sides and
    space-tokenization of the search text.
    """
    haystack = F.lower(F.concat_ws(" ", *[F.col(c) for c in columns]))
    score = None
    for term in _terms(search_text):
        hit = F.when(haystack.like(f"%{term.lower()}%"), F.lit(1)).otherwise(F.lit(0))
        score = hit if score is None else (score + hit)
    assert score is not None
    return F.nullif(score, F.lit(0))


def search(
    df: DataFrame, columns: list[str], search_text: str, score_col: str = "search_score"
) -> DataFrame:
    """WHERE score IS NOT NULL ORDER BY score DESC (endpoint_search.py:56-59)."""
    return (
        df.withColumn(score_col, search_score_expr(columns, search_text))
        .filter(F.col(score_col).isNotNull())
        .orderBy(F.col(score_col).desc())
    )


def tf_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    search_text: str,
    score_col: str = "search_score",
) -> DataFrame:
    """Scale-path scorer: term-frequency sum over tokenized text.

    tokenize -> explode -> semi-join the (tiny, broadcast) term set ->
    count per doc. One shuffle (the groupBy on id), no per-term LIKE
    scans; at 100 TB the explode+filter runs map-side and the aggregate
    is partial (map-side combine) before the shuffle.
    """
    terms = [t.lower() for t in _terms(search_text)]
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("__tok"),
    ).filter(F.col("__tok").isin(terms))
    scores = tok.groupBy(id_col).agg(F.count("*").alias(score_col))
    return (
        df.join(scores, on=id_col, how="inner")
        .orderBy(F.col(score_col).desc(), F.col(id_col))
    )
