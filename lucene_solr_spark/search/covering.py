"""CoveringQuery — the lucene/sandbox per-document min-should-match.

Reference: lucene/sandbox/src/java/org/apache/lucene/sandbox/search/
CoveringQuery.java: a disjunction whose required clause count is not a
constant but a per-document LongValuesSource — doc X may need 1 match
while doc Y needs 3, read from doc values at scoring time.

Spark shape: the matched-clause count is one hash-agg over the
term-pruned postings; the per-doc threshold is a Column expression (or
a doc-values join); the filter compares the two. Scoring stays the
BM25 sum of the matched clauses, identical to BooleanQuery msm — only
the threshold source changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["covering_query"]


def covering_query(
    tables,
    terms: list,
    min_match_col: Column,
    score_df: DataFrame,
) -> DataFrame:
    """Filter ``score_df`` (per-doc BM25 sums over ``terms``) to docs
    whose matched-clause count reaches the PER-DOC threshold
    ``min_match_col`` (an expression over doc_id — the LongValuesSource
    analog). Returns (doc_id, n_matched, min_required, score)."""
    matched = (
        tables.postings.filter(F.col("term").isin(list(terms)))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").cast("long").alias("n_matched"))
    )
    out = (
        score_df.join(matched, "doc_id")
        .withColumn("min_required", min_match_col.cast("long"))
        .filter(F.col("n_matched") >= F.col("min_required"))
    )
    return out.select("doc_id", "n_matched", "min_required", "score")
