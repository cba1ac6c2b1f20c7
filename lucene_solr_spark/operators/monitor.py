"""Monitor / percolator: match stored queries against documents.

Re-expresses the reference monitor module (lucene/monitor/src/java/org/
apache/lucene/monitor/Monitor.java — register queries once, then for
each incoming document report which queries match; QueryIndex prefilters
by the queries' terms before running them) as reverse-search DataFrame
algebra:

- registered queries = a tiny (query_id, term, prohibited) +
  (query_id, required) pair of tables (conjunctive / minShouldMatch
  term queries with optional MUST_NOT terms — the percolation
  workhorse).
- percolate = postings semi-joined to the broadcast query-term table
  (the QueryIndex prefilter analog: docs only meet queries whose terms
  they contain), then a (doc, query) distinct-term count compared to
  each query's required count, with prohibited-term hits vetoing the
  pair (ReqExclScorer in reverse). One shuffle, no per-query loop —
  10^6 registered queries percolate in the same two hash-aggs as 10.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def register_queries(
    spark, queries: Sequence[tuple]
) -> tuple[DataFrame, DataFrame]:
    """queries: [(query_id, [terms...], min_match or None=ALL)] or
    [(query_id, [terms...], min_match, [prohibited...])] →
    (query_terms(query_id, term, prohibited), query_req(query_id,
    required))."""
    term_rows, req_rows = [], []
    for q in queries:
        qid, terms, min_match = q[0], q[1], q[2]
        excluded = list(dict.fromkeys(q[3])) if len(q) > 3 else []
        uniq = list(dict.fromkeys(terms))
        if not uniq:
            # a term-less monitor query can never match anything — reject
            # loudly rather than silently registering a dead query
            # (reference monitor queries parse to MatchNoDocs the same way)
            raise ValueError(f"monitor query {qid!r} has no terms")
        overlap = set(uniq) & set(excluded)
        if overlap:
            # MUST ∩ MUST_NOT → MatchNoDocs (BooleanQuery.java:296)
            raise ValueError(
                f"monitor query {qid!r} requires and prohibits {overlap}"
            )
        for t in uniq:
            term_rows.append((qid, t, False))
        for t in excluded:
            term_rows.append((qid, t, True))
        req_rows.append(
            (qid, int(min_match) if min_match is not None else len(uniq))
        )
    return (
        spark.createDataFrame(
            term_rows, "query_id string, term string, prohibited boolean"
        ),
        spark.createDataFrame(req_rows, "query_id string, required int"),
    )


def percolate(
    postings, query_terms: DataFrame, query_req: DataFrame
) -> DataFrame:
    """(query_id, doc_id) — every (stored query, document) match.

    postings: a (doc_id, term, …) DataFrame, or any index-tables object
    exposing `.postings` (IndexTables / SegmentedIndex)."""
    postings = getattr(postings, "postings", postings)
    if "prohibited" not in query_terms.columns:
        query_terms = query_terms.withColumn("prohibited", F.lit(False))
    hits = (
        postings.select("doc_id", "term")
        .join(F.broadcast(query_terms), "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count_distinct(
                F.when(~F.col("prohibited"), F.col("term"))
            ).alias("n_matched"),
            F.max(F.col("prohibited").cast("int")).alias("n_vetoed"),
        )
    )
    return (
        hits.join(F.broadcast(query_req), "query_id")
        .filter(
            (F.col("n_matched") >= F.col("required"))
            & (F.col("n_vetoed") == 0)
        )
        .select("query_id", "doc_id")
    )
