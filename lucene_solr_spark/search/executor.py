"""Parsed-query execution: boolean clauses + phrase clauses, combined.

The query-lifecycle glue (reference: search/IndexSearcher.java:533-613 —
createWeight → per-segment scorers → TopDocs merge; clause wiring
search/Boolean2ScorerSupplier.java:106-174):

- term clauses score via the exact-BM25 brute-force scorer over the flat
  index tables (SQL-oracle-reproducible in double precision),
- phrase clauses ("…" / "…"~n) are REQUIRED and score via the positional
  segmented index (search/phrase.py),
- must_not excludes via anti-join (ReqExclScorer),
- with required phrases present, disjunctive term clauses become
  OPTIONAL score contributions on the phrase-matching docs — exactly
  ReqOptSumScorer (reference search/ReqOptSumScorer.java); conjunctive
  term clauses intersect (ConjunctionScorer),
- total score = Σ clause scores, ordered (score desc, doc_id asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bruteforce import search_bruteforce
from .phrase import search_phrase
from .queryparser import ParsedQuery, parse_query

__all__ = ["execute_parsed"]


def execute_parsed(
    q: str | ParsedQuery,
    tables,
    pos_index=None,
    k: int | None = 10,
    precision: str = "float32",
    analyzer=None,
) -> DataFrame:
    """Run a classic query string end-to-end.

    tables: flat IndexTables (term scoring + must_not).
    pos_index: positional SegmentedIndex — required iff the query has
    phrase clauses.
    Returns DataFrame(doc_id long, score float|double) ordered by
    (score desc, doc_id asc), limited to k (k=None: all matches).
    """
    p = parse_query(q, analyzer) if isinstance(q, str) else q
    spark = tables.postings.sparkSession
    score_type = "double" if precision == "double" else "float"
    empty = spark.createDataFrame([], f"doc_id long, score {score_type}")
    if p.is_match_none():
        return empty
    if p.phrases and pos_index is None:
        raise ValueError("query has phrase clauses but no pos_index given")
    if not p.phrases and not p.terms:
        return empty

    boosts = {t: b for t, b in (p.must + p.should)}
    term_scores = None
    if p.terms:
        term_scores = search_bruteforce(
            tables, p.terms, mode=p.mode, k=None, boost=boosts,
            precision=precision,
        ).select("doc_id", "score")

    phrase_scores = None
    for words, slop in p.phrases:
        ph = search_phrase(
            pos_index, words, slop=slop, k=None, precision=precision
        ).select("doc_id", F.col("score").alias("ph_score"))
        if phrase_scores is None:
            phrase_scores = ph
        else:  # all phrases REQUIRED: intersect, sum scores
            phrase_scores = (
                phrase_scores.join(ph.withColumnRenamed("ph_score", "s2"),
                                   "doc_id")
                .select(
                    "doc_id",
                    (F.col("ph_score") + F.col("s2")).alias("ph_score"),
                )
            )

    if phrase_scores is None:
        combined = term_scores
    elif term_scores is None:
        combined = phrase_scores.select(
            "doc_id", F.col("ph_score").alias("score")
        )
    elif p.mode == "conjunctive":
        combined = phrase_scores.join(term_scores, "doc_id").select(
            "doc_id", (F.col("ph_score") + F.col("score")).alias("score")
        )
    else:  # ReqOptSumScorer: phrases required, term scores optional
        combined = phrase_scores.join(term_scores, "doc_id", "left").select(
            "doc_id",
            (
                F.col("ph_score")
                + F.coalesce(F.col("score"), F.lit(0.0).cast(score_type))
            ).alias("score"),
        )

    if p.exclude:
        excl = tables.postings.filter(
            tables.postings.term.isin(list(p.exclude))
        ).select("doc_id").distinct()
        combined = combined.join(excl, "doc_id", "left_anti")

    combined = combined.select(
        "doc_id", F.col("score").cast(score_type).alias("score")
    ).orderBy(F.desc("score"), F.asc("doc_id"))
    return combined.limit(k) if k is not None else combined
