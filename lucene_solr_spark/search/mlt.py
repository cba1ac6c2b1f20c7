"""MoreLikeThis: interesting-term selection + similar-doc retrieval.

Re-expresses the reference MLT query builder
(lucene/queries/src/java/org/apache/lucene/queries/mlt/MoreLikeThis.java)
as DataFrame ops over the engine's index tables:

- term selection = per-term ``tf * idf`` over the source document with
  the reference's default gates ``minTermFreq=2`` / ``minDocFreq=5`` /
  ``maxQueryTerms=25`` (MoreLikeThis.java:143-170,616-660), idf from
  ClassicSimilarity: ``ln(numDocs/(df+1)) + 1`` (MoreLikeThis.java:640;
  search/similarities/ClassicSimilarity.java idf).
- retrieval = disjunctive query over the selected terms; here ranked by
  shared-term overlap (deterministic integer scoring; the BM25-scored
  path composes via search_bruteforce/search_wand on the same term list).

Scale shape: the source-doc tf lookup is a broadcast-size single-doc
slice; the candidate scan is one semi-join of postings against ≤25
terms — Catalyst broadcasts the term list, so no wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mlt_terms(
    tables,
    doc_id: int,
    min_tf: int = 2,
    min_df: int = 5,
    max_terms: int = 25,
) -> DataFrame:
    """(term, tf, df, mlt_score) — top interesting terms of one doc,
    ordered by mlt_score desc then term asc (PQ tie-break analog)."""
    num_docs = tables.max_doc  # precomputed at build — no count job
    src = tables.postings.filter(F.col("doc_id") == doc_id).select(
        "term", F.col("freq").alias("tf")
    )
    # broadcast the single-doc slice (<= doc-length rows), never the
    # dictionary: at 10^8-10^9 terms the dictionary is tens of GB
    scored = (
        tables.dictionary.select("term", "df").join(F.broadcast(src), "term")
        .filter((F.col("tf") >= min_tf) & (F.col("df") >= min_df))
        .withColumn(
            "mlt_score",
            F.round(
                F.col("tf")
                * (F.log(F.lit(float(num_docs)) / (F.col("df") + 1.0)) + 1.0),
                4,
            ),
        )
    )
    return scored.orderBy(
        F.desc("mlt_score"), F.asc("term")
    ).limit(max_terms)


def more_like_this(
    tables,
    doc_id: int,
    k: int = 10,
    min_tf: int = 2,
    min_df: int = 5,
    max_terms: int = 10,
) -> DataFrame:
    """(doc_id, overlap) — top-k other docs by number of shared
    interesting terms, tie-broken by doc_id asc."""
    terms = mlt_terms(tables, doc_id, min_tf, min_df, max_terms).select("term")
    return (
        tables.postings.join(F.broadcast(terms), "term")
        .filter(F.col("doc_id") != doc_id)
        .groupBy("doc_id")
        .agg(F.count("*").alias("overlap"))
        .orderBy(F.desc("overlap"), F.asc("doc_id"))
        .limit(k)
    )
