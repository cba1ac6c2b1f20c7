"""QueryAutoStopWordAnalyzer — index-frequency-derived query
stopwords (lucene/analysis/common/src/java/org/apache/lucene/
analysis/query/QueryAutoStopWordAnalyzer.java:118): a term is a stop
word when its document frequency exceeds ``maxDocFreq`` (absolute) or
``maxPercentDocs * numDocs`` (the float overload; default 0.4).
Query analysis then drops those terms (the wrapped analyzer chain's
StopFilter).

Spark-first design: the stopword set derives from the SAME dictionary
aggregate the index build already produces (df per term), so at
100 TB it is one partial-agg pass (or a free read of the index
dictionary) and the resulting small set broadcasts into query
analysis — no per-query index scan as in the reference's
TermsEnum walk.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["auto_stop_words", "filter_query_terms"]


def auto_stop_words(doc_terms: DataFrame, max_doc_freq: int = None,
                    max_percent_docs: float = None) -> DataFrame:
    """From a (doc_id, term) token stream, return (term, df) rows for
    terms whose df exceeds the absolute ``max_doc_freq`` — or the
    ``max_percent_docs`` fraction of corpus docs (reference default
    0.4) when given. Exactly one of the two must be set."""
    if (max_doc_freq is None) == (max_percent_docs is None):
        raise ValueError("set exactly one of max_doc_freq / "
                         "max_percent_docs")
    df = (doc_terms.select("doc_id", "term").distinct()
          .groupBy("term").agg(F.count("*").alias("df")))
    if max_percent_docs is not None:
        n_docs = doc_terms.select("doc_id").distinct().count()
        max_doc_freq = int(max_percent_docs * n_docs)
    return df.filter(F.col("df") > max_doc_freq)


def filter_query_terms(terms: Sequence[str],
                       stop_words: Sequence[str]) -> List[str]:
    """Apply the per-field stopword set to an analyzed query term
    list (QueryAutoStopWordAnalyzer.wrapComponents' StopFilter)."""
    sw = set(stop_words)
    return [t for t in terms if t not in sw]
