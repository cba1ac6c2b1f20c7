"""Score explanation: the IndexSearcher.explain / debugQuery analog.

The reference renders, per (query, doc), a tree of the BM25 factors —
``Explanation`` objects from ``BM25Similarity.explain``
(search/similarities/BM25Similarity.java:245-297: boost, idf with its
(docCount, docFreq) inputs, tf with its (freq, dl, avgdl) inputs) and
Solr surfaces it under debug=true (solr/core/.../util/SolrPluginUtils
doc-debug). A DataFrame engine's natural shape for the same information
is one ROW per (doc, term) with the factors as COLUMNS — joinable,
filterable, aggregable like everything else.

Columns: doc_id, term, freq, df, weight (boost*idf), dl (raw stored
token length; norm_val is computed from its one-byte quantization),
norm_val (k1*(1-b+b*qdl/avgdl)), tf_score (freq/(freq+norm_val)),
contribution (weight*tf_score). Sum of contribution over terms == the
engine's score for the doc (double pipeline; the float32 path is the
serving path, see gate.py docstring).

Scale shape: identical to one brute-force scoring pass — postings
semi-joined to the (broadcast) query terms, norms joined per surviving
doc; no extra shuffle vs scoring itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import bm25
from .scoring import score_components


def explain_scores(
    tables,
    terms,
    k1=bm25.K1,
    b=bm25.B,
    boost: float = 1.0,
    precision: str = "double",
) -> DataFrame:
    """Per-(doc, term) BM25 factor breakdown for every matching doc."""
    spark = tables.postings.sparkSession
    weights_df, cache_df, n_present = score_components(
        spark, tables, terms, boost, k1, b, precision
    )
    num_type = "double" if precision == "double" else "float"
    if n_present == 0:
        return spark.createDataFrame(
            [],
            f"doc_id long, term string, freq long, df long, weight {num_type},"
            f" dl int, norm_val {num_type}, tf_score {num_type},"
            f" contribution {num_type}",
        )
    tf = F.col("freq").cast("double") / (
        F.col("freq").cast("double") + F.col("norm_val").cast("double")
    )
    if precision != "double":
        tf = tf.cast("float")
    return (
        tables.postings.join(F.broadcast(weights_df), "term")
        .join(
            # prune the dictionary to the query terms BEFORE broadcasting
            # (the full dictionary is tens of GB at corpus scale)
            F.broadcast(
                tables.dictionary.select("term", "df").filter(
                    F.col("term").isin(list(dict.fromkeys(terms)))
                )
            ),
            "term",
        )
        .join(tables.norms.select("doc_id", "norm_byte", "dl"), "doc_id")
        .join(F.broadcast(cache_df), "norm_byte")
        .withColumn("tf_score", tf)
        .withColumn("contribution", F.col("weight") * F.col("tf_score"))
        .select(
            "doc_id",
            "term",
            F.col("freq").cast("long").alias("freq"),
            F.col("df").cast("long").alias("df"),
            "weight",
            F.col("dl").cast("int").alias("dl"),
            "norm_val",
            "tf_score",
            "contribution",
        )
    )
