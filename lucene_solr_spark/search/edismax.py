"""ExtendedDisMax multi-field scoring (qf + tie).

The Solr edismax/dismax query parsers score each query term as a
DisjunctionMaxQuery over per-field TermQueries weighted by the ``qf``
field boosts, combined with the tieBreakerMultiplier, then sum the
per-term maxima across the query (reference solr/core/src/java/org/
apache/solr/search/ExtendedDismaxQParser.java:1262-1304 — per-word
DisMax over the qf fields; solr/core/.../search/DisMaxQParser.java:
158-186; lucene/core/.../search/DisjunctionMaxQuery.java).

score(doc) = Σ_term [ max_f(qf_f · bm25_f(term, doc))
                      + tie · (Σ_f − max_f) ]

Every field is its own index (its own df/avgdl/norms — exactly the
reference's per-field statistics). Plan shape: one scored posting
frame per field (broadcast weights + norm cache, same as bruteforce),
a union, and two hash-aggs (per-(doc, term) dismax, then per-doc sum)
— co-partitioned on doc_id, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import bm25
from .scoring import score_components

__all__ = ["edismax"]


def edismax(
    field_tables: dict,
    terms,
    qf: dict,
    tie: float = 0.0,
    k: int | None = 10,
    min_should_match: int | None = None,
    k1=bm25.K1,
    b=bm25.B,
    precision: str = "double",
) -> DataFrame:
    """Multi-field BM25 dismax. field_tables: {field: IndexTables};
    qf: {field: boost} (missing fields default 1.0).

    → DataFrame(doc_id long, score double|float) ordered by
    (score desc, doc_id asc); k=None returns every match unordered by
    rank but sorted stably for export."""
    frames = []
    spark = None
    for fname, tbl in field_tables.items():
        spark = tbl.postings.sparkSession
        boost = float(qf.get(fname, 1.0))
        weights_df, cache_df, n_present = score_components(
            spark, tbl, terms, boost, k1, b, precision
        )
        if n_present == 0:
            continue
        tf = F.col("freq").cast("double") / (
            F.col("freq").cast("double") + F.col("norm_val").cast("double")
        )
        if precision != "double":
            tf = tf.cast("float")
        scored = (
            tbl.postings.filter(F.col("term").isin(list(terms)))
            .join(F.broadcast(weights_df), "term")
        )
        if "norm_byte" not in tbl.postings.columns:
            scored = scored.join(
                tbl.norms.select("doc_id", "norm_byte"), "doc_id"
            )
        scored = scored.join(F.broadcast(cache_df), "norm_byte")
        frames.append(
            scored.select(
                "doc_id", "term",
                (F.col("weight") * tf).cast("double").alias("s"),
            )
        )
    num_type = "double" if precision == "double" else "float"
    if not frames:
        return field_tables[next(iter(field_tables))].postings.sparkSession \
            .createDataFrame([], f"doc_id long, score {num_type}")
    u = frames[0]
    for fr in frames[1:]:
        u = u.unionByName(fr)
    comb = u.groupBy("doc_id", "term").agg(
        (
            F.max("s")
            + F.lit(float(tie)) * (F.sum("s") - F.max("s"))
        ).alias("ts")
    )
    agg = comb.groupBy("doc_id").agg(
        F.sum("ts").alias("score"),
        F.count("*").alias("n_matched"),
    )
    if min_should_match:
        agg = agg.filter(F.col("n_matched") >= min_should_match)
    out = agg.select("doc_id", F.col("score").cast(num_type).alias("score"))
    out = out.orderBy(F.desc("score"), F.asc("doc_id"))
    return out.limit(k) if k is not None else out
