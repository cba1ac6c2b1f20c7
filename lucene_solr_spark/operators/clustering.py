"""Search-result clustering — the solr/contrib/clustering analog.

The reference's clustering contrib (Carrot2 engine,
solr/contrib/clustering/src/java/org/apache/solr/handler/clustering/
carrot2/CarrotClusteringEngine.java) groups the TOP-N search results
(never the corpus) into labelled clusters from their term vectors.

This module ships the same operator shape Spark-first:

- ``seeded_cluster_assign``: one-pass assignment of each result doc to
  its nearest seed doc by cosine over full term-frequency vectors.
  All sums are integer (tf · tf), so dot products and norms are exact
  BIGINT aggregations — order-independent with no DECIMAL quantization
  — and only the final cosine is floating point. This is the
  SQL-verifiable kernel; k-means-style refinement is this assignment
  iterated with recomputed centroids (the IVF trainer
  ``similarity.train_ivf_centroids`` is the dense-vector twin).
- ``cluster_labels``: top terms per cluster by summed tf — the Carrot2
  cluster-label analog.

Scale: the candidate set is a top-N (tiny); term vectors come from a
candidate-pruned postings join, seeds broadcast naturally. The corpus
outside the result window is never read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["seeded_cluster_assign", "cluster_labels"]


def _doc_vectors(tables, candidates: DataFrame) -> DataFrame:
    """(doc_id, term, freq) restricted to the candidate docs."""
    return (
        tables.postings.join(
            F.broadcast(candidates.select("doc_id").distinct()), "doc_id"
        )
        .select("doc_id", "term", F.col("freq").cast("long").alias("freq"))
    )


def seeded_cluster_assign(
    tables, candidates: DataFrame, seeds: list
) -> DataFrame:
    """Assign each candidate doc to the nearest seed doc by term-vector
    cosine (ties → smaller seed id). Returns (doc_id, seed, sim)."""
    dtf = _doc_vectors(tables, candidates)
    n2 = dtf.groupBy("doc_id").agg(
        F.sum(F.col("freq") * F.col("freq")).alias("n2")
    )
    sv = (
        dtf.filter(F.col("doc_id").isin(list(seeds)))
        .select(
            F.col("doc_id").alias("seed"),
            "term",
            F.col("freq").alias("sfreq"),
        )
    )
    sn2 = sv.groupBy("seed").agg(
        F.sum(F.col("sfreq") * F.col("sfreq")).alias("sn2")
    )
    dots = (
        dtf.join(F.broadcast(sv), "term")
        .groupBy("doc_id", "seed")
        .agg(F.sum(F.col("freq") * F.col("sfreq")).alias("dot"))
    )
    sim = F.round(
        F.col("dot")
        / F.sqrt((F.col("n2") * F.col("sn2")).cast("double")),
        6,
    )
    scored = (
        dots.join(n2, "doc_id")
        .join(F.broadcast(sn2), "seed")
        .select("doc_id", "seed", sim.alias("sim"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("sim"), F.asc("seed")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "seed", "sim")
    )


def cluster_labels(
    tables, assignment: DataFrame, top_terms: int = 3
) -> DataFrame:
    """Top terms per cluster by summed tf (ties → term asc) — the
    cluster-label step. Returns (seed, term, weight, pos)."""
    dtf = _doc_vectors(tables, assignment)
    agg = (
        dtf.join(assignment.select("doc_id", "seed"), "doc_id")
        .groupBy("seed", "term")
        .agg(F.sum("freq").cast("long").alias("weight"))
    )
    w = Window.partitionBy("seed").orderBy(
        F.desc("weight"), F.asc("term")
    )
    return (
        agg.withColumn("pos", F.row_number().over(w).cast("long"))
        .filter(F.col("pos") <= top_terms)
        .select("seed", "term", "weight", "pos")
    )
