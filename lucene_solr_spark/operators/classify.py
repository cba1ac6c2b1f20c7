"""Naive Bayes text classification over the inverted index.

Re-expresses the reference classification module's
SimpleNaiveBayesClassifier (lucene/classification/src/java/org/apache/
lucene/classification/SimpleNaiveBayesClassifier.java: class score =
log prior + Σ_t tf(t,d) · log P(t|c), Laplace-smoothed
P(t|c) = (tf(t,c)+1)/(tf(c)+|V|)) as pure DataFrame algebra:

- train = two hash-aggs over postings ⨝ labels (class priors,
  per-(class, term) counts) — map-side partial aggregation, one shuffle
  each, no iteration (contrast TextLogitStream in textlogit.py).
- classify = postings × classes (a |C|-row broadcast) left-joined to the
  trained counts, per-(doc, class) DECIMAL-summed contributions, argmax
  by window rank. Everything JVM-side; no UDFs.

Cross-engine determinism: each term contribution is rounded to 9dp and
summed as DECIMAL (exact, order-independent), then the prior is added
and the total rounded — the same pattern as the fn_eval_stats moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def train_naive_bayes(tables, labels: DataFrame) -> dict:
    """labels: (doc_id, label). Returns the model as small DataFrames:
    priors (label, n_docs, log_prior, class_tf), term_class
    (label, term, cnt), and vocab_size."""
    vocab_size = tables.dictionary.count()
    n_total = labels.count()
    joined = tables.postings.join(labels, "doc_id")
    term_class = joined.groupBy("label", "term").agg(
        F.sum("freq").alias("cnt")
    )
    priors = (
        joined.groupBy("label")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("freq").alias("class_tf"),
        )
        .withColumn("log_prior", F.log(F.col("n_docs") / F.lit(float(n_total))))
    )
    return {
        "priors": priors,
        "term_class": term_class,
        "vocab_size": vocab_size,
    }


def classify_naive_bayes(
    tables, model: dict, doc_filter=None
) -> DataFrame:
    """(doc_id, label, score) — the argmax class per doc with its
    rounded log-score; ties broken label asc (deterministic).

    doc_filter: optional Column predicate over ``doc_id`` only (it is
    applied to both the postings and the norms doc universe)."""
    postings = tables.postings
    if doc_filter is not None:
        postings = postings.filter(doc_filter)
    v = float(model["vocab_size"])
    classes = F.broadcast(
        model["priors"].select("label", "log_prior", "class_tf")
    )
    tc = model["term_class"]
    # every (doc-term, class) pair; unseen terms fall back to the
    # smoothed zero count via coalesce. term_class is |C|x|V| rows —
    # NOT force-broadcast (tens of GB at corpus scale); Catalyst picks
    # broadcast on its own when the model is small
    contrib = (
        postings.select("doc_id", "term", "freq")
        .crossJoin(classes)
        .join(tc, ["label", "term"], "left")
        .withColumn(
            "contrib",
            F.round(
                F.col("freq")
                * F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)
                    / (F.col("class_tf") + F.lit(v))
                ),
                9,
            ).cast("decimal(28,9)"),
        )
    )
    scored = (
        contrib.groupBy("doc_id", "label")
        .agg(
            F.round(
                F.first("log_prior") + F.sum("contrib").cast("double"), 4
            ).alias("score")
        )
    )
    # SimpleNaiveBayesClassifier still assigns the argmax-prior class to
    # a document with no indexed terms — docs absent from postings get a
    # prior-only score row (anti-join against norms, which lists every doc)
    all_docs = tables.norms.select("doc_id").distinct()
    if doc_filter is not None:
        all_docs = all_docs.filter(doc_filter)
    termless = all_docs.join(
        postings.select("doc_id").distinct(), "doc_id", "left_anti"
    ).crossJoin(classes).select(
        "doc_id", "label", F.round(F.col("log_prior"), 4).alias("score")
    )
    scored = scored.unionByName(termless)
    best = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("label"))
    )
    return (
        scored.withColumn("rk", best)
        .filter(F.col("rk") == 1)
        .select("doc_id", "label", "score")
    )
