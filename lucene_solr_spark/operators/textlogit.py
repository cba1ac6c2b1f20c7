"""Text logistic regression + feature selection over the inverted index.

Re-expresses the reference's ML-ish stream operators
(solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
TextLogitStream.java — iterative logistic regression where each
iteration ships the current weight vector to the shards and reduces the
per-shard gradients; FeaturesSelectionStream.java — pick the top
feature terms before training) as idiomatic Spark:

- features   = the engine's postings table (doc_id, term, freq) — the
  sparse doc-term matrix already materialized by the index build.
- selection  = top-N terms by document frequency within bounds (the
  reference scores terms with IGain on a train set; we use the same
  df-bounded top-N shape, deterministic tie-break term asc).
- one training iteration = broadcast join of the (small) weight vector
  against postings → per-doc margin (groupBy doc_id, sum) → sigmoid →
  per-term gradient (groupBy term, sum). Two narrow hash-aggs per
  iteration; ONLY the weight vector (≤ max_features + 1 doubles) ever
  reaches the driver, so the loop is cluster-safe at 100 TB: data
  never moves, the model does (exactly TextLogitStream's design).

Deterministic: fixed iterations / learning rate, and gradient sums are
order-independent by construction — per-doc errors are rounded to 12dp
and summed as DECIMAL (exact, commutative), the same pattern the
fn_eval_stats gate uses for its moment sums.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def select_features(
    tables, max_features: int = 50, min_df: int = 2, max_df_frac: float = 0.5
) -> DataFrame:
    """FeaturesSelectionStream analog: (term) top features by df within
    [min_df, max_df_frac * numDocs] — drops stopword-like and rare
    terms, deterministic order (df desc, term asc)."""
    num_docs = tables.max_doc  # precomputed at build — no count job
    return (
        tables.dictionary.filter(
            (F.col("df") >= min_df) & (F.col("df") <= max_df_frac * num_docs)
        )
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_features)
    )


def train_text_logit(
    tables,
    labels: DataFrame,
    max_features: int = 50,
    iterations: int = 10,
    learning_rate: float = 0.1,
) -> dict:
    """TextLogitStream analog. labels: (doc_id, label∈{0,1}).

    Returns {"weights": {term: w}, "bias": b, "terms": [...]} after
    `iterations` full-batch gradient steps on log-loss with binary
    presence features (the reference uses tf-scaled features per shard;
    presence keeps the oracle simple and the semantics identical in
    shape)."""
    feats = select_features(tables, max_features)
    terms = [r.term for r in feats.collect()]
    spark = tables.postings.sparkSession
    # doc-term presence matrix restricted to selected features
    x = (
        tables.postings.join(
            F.broadcast(spark.createDataFrame([(t,) for t in terms], "term string")),
            "term",
        )
        .select("doc_id", "term")
        .join(labels, "doc_id")
        .cache()
    )
    docs = labels.select("doc_id", "label").cache()
    try:
        n = docs.count()
        if n == 0:
            raise ValueError(
                "train_text_logit: labels is empty — need at least one "
                "labelled document to train"
            )
        w = {t: 0.0 for t in terms}
        b = 0.0
        for _ in range(iterations):
            wdf = F.broadcast(
                spark.createDataFrame(
                    [(t, w[t]) for t in terms], "term string, w double"
                )
            )
            margins = (
                x.join(wdf, "term")
                .groupBy("doc_id")
                .agg(F.sum("w").alias("dot"))
            )
            # err rounded to 12dp then summed as DECIMAL: the gradient is an
            # order-independent exact sum (same hazard-fix pattern as the
            # fn_eval_stats moment sums), so training is bit-reproducible
            # under any partitioning
            scored = (
                docs.join(margins, "doc_id", "left")
                .fillna({"dot": 0.0})
                .withColumn(
                    "p", F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("dot") + b)))
                )
                .withColumn(
                    "err",
                    F.round(F.col("p") - F.col("label"), 12).cast("decimal(28,12)"),
                )
            ).persist()
            try:
                # ONE action per iteration: the bias gradient rides the
                # same hash-agg as the term gradients via a synthetic
                # '__bias__' row per doc (Σ err over all docs), instead
                # of a second full scan of the scored frame; the DECIMAL
                # sum is order-independent so the fold is bit-identical
                grad_rows = (
                    x.join(scored.select("doc_id", "err"), "doc_id")
                    .select("term", "err")
                    .unionByName(
                        scored.select(
                            F.lit("__bias__").alias("term"), "err"
                        )
                    )
                    .groupBy("term")
                    .agg(F.sum("err").cast("double").alias("g"))
                    .collect()
                )
                grad = {r.term: r.g for r in grad_rows}
                bias_grad = float(grad.pop("__bias__", 0.0))
            finally:
                scored.unpersist()
            for t in terms:
                w[t] = round(w[t] - learning_rate * grad.get(t, 0.0) / n, 12)
            b = round(b - learning_rate * bias_grad / n, 12)
    finally:
        x.unpersist()
        docs.unpersist()
    return {"weights": w, "bias": b, "terms": terms}


def classify(tables, model: dict, threshold: float = 0.5) -> DataFrame:
    """(doc_id, prob, prediction) for every doc under a trained model —
    one broadcast join + hash-agg, fully distributed."""
    spark = tables.postings.sparkSession
    wdf = F.broadcast(
        spark.createDataFrame(
            [(t, wt) for t, wt in model["weights"].items()],
            "term string, w double",
        )
    )
    dots = (
        tables.postings.join(wdf, "term")
        .groupBy("doc_id")
        .agg(F.sum("w").alias("dot"))
    )
    return (
        tables.norms.select("doc_id")
        .join(dots, "doc_id", "left")
        .fillna({"dot": 0.0})
        .withColumn(
            "prob",
            F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("dot") + model["bias"]))),
        )
        .withColumn(
            "prediction", (F.col("prob") > threshold).cast("int")
        )
        .select("doc_id", "prob", "prediction")
    )
