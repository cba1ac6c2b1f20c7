"""Learning-to-rank rerank — the solr/contrib/ltr analog.

Reference: solr/contrib/ltr/src/java/org/apache/solr/ltr/model/
LinearModel.java (score = Σ w_i · f_i over named features),
feature/FieldLengthFeature.java + feature/SolrFeature.java (per-doc
feature extraction at rerank time), and LTRQParserPlugin's
``reRankDocs`` contract: only the top-N first-pass candidates are
rescored — nothing outside the candidate window is touched.

Spark shape: the candidate set is tiny (reRankDocs ≤ a few hundred),
so features come from one term-pruned aggregation over the candidates'
postings plus a join against the norms table, and the model is a pure
Column expression. At 100 TB the posting scan is partition-pruned to
the query's terms exactly like the first-pass search; the rerank
itself never sees the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ltr_features", "linear_model", "ltr_rerank"]


def ltr_features(tables, terms, candidates: DataFrame) -> DataFrame:
    """Per-candidate feature columns:

    - ``f_bm25``   : first-pass score (from ``candidates.score``)
    - ``n_matched``: distinct query terms present (SolrFeature on the
      term filter)
    - ``max_tf``   : max term frequency over the query terms
    - ``dl``       : document length (FieldLengthFeature)
    """
    p = tables.postings.filter(F.col("term").isin(list(terms)))
    feats = p.groupBy("doc_id").agg(
        F.count_distinct("term").cast("long").alias("n_matched"),
        F.max("freq").cast("long").alias("max_tf"),
    )
    return (
        candidates.select("doc_id", F.col("score").alias("f_bm25"))
        .join(feats, "doc_id")
        .join(tables.norms.select("doc_id", "dl"), "doc_id")
        .withColumn("dl", F.col("dl").cast("long"))
    )


def linear_model(weights: dict) -> Column:
    """LinearModel.java: Σ w_i · f_i over feature columns."""
    out = F.lit(0.0)
    for name, w in weights.items():
        out = out + F.lit(float(w)) * F.col(name).cast("double")
    return out


def ltr_rerank(
    tables,
    terms,
    candidates: DataFrame,
    weights: dict,
    k: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Rescore the first-pass candidates with a linear LTR model and
    return the top-k (score desc, doc_id asc — HitQueue tie-break)."""
    f = ltr_features(tables, terms, candidates)
    score = linear_model(weights)
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        f.withColumn("ltr_score", score)
        .orderBy(F.desc("ltr_score"), F.asc("doc_id"))
        .limit(k)
    )
