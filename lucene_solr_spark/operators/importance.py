"""DSIR-style importance resampling for pretraining-data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
scores raw-corpus documents by how target-like their hashed n-gram
features are: log w(d) = Σ_features log(p_target(f) / p_raw(f)), then
resamples proportionally to w.  Pinned simplification implemented here
(documented, deterministic, SQL-mirrorable):

- features = unigram tokens (the engine's SQL-reproducible simple
  analyzer) rather than hashed bigram buckets;
- both distributions are add-k smoothed over the SHARED vocabulary
  (k=0.5, vocab = distinct raw-corpus terms);
- selection is deterministic top-fraction by log-weight (ties broken by
  doc id) instead of Gumbel-noise sampling, so both engines select the
  identical subset.

Scale shape: two partial+final term-count aggregations (target side
filtered before the shuffle), one broadcast-sized ratio table joined
onto the exploded token stream, one per-doc sum.  Per-token log ratios
are rounded to 12 dp and summed as DECIMAL(28,12) so the fold is
order-independent across engines (the ngram_lm_perplexity pattern).

The final top-fraction selection assigns the exact global rank with
the range-repartition + driver-prefix-sum pattern (index/docid.py) —
a distributed sort on (-log_importance, doc_id), never a partition-less
rank window — so the exact oracle-matching selection itself stays
parallel at 10^12 docs.  (A cheaper approximate alternative at that
scale: approxQuantile threshold + ``keep = log_importance >=
threshold``.)"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

__all__ = ["importance_weights"]


def importance_weights(
    df: DataFrame,
    target_pred: Column,
    k: float = 0.5,
    keep_frac: float = 0.25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_toks, log_importance, imp_rank, imp_keep): per-doc
    DSIR log-weight against the target subset ``target_pred`` selects
    inside the same frame, plus the deterministic top-``keep_frac``
    selection."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        target_pred.cast("int").alias("is_target"),
        F.explode(tokens_col(text_col)).alias("term"),
    )
    counts = toks.groupBy("term").agg(
        F.count("*").cast("long").alias("c_raw"),
        F.sum("is_target").cast("long").alias("c_tgt"),
    )
    tot = counts.agg(
        F.sum("c_raw").alias("t_raw"),
        F.sum("c_tgt").alias("t_tgt"),
        F.count("*").alias("vocab"),
    )
    ratios = counts.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(
            F.log(
                ((F.col("c_tgt") + F.lit(k))
                 / (F.col("t_tgt") + F.lit(k) * F.col("vocab")))
                / ((F.col("c_raw") + F.lit(k))
                   / (F.col("t_raw") + F.lit(k) * F.col("vocab")))
            ),
            12,
        ).cast("decimal(28,12)").alias("log_ratio"),
    )
    per_doc = (
        toks.join(F.broadcast(ratios), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            F.round(F.sum("log_ratio").cast("double"), 6)
              .alias("log_importance"),
        )
    )
    all_docs = (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .fillna({"n_toks": 0, "log_importance": 0.0})
    )
    n = all_docs.count()
    n_keep = int(-(-n * keep_frac // 1))  # ceil
    # global rank WITHOUT a partition-less window: range-repartition on
    # (-log_importance, doc_id) + driver prefix-sum of per-partition
    # counts (index/docid.py) — the distributed sort stays parallel at
    # any corpus size; rank = position + 1 in that total order
    from ..index.docid import with_doc_ids

    ranked = with_doc_ids(
        all_docs.withColumn("_neg_imp", -F.col("log_importance")),
        order_cols=("_neg_imp", "doc_id"),
        id_col="_rk0",
    )
    ranked = ranked.withColumn(
        "imp_rank", (F.col("_rk0") + 1).cast("long")
    ).drop("_neg_imp", "_rk0")
    return ranked.withColumn(
        "imp_keep", (F.col("imp_rank") <= n_keep).cast("int")
    )
