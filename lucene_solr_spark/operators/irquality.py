"""TREC-style retrieval-quality evaluation (lucene/benchmark quality).

The reference's quality harness replays judged queries against the
index and folds each ranked result list into a QualityStats object:
precision at rank cutoffs, recall vs the judgment pool, average
precision over recall points, and MRR credited only when the first
relevant hit lands in the top 5 (lucene/benchmark/src/java/org/apache/
lucene/benchmark/quality/QualityStats.java:80-130 addResult —
pReleventSum accumulates numGood/rank at each relevant hit, mrr is set
iff the FIRST relevant point has rank <= 5; getPrecisionAt:108-116
extends P@n past the retrieved depth as numGood/n; Judge pool =
TrecJudge.java).

Spark-first shape: the run is a (qid, doc_id, rank) relation — any
ranked retrieval output — and judgments are (qid, doc_id) pairs; all
metrics reduce to one rank-ordered window cumsum plus one hash-agg per
query, so a million-query sweep is a single shuffle on qid with ~k
rows per group. No collect, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["quality_stats"]


def quality_stats(
    run: DataFrame,
    judgments: DataFrame,
    cutoffs=(5, 10, 20),
    mrr_cut: int = 5,
) -> DataFrame:
    """Per-query QualityStats over a ranked ``run`` (qid, doc_id, rank
    — rank 1-based, gapless per qid) judged against ``judgments``
    (qid, doc_id — the relevant pool; maxGoodPoints = pool size).

    → (qid, num_ret, num_good, max_good, recall, avp, mrr,
       p_at_<c>...) one row per qid present in the run."""
    rel = judgments.select("qid", "doc_id").withColumn(
        "is_rel", F.lit(1)
    )
    max_good = judgments.groupBy("qid").agg(
        F.count("*").alias("max_good")
    )

    j = (
        run.select("qid", "doc_id", "rank")
        .join(rel, ["qid", "doc_id"], "left")
        .withColumn("is_rel", F.coalesce("is_rel", F.lit(0)))
    )
    w = Window.partitionBy("qid").orderBy("rank")
    c = j.withColumn("cum_good", F.sum("is_rel").over(w))

    aggs = [
        F.max("rank").alias("num_ret"),
        F.sum("is_rel").alias("num_good"),
        F.min(F.when(F.col("is_rel") == 1, F.col("rank"))).alias(
            "first_rel"
        ),
        F.sum(
            F.when(
                F.col("is_rel") == 1,
                F.col("cum_good").cast("double") / F.col("rank"),
            )
        ).alias("p_sum"),
    ]
    for cut in cutoffs:
        aggs.append(
            (
                F.sum(
                    F.when(F.col("rank") <= cut, F.col("is_rel")).otherwise(
                        0
                    )
                ).cast("double")
                / cut
            ).alias(f"p_at_{cut}")
        )
    m = c.groupBy("qid").agg(*aggs)

    out = m.join(max_good, "qid", "left").select(
        "qid",
        "num_ret",
        "num_good",
        F.coalesce("max_good", F.lit(0)).alias("max_good"),
        # recall: numGood/maxGood; with an empty pool the reference
        # falls back to running precision numGood/numPoints (:99)
        F.when(
            F.coalesce("max_good", F.lit(0)) > 0,
            F.col("num_good").cast("double") / F.col("max_good"),
        )
        .otherwise(
            F.col("num_good").cast("double") / F.col("num_ret")
        )
        .alias("recall"),
        # getAvp: pReleventSum / maxGoodPoints, 0 on empty pool (:122)
        F.when(
            F.coalesce("max_good", F.lit(0)) > 0,
            F.coalesce("p_sum", F.lit(0.0)) / F.col("max_good"),
        )
        .otherwise(F.lit(0.0))
        .alias("avp"),
        # mrr only when the first relevant hit is within the top 5 (:88)
        F.when(
            F.col("first_rel") <= mrr_cut,
            F.lit(1.0) / F.col("first_rel"),
        )
        .otherwise(F.lit(0.0))
        .alias("mrr"),
        *[f"p_at_{cut}" for cut in cutoffs],
    )
    return out.orderBy("qid")
