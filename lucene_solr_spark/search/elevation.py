"""Query elevation — the Solr QueryElevationComponent analog.

Reference: solr/core/src/java/org/apache/solr/handler/component/
QueryElevationComponent.java: an editorial map (query → ordered doc
ids, optional excludes) pins the listed docs to the top of the result
in elevation order; excluded docs vanish; everything else keeps its
organic ranking below the pinned block.

Spark shape: the elevation list is a per-query constant (a few ids),
so the pin rank is a pure CASE/array_position Column over the organic
result — no join, no extra shuffle beyond the existing top-k sort."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["elevate"]


def elevate(
    results: DataFrame,
    elevated: list,
    excluded: list | None = None,
    k: int = 10,
) -> DataFrame:
    """Apply an elevation entry to an organic (doc_id, score) result.

    Returns the top-k with ``elev_pos`` (1-based pin position, 0 for
    organic rows) and ``rank`` (final 1-based rank) — pinned docs
    first in elevation order, organic rows after by score desc /
    doc_id asc (HitQueue tie-break), excluded docs dropped
    (markExcludes=false semantics: they simply disappear)."""
    out = results
    if excluded:
        out = out.filter(~F.col("doc_id").isin(list(excluded)))
    pos = F.array_position(
        F.array(*[F.lit(d) for d in elevated]), F.col("doc_id")
    ).cast("long")
    sort_grp = F.when(pos > 0, pos).otherwise(F.lit(len(elevated) + 1))
    out = out.withColumn("elev_pos", pos).withColumn("_grp", sort_grp)
    # the expensive cut is a plain global top-k — orderBy().limit(k)
    # compiles to TakeOrderedAndProject (per-partition top-k + tiny
    # merge); the rank window then runs over the k surviving rows
    # only (bounded by the GlobalLimit — the TopDocs.merge tiny-merge)
    topk = out.orderBy(
        F.asc("_grp"), F.desc("score"), F.asc("doc_id")
    ).limit(k)
    w = Window.orderBy(
        F.asc("_grp"), F.desc("score"), F.asc("doc_id")
    )
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("long"))
        .drop("_grp")
        .orderBy("rank")
    )
