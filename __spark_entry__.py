"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full inverted-index build + BM25 top-10 over a
                 transcript-shaped frame derived from sf0.001 documents.
queries()      — one entry per implemented operator (SURVEY.md §2),
                 callable(spark, sf_dir) → DataFrame.
oracle_sql()   — matching DuckDB SQL per query (see lucene_solr_spark/gate.py
                 for the cross-engine determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts → tokenize → per-partition segments
    (checkpointed) → salted merge → block-max WAND top-10 (Lucene-exact
    float32 BM25) → hits joined back to stored fields."""
    import tempfile

    from lucene_solr_spark.index.segments import build_segmented_index
    from lucene_solr_spark.search.wand import search_wand

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # deterministic transcript shape (conv of 8 turns per source group)
    transcripts = docs.select(
        F.concat(F.lit("conv"), F.lpad((F.col("doc_id") / 8).cast("long").cast("string"), 8, "0")).alias("conv_id"),
        (F.col("doc_id") % 8).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 3 == 0, "user")
        .when(F.col("doc_id") % 3 == 1, "assistant")
        .otherwise("tool")
        .alias("role"),
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 2, "search").alias("tool"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("doc_id"))).alias("ts"),
    )
    index_dir = tempfile.mkdtemp(prefix="lss_entry_index_")
    tables = build_segmented_index(
        transcripts, index_dir, num_segments=8, seg_group_size=2, n_buckets=8
    )
    hits = search_wand(tables, ["spark", "window", "merge"], "disjunctive", k=10)
    return hits.join(tables.stored, "doc_id").select(
        "doc_id", "score", "conv_id", "turn_idx", "role", "text"
    ).orderBy(F.desc("score"), F.asc("doc_id"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lucene_solr_spark import gate

    return dict(gate.QUERIES)


def oracle_sql() -> dict[str, str]:
    from lucene_solr_spark import gate

    return dict(gate.ORACLE_SQL)
