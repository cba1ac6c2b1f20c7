"""Near-real-time incremental indexing via Structured Streaming.

The reference is batch + NRT: new docs become visible by reopening a
searcher over newly flushed segments (index/ControlledRealTimeReopenThread.java,
search/SearcherManager.java), TopicStream consumes newly indexed docs
checkpointed by version (solr/solrj/.../io/stream/TopicStream.java), and
DaemonStream re-executes continuously (DaemonStream.java). The Spark
re-expression:

- ``readStream`` over the transcript table directory (new files = new
  docs, the micro-batch analog of an update batch),
- ``foreachBatch``: each micro-batch builds ONE new immutable segment
  (same per-partition build + manifest commit as the batch path) with a
  doc-id range stacked after all previous segments — segments are
  append-only, exactly Lucene's flush model,
- searchers reopen by re-globbing ``segments/*`` — the SearcherManager
  analog; Spark's streaming checkpoint dir provides exactly-once batch
  tracking (the UpdateLog/tlog-replay analog, UpdateLog.java:96-100).

Doc-id rule: batch docs are ordered by (conv_id, turn_idx) *within the
batch* and appended after max_doc of the index so far — matching
Lucene's "docIDs are assigned in ingestion order" (not globally
re-sorted; a restart replays from the checkpoint so ids stay stable).

At scale each micro-batch is itself partitioned (one segment per
partition per batch if desired); a background merge job compacts small
segments exactly like TieredMergePolicy — here merge_segments re-run on
the accumulated segment set.
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.builder import tokenize_udf, simple_tokens
from ..index.segments import _segment_postings

__all__ = ["start_incremental_index", "IncrementalIndex"]


class IncrementalIndex:
    """Handle over an append-only segment directory + streaming query."""

    def __init__(self, index_dir: str, query):
        self.index_dir = index_dir
        self.query = query

    def manifests(self) -> list:
        out = []
        seg_root = f"{self.index_dir}/segments"
        if not os.path.isdir(seg_root):
            return out
        for seg in sorted(os.listdir(seg_root)):
            mp = f"{seg_root}/{seg}/manifest.json"
            if os.path.exists(mp):
                with open(mp) as f:
                    out.append(json.load(f))
        return out

    def max_doc(self) -> int:
        return sum(m["n_docs"] for m in self.manifests())

    def postings(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(f"{self.index_dir}/segments/*/postings.parquet")

    def norms(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(f"{self.index_dir}/segments/*/norms.parquet")

    def stop(self):
        if self.query is not None:
            self.query.stop()


def _next_seg_id(seg_root: str) -> int:
    if not os.path.isdir(seg_root):
        return 0
    ids = [
        int(s.split("-")[1])
        for s in os.listdir(seg_root)
        if s.startswith("seg-") and os.path.exists(f"{seg_root}/{s}/manifest.json")
    ]
    return (max(ids) + 1) if ids else 0


def start_incremental_index(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    schema,
    analyzer: str = "standard",
    checkpoint_dir: str | None = None,
) -> IncrementalIndex:
    """Stream-parquet ``source_dir`` → one segment per micro-batch under
    ``index_dir/segments``. Returns a handle; caller stops the query."""
    os.makedirs(f"{index_dir}/segments", exist_ok=True)
    checkpoint_dir = checkpoint_dir or f"{index_dir}/_checkpoint"

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int):
        import pyarrow as pa
        import pyarrow.parquet as pq

        t0 = time.time()
        seg_root = f"{index_dir}/segments"
        seg_id = _next_seg_id(seg_root)
        seg_dir = f"{seg_root}/seg-{seg_id:05d}"
        if analyzer == "simple":
            toks = batch_df.withColumn("tokens", simple_tokens("text"))
        else:
            toks = batch_df.withColumn("tokens", tokenize_udf(F.col("text")))
        pdf = (
            toks.select("conv_id", "turn_idx", "tokens")
            .toPandas()
            .sort_values(["conv_id", "turn_idx"], kind="mergesort", ignore_index=True)
        )
        if len(pdf) == 0:
            return
        base = sum(
            json.load(open(f"{seg_root}/{s}/manifest.json"))["n_docs"]
            for s in sorted(os.listdir(seg_root))
            if os.path.exists(f"{seg_root}/{s}/manifest.json")
        )
        pdf["doc_id"] = range(base, base + len(pdf))
        postings, norms, counters = _segment_postings(
            pdf[["doc_id", "tokens"]], seg_id
        )
        os.makedirs(seg_dir, exist_ok=True)
        for name, frame in (("postings", postings), ("norms", norms)):
            tmp = f"{seg_dir}/.{name}.parquet.tmp"
            pq.write_table(pa.Table.from_pandas(frame, preserve_index=False), tmp)
            os.replace(tmp, f"{seg_dir}/{name}.parquet")
        m = {
            "seg_id": seg_id,
            "n_docs": int(len(pdf)),
            "doc_count": counters["doc_count"],
            "sum_ttf": counters["sum_ttf"],
            "n_terms": counters["n_terms"],
            "n_postings": counters["n_postings"],
            "posting_bytes": 0,
            "min_doc": int(base),
            "max_doc": int(base + len(pdf) - 1),
            "wall_sec": time.time() - t0,
            "resumed": False,
            "batch_id": int(batch_id),
        }
        tmp = f"{seg_dir}/.manifest.json.tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, f"{seg_dir}/manifest.json")  # commit point

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return IncrementalIndex(index_dir, query)
