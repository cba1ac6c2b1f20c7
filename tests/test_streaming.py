"""NRT incremental indexing (Structured Streaming foreachBatch).

Mirrors the reference's NRT reopen + TopicStream semantics: new batches
become new immutable segments; a reopened reader sees exactly the docs
indexed so far; restart resumes from the streaming checkpoint without
duplicating segments (UpdateLog/tlog-replay analog).
"""

import time

import pandas as pd
import pytest

from lucene_solr_spark.index.builder import transcripts_from_pandas
from lucene_solr_spark.streaming.incremental import start_incremental_index


def _mini_batch(conv_prefix: str, n: int, text: str) -> pd.DataFrame:
    rows = [
        (f"{conv_prefix}{i:04d}", 0, "user", f"{text} turn {i}", None)
        for i in range(n)
    ]
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.Timestamp("2026-01-01", tz="UTC")
    return df


def _wait(q, timeout=60):
    q.awaitTermination(timeout)


def test_incremental_segments_append_and_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    schema = transcripts_from_pandas(spark, _mini_batch("w", 1, "x")).schema

    # batch 1 lands before the stream starts (one file == one micro-batch)
    transcripts_from_pandas(spark, _mini_batch("conva", 20, "alpha common")).repartition(
        1
    ).write.mode("append").parquet(src)
    h = start_incremental_index(spark, src, idx, schema, analyzer="simple")
    _wait(h.query)
    h.stop()
    ms = h.manifests()
    assert len(ms) == 1 and h.max_doc() == 20

    # batch 2: new file, restart stream from checkpoint (availableNow)
    transcripts_from_pandas(spark, _mini_batch("convb", 15, "beta common")).repartition(
        1
    ).write.mode("append").parquet(src)
    h2 = start_incremental_index(spark, src, idx, schema, analyzer="simple")
    _wait(h2.query)
    h2.stop()
    ms2 = h2.manifests()
    assert len(ms2) == 2 and h2.max_doc() == 35
    # ids are stacked: second segment starts where the first ended
    assert ms2[1]["min_doc"] == 20 and ms2[1]["max_doc"] == 34

    # reader reopen sees both segments; postings are consistent
    postings = h2.postings(spark).toPandas()
    common = postings[postings["term"] == "common"]
    assert common["sum_freq"].sum() == 35
    alpha = postings[postings["term"] == "alpha"]
    assert alpha["sum_freq"].sum() == 20
    norms = h2.norms(spark).toPandas()
    assert len(norms) == 35 and norms["doc_id"].is_unique

    # restart with NO new data: checkpoint prevents re-indexing
    h3 = start_incremental_index(spark, src, idx, schema, analyzer="simple")
    _wait(h3.query)
    h3.stop()
    assert len(h3.manifests()) == 2 and h3.max_doc() == 35
