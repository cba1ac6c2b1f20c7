"""Atomic snapshot publish (the SegmentInfos / commit-point analog).

Reference behavior being matched: Lucene readers open the highest
``segments_N`` generation and never see files a generation doesn't
reference (index/SegmentInfos.java, IndexWriter.java commitInternal) —
a killed merge or crashed flush is invisible until its commit point.
"""

import json
import os
import shutil

import pytest

from lucene_solr_spark.index.segments import (
    build_segmented_index,
    read_segmented_index,
)
from lucene_solr_spark.index.snapshot import (
    commit_snapshot,
    committed_segments,
    latest_snapshot,
    merged_dir_name,
)
from lucene_solr_spark.search.wand import search_wand
from lucene_solr_spark.sources.synth import synth_transcripts


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("snapidx"))
    corpus = synth_transcripts(spark, 400)
    tables = build_segmented_index(
        corpus, idx, num_segments=4, seg_group_size=2, n_buckets=8
    )
    return idx, tables


def _top10(tables):
    return [
        (r.doc_id, r.score)
        for r in search_wand(tables, ["spark", "merge"], "disjunctive", k=10)
        .orderBy("score", ascending=False)
        .collect()
    ]


def test_build_publishes_generation_zero(built):
    idx, _ = built
    snap = latest_snapshot(idx)
    assert snap is not None and snap["generation"] == 0
    assert snap["merged"] == merged_dir_name(0)
    assert snap["segments"] == committed_segments(idx)
    assert snap["stats"]["max_doc"] == 400


def test_killed_merge_is_invisible(spark, built):
    """A merge that died mid-write leaves an unreferenced merged-<gen+1>
    dir; readers still resolve the last committed generation."""
    idx, tables = built
    before = _top10(tables)
    # simulate the wreckage of a killed merge: partial parquet garbage
    # in the NEXT generation's directory, no snapshot commit
    wreck = f"{idx}/{merged_dir_name(1)}/postings/term_bucket=0"
    os.makedirs(wreck, exist_ok=True)
    with open(f"{wreck}/part-00000.parquet", "wb") as f:
        f.write(b"NOT A PARQUET FILE")
    reopened = read_segmented_index(spark, idx)
    assert _top10(reopened) == before
    shutil.rmtree(f"{idx}/{merged_dir_name(1)}")


def test_orphan_segment_files_are_invisible(spark, built):
    """A crashed builder task can leave postings.parquet with no
    manifest; committed_segments (and thus merges/readers) must skip it."""
    idx, _ = built
    segs = committed_segments(idx)
    donor = f"{idx}/segments/{segs[0]}"
    orphan = f"{idx}/segments/seg-99999"
    os.makedirs(orphan, exist_ok=True)
    shutil.copy(f"{donor}/postings.parquet", f"{orphan}/postings.parquet")
    assert "seg-99999" not in committed_segments(idx)
    shutil.rmtree(orphan)


def test_tmp_snapshot_files_ignored(built):
    idx, _ = built
    tmp = f"{idx}/snapshots/.snap-0000000009.json.tmp"
    with open(tmp, "w") as f:
        f.write("{")  # torn write
    snap = latest_snapshot(idx)
    assert snap["generation"] == 0
    os.unlink(tmp)


def test_regeneration_bumps_and_reader_follows(spark, built):
    """Re-publishing (e.g. after an NRT compaction) commits gen 1; a
    reopened reader resolves it, and gen 0 stays on disk untouched."""
    idx, tables = built
    before = _top10(tables)
    snap0 = latest_snapshot(idx)
    # re-merge the same committed segments into a new generation
    from lucene_solr_spark.index.merge import merge_segments

    merged = merge_segments(
        spark, idx, seg_group_size=2, n_buckets=8,
        segments=snap0["segments"], merged_name=merged_dir_name(1),
    )
    commit_snapshot(idx, 1, snap0["segments"], snap0["stats"], merged=merged)
    reopened = read_segmented_index(spark, idx)
    assert latest_snapshot(idx)["generation"] == 1
    assert _top10(reopened) == before  # same data, new generation
    # previous generation files untouched (time-travel / replication source)
    assert os.path.isdir(f"{idx}/{merged_dir_name(0)}/postings")
    with open(f"{idx}/snapshots/snap-0000000000.json") as f:
        assert json.load(f)["generation"] == 0


# -------------------------------------------------- replicator (pull)


def test_replicate_pulls_consistent_snapshot(spark, built, tmp_path):
    """Full pull: replica activates the primary's generation and serves
    IDENTICAL query results; re-running is a no-op (idempotent)."""
    from lucene_solr_spark.index.replicator import replicate

    idx, tables = built
    dst = str(tmp_path / "replica")
    r = replicate(idx, dst)
    assert r["generation"] == latest_snapshot(idx)["generation"]
    assert r["files_copied"] > 0 and r["bytes_copied"] > 0

    rep_tables = read_segmented_index(spark, dst)
    assert _top10(rep_tables) == _top10(tables)

    again = replicate(idx, dst)
    assert again["files_copied"] == 0 and again["bytes_copied"] == 0


def test_replicate_resumes_partial_copy(spark, built, tmp_path):
    """A replication run killed mid-copy leaves no visible snapshot at
    the replica; re-running copies only the missing files and then
    activates."""
    from lucene_solr_spark.index.replicator import replicate
    from lucene_solr_spark.index.snapshot import _SNAP_DIR

    idx, _ = built
    dst = str(tmp_path / "replica2")
    replicate(idx, dst)
    # simulate the crash: drop the commit point and some data files
    shutil.rmtree(os.path.join(dst, _SNAP_DIR))
    snap = latest_snapshot(idx)
    victim_dir = os.path.join(dst, "segments", snap["segments"][0])
    victims = [
        os.path.join(cur, f)
        for cur, _d, fs in os.walk(victim_dir)
        for f in fs
    ]
    for v in victims:
        os.remove(v)
    assert latest_snapshot(dst) is None  # replica is not serving anything

    r = replicate(idx, dst)
    assert r["files_copied"] == len(victims)
    assert latest_snapshot(dst)["generation"] == snap["generation"]
    rep_tables = read_segmented_index(spark, dst)
    assert rep_tables.doc_count == 400
