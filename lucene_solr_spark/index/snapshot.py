"""Atomic index snapshots — the SegmentInfos / commit-point analog.

Lucene publishes an index state by writing a new ``segments_N`` file
last; readers open the highest generation and see only files that
generation references — a killed merge or flush never becomes visible
(reference: index/SegmentInfos.java:123-140, IndexWriter.java:3407
"commitInternal"; the replicator module ships exactly these snapshots,
replicator/IndexRevision.java).

Here a snapshot is ``snapshots/snap-<gen>.json`` written via
tmp+rename (atomic on POSIX), listing everything a reader needs:

    {"generation": N,
     "segments": ["seg-00000", ...],      # committed segment dirs
     "merged": "merged-0000000000",        # this generation's merge output
     "stats": {...}}                       # doc_count / sum_ttf / codec …

Readers resolve ``latest_snapshot`` and read ONLY the files it lists —
no directory globs, so concurrently-building generations (a running
merge writing ``merged-<gen+1>/``, a crashed task's orphan parquet) are
invisible until their snapshot commits. Cleanup of unreferenced
generations is a separate janitor concern (Lucene's
IndexFileDeleter analog), deliberately decoupled from publish.
"""

from __future__ import annotations

import json
import os

__all__ = ["commit_snapshot", "latest_snapshot", "merged_dir_name"]

_SNAP_DIR = "snapshots"


def merged_dir_name(generation: int) -> str:
    return f"merged-{generation:010d}"


def commit_snapshot(
    index_dir: str,
    generation: int,
    segments: list,
    stats: dict,
    merged: str | None = None,
) -> str:
    """Atomically publish generation ``generation``. Returns the path."""
    snap_root = f"{index_dir}/{_SNAP_DIR}"
    os.makedirs(snap_root, exist_ok=True)
    payload = {
        "generation": int(generation),
        "segments": sorted(segments),
        "merged": merged,
        "stats": stats,
    }
    path = f"{snap_root}/snap-{generation:010d}.json"
    tmp = f"{snap_root}/.snap-{generation:010d}.json.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)  # the commit point
    return path


def latest_snapshot(index_dir: str) -> dict | None:
    """Highest-generation committed snapshot, or None."""
    snap_root = f"{index_dir}/{_SNAP_DIR}"
    if not os.path.isdir(snap_root):
        return None
    names = sorted(
        n for n in os.listdir(snap_root)
        if n.startswith("snap-") and n.endswith(".json")
    )
    if not names:
        return None
    with open(f"{snap_root}/{names[-1]}") as f:
        return json.load(f)


def committed_segments(index_dir: str) -> list:
    """Segment dir names under index_dir/segments with a manifest —
    i.e. the committed ones (a crashed task may leave data files with
    no manifest; those are invisible)."""
    seg_root = f"{index_dir}/segments"
    if not os.path.isdir(seg_root):
        return []
    return sorted(
        s
        for s in os.listdir(seg_root)
        if os.path.exists(f"{seg_root}/{s}/manifest.json")
    )
