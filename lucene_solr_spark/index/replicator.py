"""Replicator: pull a consistent index snapshot to another location.

The reference replicator module ships commit points: a replica asks the
primary for its latest revision, fetches only the files it is missing,
and activates the revision atomically once every file landed
(reference replicator/src/java/org/apache/lucene/replicator/
IndexRevision.java, ReplicationClient.java:overall flow,
IndexReplicationHandler.java — the new segments file is written LAST).

Spark-side the index at rest is parquet dirs + generation-numbered
snapshot files (index/snapshot.py), so replication is file-level:

- source of truth = the primary's ``latest_snapshot`` (never a
  directory glob — in-flight generations are invisible by design),
- copy = only files the replica lacks (byte-size compare; files are
  immutable once committed, so same name + same size ⇒ same content),
- activate = write the replica's snapshot file LAST via tmp+rename —
  a reader of the replica never sees a partial generation, and a
  killed replication run leaves only unreferenced files behind
  (re-running completes the copy idempotently).

At scale this runs as a distcp-style parallel copy; the logic here is
single-node (the sandbox has one filesystem) but the protocol —
snapshot-listed files only, data before commit point, idempotent
resume — is the part that matters.
"""

from __future__ import annotations

import os
import shutil

from .snapshot import commit_snapshot, latest_snapshot

__all__ = ["replicate"]


def _files_under(root: str, rel_dirs: list) -> list:
    """All files under root/<d> for each committed dir d, as paths
    relative to root."""
    out = []
    for d in rel_dirs:
        top = os.path.join(root, d)
        if not os.path.isdir(top):
            continue
        for cur, _dirs, files in os.walk(top):
            for f in files:
                if f.startswith("."):  # tmp / in-flight markers
                    continue
                out.append(
                    os.path.relpath(os.path.join(cur, f), root)
                )
    return sorted(out)


def replicate(src_index_dir: str, dst_index_dir: str) -> dict:
    """Pull the primary's latest committed generation into
    ``dst_index_dir``. Idempotent: re-running after a crash copies only
    what is still missing. Returns {"generation", "files_copied",
    "files_skipped", "bytes_copied"}.

    No-op (returns the replica's current state) when the replica is
    already at the primary's generation."""
    snap = latest_snapshot(src_index_dir)
    if snap is None:
        raise ValueError(f"no committed snapshot under {src_index_dir}")
    gen = snap["generation"]
    have = latest_snapshot(dst_index_dir)
    if have is not None and have["generation"] >= gen:
        return {
            "generation": have["generation"],
            "files_copied": 0,
            "files_skipped": 0,
            "bytes_copied": 0,
        }

    rel_dirs = [f"segments/{s}" for s in snap["segments"]]
    if snap.get("merged"):
        rel_dirs.append(snap["merged"])
    # stored fields are base data every generation references: written
    # before the generation's commit point, appended monotonically by
    # NRT. Rows newer than the snapshot are harmless at the replica —
    # stored is only ever probed by doc_id join from committed hits.
    rel_dirs.append("stored")
    copied = skipped = nbytes = 0
    for rel in _files_under(src_index_dir, rel_dirs):
        src = os.path.join(src_index_dir, rel)
        dst = os.path.join(dst_index_dir, rel)
        size = os.path.getsize(src)
        if os.path.exists(dst) and os.path.getsize(dst) == size:
            skipped += 1  # committed files are immutable: size match ⇒ done
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = os.path.join(os.path.dirname(dst), f".{os.path.basename(dst)}.tmp")
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)
        copied += 1
        nbytes += size
    # every referenced file landed → activate the revision (commit LAST)
    commit_snapshot(
        dst_index_dir, gen, snap["segments"], snap["stats"],
        merged=snap.get("merged"),
    )
    return {
        "generation": gen,
        "files_copied": copied,
        "files_skipped": skipped,
        "bytes_copied": nbytes,
    }
