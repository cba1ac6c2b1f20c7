"""RealTimeGet: get-by-id spanning the uncommitted transaction log.

Reference: solr/core/.../handler/component/RealTimeGetComponent.java:101
and solr/core/.../update/UpdateLog.java — between commits, /get?id=X
answers from the update log (the newest uncommitted add/delete for X),
falling back to the committed index; SEARCH keeps seeing only the
committed view until commit. This module rebuilds that contract over an
at-rest document store:

    <dir>/gen-<N>/            committed document parquet (generations)
    <dir>/snapshots/snap-*.json   atomic commit points (index/snapshot.py)
    <dir>/tlog/tlog-<seq>.parquet uncommitted op batches (add|delete)

- ``tlog_add`` appends an op batch as its own numbered parquet file
  (tmp+rename naming: a crashed writer never leaves a readable
  half-batch — UpdateLog's one-file-per-window analog).
- ``realtime_get`` overlays the tlog on the committed store: newest op
  per id wins (ordered by tlog seq, then batch row order), deletes
  hide. Scale shape: the tlog is the small uncommitted window →
  broadcast overlay onto one keyed lookup of the committed parquet —
  never a scan-join of two big sides.
- ``committed_read`` is what search sees: committed generation only.
- ``rtg_commit`` folds the tlog into a new committed generation,
  publishes the snapshot LAST (tmp+rename commit rule), then clears
  the tlog — a reader mid-commit resolves either the old generation +
  tlog or the new generation, never a half state.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from .snapshot import commit_snapshot, latest_snapshot

__all__ = [
    "docstore_init", "tlog_add", "tlog_files", "realtime_get",
    "committed_read", "rtg_commit",
]

_OPS = ("add", "delete")


def _gen_dir(d: str, gen: int) -> str:
    return f"{d}/gen-{gen:010d}"


def docstore_init(docs: DataFrame, store_dir: str, id_col: str = "doc_id"):
    """Write generation 0 and its commit point."""
    docs.write.mode("errorifexists").parquet(_gen_dir(store_dir, 0))
    commit_snapshot(
        store_dir, 0, segments=[],
        stats={"kind": "docstore", "id_col": id_col},
        merged=f"gen-{0:010d}",
    )


def tlog_files(store_dir: str) -> list:
    t = f"{store_dir}/tlog"
    if not os.path.isdir(t):
        return []
    return sorted(
        n for n in os.listdir(t)
        if n.startswith("tlog-") and n.endswith(".parquet")
    )


def tlog_add(ops: DataFrame, store_dir: str) -> int:
    """Append one uncommitted op batch. ``ops`` must carry an ``op``
    column ('add' = upsert full doc, 'delete' = tombstone by id) plus
    the document columns. Returns the batch seq."""
    if "op" not in ops.columns:
        raise ValueError("tlog batch needs an 'op' column (add|delete)")
    names = tlog_files(store_dir)
    seq = (int(names[-1][5:15]) + 1) if names else 0
    os.makedirs(f"{store_dir}/tlog", exist_ok=True)
    tmp = f"{store_dir}/tlog/.tlog-{seq:010d}.tmp"
    ops.withColumn("_seq", F.lit(seq).cast("long")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    os.replace(tmp, f"{store_dir}/tlog/tlog-{seq:010d}.parquet")
    return seq


def committed_read(spark: SparkSession, store_dir: str) -> DataFrame:
    """The committed view — what SEARCH sees (no uncommitted rows)."""
    snap = latest_snapshot(store_dir)
    if snap is None:
        raise ValueError(f"no committed generation under {store_dir}")
    return spark.read.parquet(f"{store_dir}/{snap['merged']}")


def _overlay(spark, store_dir, id_col):
    from pyspark.sql import Window

    base = committed_read(spark, store_dir)
    names = tlog_files(store_dir)
    if not names:
        return base.withColumn("_from_tlog", F.lit(False))
    tl = spark.read.parquet(
        *[f"{store_dir}/tlog/{n}" for n in names]
    )
    # newest op per id wins: order by (seq desc); within a batch the
    # writer is one atomic file, ties broken by op so a same-batch
    # add+delete resolves deterministically (delete wins, 'add'<'delete')
    w = Window.partitionBy(id_col).orderBy(
        F.desc("_seq"), F.desc("op")
    )
    latest = (
        tl.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_seq")
    )
    doc_cols = [c for c in base.columns]
    adds = latest.filter(F.col("op") == "add").select(*doc_cols)
    dead = latest.filter(F.col("op") == "delete").select(id_col)
    changed = latest.select(id_col)
    return (
        base.join(F.broadcast(changed), id_col, "left_anti")
        .withColumn("_from_tlog", F.lit(False))
        .unionByName(adds.withColumn("_from_tlog", F.lit(True)))
        .join(F.broadcast(dead), id_col, "left_anti")
    )


def realtime_get(
    spark: SparkSession,
    store_dir: str,
    ids=None,
    id_col: str = "doc_id",
) -> DataFrame:
    """The /get view: committed docs overlaid with uncommitted tlog ops
    (latest add wins, deletes hide). ``ids=None`` returns the whole
    realtime view; a list filters to those ids (the component's
    multi-id form). Extra column ``_from_tlog`` flags uncommitted
    rows."""
    out = _overlay(spark, store_dir, id_col)
    if ids is not None:
        out = out.filter(F.col(id_col).isin([int(i) for i in ids]))
    return out


def rtg_commit(spark: SparkSession, store_dir: str, id_col: str = "doc_id"):
    """Fold the tlog into a new committed generation (Solr's commit:
    the update log's documents become index-visible). Publish order:
    write gen-<N+1> fully, commit the snapshot, THEN clear the tlog.
    Returns the new generation number."""
    snap = latest_snapshot(store_dir)
    if snap is None:
        raise ValueError(f"no committed generation under {store_dir}")
    gen = int(snap["generation"]) + 1
    merged = realtime_get(spark, store_dir, ids=None, id_col=id_col).drop(
        "_from_tlog"
    )
    merged.write.mode("errorifexists").parquet(_gen_dir(store_dir, gen))
    commit_snapshot(
        store_dir, gen, segments=[],
        stats={"kind": "docstore", "id_col": id_col},
        merged=f"gen-{gen:010d}",
    )
    for n in tlog_files(store_dir):  # parquet batches are directories
        shutil.rmtree(f"{store_dir}/tlog/{n}", ignore_errors=True)
    shutil.rmtree(f"{store_dir}/tlog", ignore_errors=True)
    return gen
