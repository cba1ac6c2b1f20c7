"""TieredMergePolicy: natural merge selection over segment manifests.

Reference: lucene/core/src/java/org/apache/lucene/index/
TieredMergePolicy.java — Lucene keeps the segment count bounded by
repeatedly picking the lowest-scoring candidate merge, where score
(lower is better, :score())

    score = skew · totAfterMergeBytes^0.05 · nonDelRatio²

with skew = floorSize(largest)/Σ floorSize (1/k perfect … 1.0
lopsided; lopsided merges cascade to O(N²) merge cost), a gentle bias
to smaller merges, and a strong preference for delete-reclaiming
merges. The budget (allowedSegCount, :378-395) is the tier sum: at
each level of ``mergeFactor = min(maxMergeAtOnce, segsPerTier)`` the
index may hold ``segsPerTier`` segments of that level's size.

This planner is DRIVER-SIDE ON PURPOSE: its input is segment manifest
metadata (name, bytes, docs, deletes) — thousands of rows at any
corpus size, never data. The NRT append path (streaming/incremental
.py) grows a segment per micro-batch; feeding those manifests through
``plan_merges`` yields the compaction jobs exactly as IndexWriter's
background merge scheduler would, and each selected merge is itself a
distributed job over the member segments' posting tables.

Simplifications vs the reference, declared: no concurrent-merge
bookkeeping (``merging`` set — the caller serializes), deletes are
taken from the manifest's tombstone count rather than live bitsets,
and the forced-merge (explicit) path is omitted (Iceberg rewrite
covers it).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

__all__ = [
    "Segment", "MergePlan", "plan_merges", "allowed_segment_count",
    "plan_from_manifests",
]

DEFAULT_MAX_MERGE_AT_ONCE = 10          # TieredMergePolicy.java:96
DEFAULT_MAX_MERGED_BYTES = 5 << 30      # :97 (5 GB)
DEFAULT_FLOOR_BYTES = 2 << 20           # :100 (2 MB)
DEFAULT_SEGS_PER_TIER = 10.0            # :101
DEFAULT_DELETES_PCT_ALLOWED = 33.0      # :105 area (deletesPctAllowed)


@dataclass(frozen=True)
class Segment:
    name: str
    size_bytes: int
    doc_count: int = 0
    del_docs: int = 0

    @property
    def live_bytes(self) -> int:
        """Size after deletes are reclaimed (the reference prorates
        sizeInBytes by the live-doc ratio)."""
        if self.doc_count <= 0:
            return self.size_bytes
        live = max(self.doc_count - self.del_docs, 0)
        return int(self.size_bytes * (live / self.doc_count))


@dataclass
class MergePlan:
    merges: list = field(default_factory=list)  # [[Segment, ...], ...]

    def names(self) -> list:
        return [[s.name for s in m] for m in self.merges]


def _floor_size(size: int, floor_bytes: int) -> int:
    """floorSize (TieredMergePolicy.java) — tiny segments count as the
    floor so swarms of small flushes don't fake perfect skew."""
    return max(size, floor_bytes)


def allowed_segment_count(
    segments,
    floor_bytes: int = DEFAULT_FLOOR_BYTES,
    segs_per_tier: float = DEFAULT_SEGS_PER_TIER,
    max_merge_at_once: int = DEFAULT_MAX_MERGE_AT_ONCE,
    max_merged_bytes: int = DEFAULT_MAX_MERGED_BYTES,
) -> int:
    """The tier budget (TieredMergePolicy.java:378-395): how many
    segments the index is allowed to hold before a natural merge is
    due."""
    sizes = [_floor_size(s.live_bytes, floor_bytes) for s in segments]
    if not sizes:
        return int(segs_per_tier)
    merge_factor = int(min(max_merge_at_once, segs_per_tier))
    level_size = max(min(sizes), floor_bytes)
    bytes_left = sum(sizes)
    allowed = 0.0
    while True:
        seg_count_level = bytes_left / level_size
        if seg_count_level < segs_per_tier or level_size >= max_merged_bytes:
            allowed += math.ceil(seg_count_level)
            break
        allowed += segs_per_tier
        bytes_left -= segs_per_tier * level_size
        level_size = min(max_merged_bytes, level_size * merge_factor)
    return int(max(allowed, segs_per_tier))


def _score(candidate, hit_too_large, floor_bytes, merge_factor):
    """The merge score (TieredMergePolicy.java score()): lower wins."""
    tot_after = sum(s.live_bytes for s in candidate)
    tot_after_floored = sum(
        _floor_size(s.live_bytes, floor_bytes) for s in candidate
    )
    tot_before = sum(s.size_bytes for s in candidate)
    if hit_too_large:
        skew = 1.0 / merge_factor
    else:
        skew = (
            _floor_size(candidate[0].live_bytes, floor_bytes)
            / tot_after_floored
        )
    non_del_ratio = tot_after / tot_before if tot_before else 1.0
    return skew * math.pow(tot_after, 0.05) * math.pow(non_del_ratio, 2)


def plan_merges(
    segments,
    max_merge_at_once: int = DEFAULT_MAX_MERGE_AT_ONCE,
    max_merged_bytes: int = DEFAULT_MAX_MERGED_BYTES,
    floor_bytes: int = DEFAULT_FLOOR_BYTES,
    segs_per_tier: float = DEFAULT_SEGS_PER_TIER,
    deletes_pct_allowed: float = DEFAULT_DELETES_PCT_ALLOWED,
) -> MergePlan:
    """Natural merge selection (findMerges → doFindMerges): returns
    the merges due now, each a list of Segments, best-scored first.
    Empty plan = index is within budget."""
    merge_factor = int(min(max_merge_at_once, segs_per_tier))
    # eligibility: very large segments only merge to reclaim deletes
    # (TieredMergePolicy.java:369)
    tot_docs = sum(s.doc_count for s in segments) or 1
    tot_dels = sum(s.del_docs for s in segments)
    total_del_pct = 100.0 * tot_dels / tot_docs
    eligible = []
    for s in segments:
        seg_del_pct = (
            100.0 * s.del_docs / s.doc_count if s.doc_count else 0.0
        )
        if s.live_bytes > max_merged_bytes / 2 and (
            total_del_pct <= deletes_pct_allowed
            and seg_del_pct <= deletes_pct_allowed
        ):
            continue  # too big, not delete-heavy: leave alone
        eligible.append(s)
    eligible.sort(key=lambda s: (-s.live_bytes, s.name))
    allowed = allowed_segment_count(
        eligible, floor_bytes, segs_per_tier, max_merge_at_once,
        max_merged_bytes,
    )

    plan = MergePlan()
    picked: set = set()
    have_one_large = False
    while True:
        pool = [s for s in eligible if s.name not in picked]
        if len(pool) <= allowed:
            return plan
        best, best_score, best_too_large = None, None, False
        # sliding candidate windows over the size-sorted pool
        for start in range(len(pool)):
            cand, cand_bytes, hit_too_large = [], 0, False
            for s in pool[start:]:
                if len(cand) >= merge_factor:
                    break
                if cand_bytes + s.live_bytes > max_merged_bytes:
                    hit_too_large = True
                    # keep filling with smaller segments that fit
                    # (reference packs the max-size merge)
                    continue
                cand.append(s)
                cand_bytes += s.live_bytes
            if len(cand) < 2:
                continue
            sc = _score(cand, hit_too_large, floor_bytes, merge_factor)
            if (best_score is None or sc < best_score) and (
                not hit_too_large or not have_one_large
            ):
                best, best_score, best_too_large = cand, sc, hit_too_large
        if best is None:
            return plan
        if best_too_large:
            have_one_large = True
        picked.update(s.name for s in best)
        plan.merges.append(best)


def plan_from_manifests(manifests_df, tombstones_df=None, **kwargs) -> MergePlan:
    """Feed the NRT segment manifests (index/segments.py
    MANIFEST_SCHEMA rows — metadata, one row per segment) through the
    planner. ``tombstones_df`` optionally supplies (seg_id, del_docs)
    delete counts. The collect here is manifest METADATA (a few
    numbers per segment), never data — the same information
    SegmentInfos holds on the Lucene side."""
    rows = manifests_df.select(
        "seg_id", "n_docs", "posting_bytes"
    ).collect()
    dels = {}
    if tombstones_df is not None:
        dels = {
            r["seg_id"]: int(r["del_docs"])
            for r in tombstones_df.select("seg_id", "del_docs").collect()
        }
    segs = [
        Segment(
            name=str(r["seg_id"]),
            size_bytes=int(r["posting_bytes"] or 0),
            doc_count=int(r["n_docs"] or 0),
            del_docs=dels.get(r["seg_id"], 0),
        )
        for r in rows
    ]
    return plan_merges(segs, **kwargs)
