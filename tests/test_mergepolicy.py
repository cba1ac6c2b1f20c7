"""TieredMergePolicy analog: selection behavior on synthetic manifests.

Pins the reference behaviors (TieredMergePolicy.java): within-budget
indexes merge nothing; balanced merges beat lopsided ones (skew);
delete-heavy merges are strongly favored (nonDelRatio²); merges never
exceed maxMergedSegmentBytes; oversize low-delete segments are left
alone; cascading brings the index under the tier budget.
"""

from lucene_solr_spark.index.mergepolicy import (
    MergePlan,
    Segment,
    allowed_segment_count,
    plan_merges,
)

MB = 1 << 20


def seg(name, mb, docs=1000, dels=0):
    return Segment(name, int(mb * MB), docs, dels)


def test_within_budget_no_merge():
    segs = [seg(f"s{i}", 10) for i in range(5)]
    assert plan_merges(segs).merges == []


def test_over_budget_merges_smallest_tier():
    # 25 equal 4MB segments >> 10 allowed at that tier
    segs = [seg(f"s{i}", 4) for i in range(25)]
    plan = plan_merges(segs)
    assert plan.merges, "over-budget index must merge"
    # merges are full-width (mergeFactor) and balanced
    assert all(len(m) == 10 for m in plan.merges[:1])


def test_balanced_beats_lopsided():
    # one giant + small swarm: the best merge must NOT pair the giant
    # with the smalls (skew ~1), it should merge the equal smalls
    segs = [seg("giant", 900)] + [seg(f"t{i}", 3) for i in range(40)]
    plan = plan_merges(segs)
    assert plan.merges
    for m in plan.merges:
        names = {s.name for s in m}
        assert "giant" not in names


def test_delete_reclaim_favored():
    # two candidate pools of same size; one is 40% deleted — the
    # nonDelRatio² term must prefer it
    live = [seg(f"a{i}", 8, docs=1000, dels=0) for i in range(11)]
    deleted = [seg(f"d{i}", 8, docs=1000, dels=400) for i in range(11)]
    plan = plan_merges(live + deleted)
    assert plan.merges
    first = {s.name for s in plan.merges[0]}
    assert all(n.startswith("d") for n in first), first


def test_max_merged_segment_cap():
    segs = [seg(f"b{i}", 40) for i in range(30)]
    plan = plan_merges(segs, max_merged_bytes=100 * MB)
    assert plan.merges
    for m in plan.merges:
        assert sum(s.live_bytes for s in m) <= 100 * MB


def test_oversize_low_delete_segment_ineligible():
    segs = [seg("huge", 4000, docs=10_000, dels=0)] + [
        seg(f"s{i}", 4) for i in range(15)
    ]
    plan = plan_merges(segs)
    for m in plan.merges:
        assert "huge" not in {s.name for s in m}


def test_cascade_reaches_budget():
    segs = [seg(f"s{i}", 4) for i in range(40)]
    plan = plan_merges(segs)
    merged = {s.name for m in plan.merges for s in m}
    remaining = len(segs) - len(merged) + len(plan.merges)
    assert remaining <= allowed_segment_count(segs) + len(plan.merges)


def test_allowed_count_floor():
    # a handful of tiny segments: budget never below segsPerTier
    segs = [seg(f"s{i}", 0.1) for i in range(3)]
    assert allowed_segment_count(segs) >= 10


def test_plan_names_roundtrip():
    segs = [seg(f"s{i}", 4) for i in range(25)]
    plan = plan_merges(segs)
    assert plan.names() == [[s.name for s in m] for m in plan.merges]
    assert isinstance(plan, MergePlan)
