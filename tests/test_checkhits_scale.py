"""CheckHits.checkTopScores at scale: pruned TOP_SCORES vs COMPLETE.

The tiny-corpus golden fixtures verify exact scores; this suite runs the
same-query comparison on a 60k-doc synthetic corpus where the pruning
machinery (block-max WAND seeds, block-max conjunction chunks, multiple
128-posting blocks per term, multi-segment leaves) actually engages —
mirroring test-framework/.../search/CheckHits.java:576-591 which runs
every query with totalHitsThreshold=MAX (COMPLETE) and =1 (pruned) and
asserts identical top-k.
"""

import numpy as np
import pytest

from lucene_solr_spark.index.segments import build_segmented_index
from lucene_solr_spark.search.wand import search_wand
from lucene_solr_spark.sources.synth import synth_transcripts, synth_term


@pytest.fixture(scope="module")
def scale_index(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("chkidx"))
    corpus = synth_transcripts(spark, 60000)
    idx = build_segmented_index(
        corpus, index_dir, num_segments=8, seg_group_size=2, n_buckets=16
    )
    idx.blocks = idx.blocks.persist()
    return idx


QUERIES = [
    ("disjunctive", [1], None),
    ("disjunctive", [1, 2, 50], None),
    ("disjunctive", [200, 900, 2500], None),
    ("disjunctive", [2, 5, 10, 17, 26, 37], None),
    ("conjunctive", [1, 2], None),
    ("conjunctive", [1, 300], None),
    ("conjunctive", [3, 6, 12], None),
    ("dismax", [1, 40, 700], None),
    ("disjunctive", [2, 9, 110, 1300], 2),
]


@pytest.mark.parametrize("mode,ranks,msm", QUERIES)
def test_pruned_equals_complete(scale_index, mode, ranks, msm):
    terms = [synth_term(r) for r in ranks]
    for k in (1, 10):
        pruned = search_wand(
            scale_index, terms, mode, k, min_should_match=msm
        ).collect()
        full = search_wand(
            scale_index, terms, mode, k, min_should_match=msm, complete=True
        ).collect()
        assert [(r["doc_id"], np.float32(r["score"])) for r in pruned] == [
            (r["doc_id"], np.float32(r["score"])) for r in full
        ], (mode, ranks, k)


def test_search_after_pruned_equals_complete(scale_index):
    terms = [synth_term(1), synth_term(2), synth_term(50)]
    page1 = search_wand(scale_index, terms, "disjunctive", 10).collect()
    anchor = (float(page1[-1]["score"]), int(page1[-1]["doc_id"]))
    pruned = search_wand(
        scale_index, terms, "disjunctive", 10, after=anchor
    ).collect()
    full = search_wand(
        scale_index, terms, "disjunctive", 10, after=anchor, complete=True
    ).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in pruned] == [
        (r["doc_id"], np.float32(r["score"])) for r in full
    ]
    # conjunctive cursor too (exercises _conjunction_topk's after path)
    c1 = search_wand(scale_index, [synth_term(1), synth_term(2)], "conjunctive", 10).collect()
    a2 = (float(c1[-1]["score"]), int(c1[-1]["doc_id"]))
    cp = search_wand(
        scale_index, [synth_term(1), synth_term(2)], "conjunctive", 10, after=a2
    ).collect()
    cf = search_wand(
        scale_index, [synth_term(1), synth_term(2)], "conjunctive", 10,
        after=a2, complete=True,
    ).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in cp] == [
        (r["doc_id"], np.float32(r["score"])) for r in cf
    ]
