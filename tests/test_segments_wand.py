"""Segmented index: CheckIndex-style invariants, WAND parity, resume.

- invariants mirror reference index/CheckIndex.java:1239-1284,1647-1657
  (recomputed df/cf vs dictionary, postings sorted/unique, impacts
  dominate their blocks, norms vs recomputed lengths).
- WAND parity mirrors CheckHits.checkTopScores (pruned TOP_SCORES vs
  COMPLETE must agree exactly — CheckHits.java:576-591).
- resume mirrors the per-partition checkpoint requirement: crash
  mid-build, rerun, completed segments are skipped, result identical.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.index.builder import transcripts_from_pandas
from lucene_solr_spark.index.codec import decode_block
from lucene_solr_spark.index.segments import build_segmented_index, read_segmented_index
from lucene_solr_spark.search.bruteforce import search_bruteforce
from lucene_solr_spark.search.wand import search_wand

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_topk.json")


@pytest.fixture(scope="module")
def seg_index(spark, tiny_corpus, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("segidx"))
    df = transcripts_from_pandas(spark, tiny_corpus)
    return build_segmented_index(
        df, index_dir, num_segments=6, seg_group_size=2, n_buckets=8
    )


def _decode_all(seg_index) -> pd.DataFrame:
    rows = []
    for r in seg_index.blocks.collect():
        d, f = decode_block(bytes(r["docs"]), bytes(r["freqs"]))
        n = np.frombuffer(bytes(r["norms"]), dtype=np.uint8)
        for dd, ff, nn in zip(d, f, n):
            rows.append((r["term"], int(dd), int(ff), int(nn)))
    return pd.DataFrame(rows, columns=["term", "doc_id", "freq", "norm"])


def test_invariants_vs_oracle(seg_index, tiny_oracle):
    assert seg_index.doc_count == tiny_oracle.doc_count
    assert seg_index.sum_total_term_freq == tiny_oracle.sum_total_term_freq

    flat = _decode_all(seg_index)
    # postings strictly increasing & unique per term; equal to oracle
    assert len(flat) == sum(len(p) for p in tiny_oracle.postings.values())
    for term, grp in flat.groupby("term"):
        pl = tiny_oracle.postings[term]
        got = grp.sort_values("doc_id")
        assert got["doc_id"].is_unique
        np.testing.assert_array_equal(got["doc_id"].to_numpy(), pl[:, 0])
        np.testing.assert_array_equal(got["freq"].to_numpy(), pl[:, 1])
        # inline norm bytes match the oracle norms
        np.testing.assert_array_equal(
            got["norm"].to_numpy(), tiny_oracle.norm_bytes[pl[:, 0]]
        )

    # dictionary df/cf == recomputed
    d = {r["term"]: (r["df"], r["cf"]) for r in seg_index.dictionary.collect()}
    for term, pl in tiny_oracle.postings.items():
        assert d[term] == (len(pl), int(pl[:, 1].sum()))

    # impacts dominate every posting in their block
    for r in seg_index.blocks.collect():
        _, f = decode_block(bytes(r["docs"]), bytes(r["freqs"]))
        n = np.frombuffer(bytes(r["norms"]), dtype=np.uint8)
        impf = np.array(r["impact_freqs"])
        impn = np.array(r["impact_norms"])
        for fi, ni in zip(f, n):
            assert np.any((impf >= fi) & (impn <= ni))
        assert len(f) == r["n_docs"] and f.sum() == r["sum_freq"]
        assert r["n_docs"] <= 128


def test_norms_match(seg_index, tiny_oracle):
    norms = {
        r["doc_id"]: (r["dl"], r["norm_byte"]) for r in seg_index.norms.collect()
    }
    assert len(norms) == len(tiny_oracle.norm_bytes)
    for doc_id, nb in enumerate(tiny_oracle.norm_bytes):
        assert norms[doc_id][1] == nb


def test_wand_matches_golden(seg_index):
    with open(GOLDEN) as f:
        golden = json.load(f)["queries"]
    for qid, q in golden.items():
        got = search_wand(seg_index, q["terms"], q["mode"], q["k"]).collect()
        exp = q["hits"]
        assert len(got) == len(exp), f"{qid}: {len(got)} != {len(exp)}"
        for i, (g, e) in enumerate(zip(got, exp)):
            assert g["doc_id"] == e["doc_id"], f"{qid} rank {i}"
            assert np.float32(g["score"]) == np.float32(e["score"]), f"{qid} rank {i}"


def test_wand_msm_dismax_vs_bruteforce(seg_index, tiny_index):
    from lucene_solr_spark import fixtures

    vocab = fixtures.make_vocab()
    terms = [vocab[0], vocab[3], vocab[11], vocab[40]]
    for kwargs in (
        {"mode": "disjunctive", "min_should_match": 2},
        {"mode": "dismax"},
    ):
        w = search_wand(seg_index, terms, k=10, **kwargs).collect()
        bf = search_bruteforce(tiny_index, terms, k=10, **kwargs).collect()
        assert [(r["doc_id"], np.float32(r["score"])) for r in w] == [
            (r["doc_id"], np.float32(r["score"])) for r in bf
        ], kwargs


def test_resume_from_checkpoint(spark, tiny_corpus, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("resumeidx"))
    df = transcripts_from_pandas(spark, tiny_corpus)
    # crash in segment 3 → partial build
    with pytest.raises(Exception):
        build_segmented_index(
            df, index_dir, num_segments=6, seg_group_size=2, n_buckets=8,
            fail_on_seg=3,
        )
    seg_dirs = sorted(os.listdir(f"{index_dir}/segments"))
    done = [
        s for s in seg_dirs
        if os.path.exists(f"{index_dir}/segments/{s}/manifest.json")
    ]
    assert 0 < len(done) < 6, done
    mtimes = {
        s: os.path.getmtime(f"{index_dir}/segments/{s}/manifest.json") for s in done
    }
    # rerun without the crash: completes, skips finished segments
    idx = build_segmented_index(
        df, index_dir, num_segments=6, seg_group_size=2, n_buckets=8
    )
    for s in done:
        assert os.path.getmtime(f"{index_dir}/segments/{s}/manifest.json") == mtimes[s]
    with open(f"{index_dir}/segments/{done[0]}/manifest.json") as f:
        assert json.load(f)["resumed"] is False  # manifest itself untouched

    # resumed index answers identically to a fresh one
    fresh_dir = str(tmp_path_factory.mktemp("freshidx"))
    fresh = build_segmented_index(
        df, fresh_dir, num_segments=6, seg_group_size=2, n_buckets=8
    )
    from lucene_solr_spark import fixtures

    head = fixtures.make_vocab()[0]
    a = search_wand(idx, [head, "repeatterm"], "disjunctive", 10).collect()
    b = search_wand(fresh, [head, "repeatterm"], "disjunctive", 10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]
    assert idx.doc_count == fresh.doc_count


def test_search_after_pagination(seg_index, tiny_index):
    """searchAfter cursor: page 2 = hits strictly after page 1's bottom;
    pages concatenate to the unpaged top-k (IndexSearcher.searchAfter /
    CursorMark semantics), identical in pruned and brute-force paths."""
    from lucene_solr_spark import fixtures

    vocab = fixtures.make_vocab()
    terms = [vocab[0], vocab[3], vocab[11]]
    page1 = search_wand(seg_index, terms, "disjunctive", 5).collect()
    anchor = (float(page1[-1]["score"]), int(page1[-1]["doc_id"]))
    page2 = search_wand(seg_index, terms, "disjunctive", 5, after=anchor).collect()
    bf2 = search_bruteforce(tiny_index, terms, "disjunctive", 5, after=anchor).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in page2] == [
        (r["doc_id"], np.float32(r["score"])) for r in bf2
    ]
    full = search_wand(seg_index, terms, "disjunctive", 10).collect()
    assert [r["doc_id"] for r in page1] + [r["doc_id"] for r in page2] == [
        r["doc_id"] for r in full
    ]


def test_per_term_boosts(seg_index, tiny_index):
    """BoostQuery per clause: dict boosts change weights identically in
    pruned and brute-force paths."""
    from lucene_solr_spark import fixtures

    vocab = fixtures.make_vocab()
    terms = [vocab[0], vocab[3], vocab[11]]
    boosts = {terms[0]: 2.0, terms[1]: 0.5, terms[2]: 1.0}
    w = search_wand(seg_index, terms, "disjunctive", 10, boost=boosts).collect()
    bf = search_bruteforce(tiny_index, terms, "disjunctive", 10, boost=boosts).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in w] == [
        (r["doc_id"], np.float32(r["score"])) for r in bf
    ]
    plain = search_wand(seg_index, terms, "disjunctive", 10).collect()
    assert [(r["doc_id"], r["score"]) for r in w] != [
        (r["doc_id"], r["score"]) for r in plain
    ]


def test_dictionary_cache_warm_query_no_lookup_job(spark, seg_index):
    """Resident-searcher df cache: the second query for the same terms
    must read its dfs from the handle's cache (absent terms negatively
    cached), and results must be identical to the cold query."""
    from lucene_solr_spark import fixtures
    from lucene_solr_spark.search.wand import search_wand

    terms = [fixtures.make_vocab()[0], "zzznotaterm"]
    cold = search_wand(seg_index, terms, "disjunctive", k=5).collect()
    assert seg_index.df_cache[terms[0]] is not None
    assert seg_index.df_cache["zzznotaterm"] is None  # negative entry
    warm = search_wand(seg_index, terms, "disjunctive", k=5).collect()
    assert [tuple(r) for r in warm] == [tuple(r) for r in cold]
