"""Fixture generator determinism + oracle scorer sanity (tiny corpus)."""

import numpy as np
import pandas as pd

from lucene_solr_spark import fixtures
from lucene_solr_spark.analysis.tokenizer import tokenize
from lucene_solr_spark.search.oracle import build_oracle_index, oracle_topk


def test_deterministic():
    a = fixtures.make_transcripts(n_convs=24)
    b = fixtures.make_transcripts(n_convs=24)
    pd.testing.assert_frame_equal(a, b)


def test_schema_and_ordering():
    df = fixtures.make_transcripts(n_convs=24)
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df["turn_idx"].dtype == np.int32
    key = list(zip(df["conv_id"], df["turn_idx"]))
    assert key == sorted(key)
    assert len(key) == len(set(key))  # (conv_id, turn_idx) unique
    # ts strictly increasing with row index
    assert df["ts"].is_monotonic_increasing
    # tool null exactly on non-tool turns
    assert (df["tool"].notna() == (df["role"] == "tool")).all()


def test_edge_rows_present():
    df = fixtures.make_transcripts(n_convs=24)
    texts = df["text"].tolist()
    assert "" in texts
    assert any("zzsingletonterm" in t for t in texts)
    assert sum("repeatterm" in t for t in texts) == 1
    assert sum(1 for t in texts if t.startswith("x" * 256)) == 1
    dup = [t for t in texts if "duplicated tie breaker" in t]
    assert len(dup) == 2 and dup[0] == dup[1]
    lens = [len(tokenize(t)) for t in texts]
    assert 39 in lens and 40 in lens


def test_oracle_corpus_invariants():
    df = fixtures.make_transcripts(n_convs=24)
    idx = build_oracle_index(df["text"].tolist())
    head = fixtures.make_vocab()[0]
    assert idx.df[head] > 128  # Zipf head spans multiple posting blocks
    assert idx.df["zzsingletonterm"] == 1
    assert idx.doc_count < len(df)  # empty docs excluded from docCount
    # sum of freqs == sum of doc lengths
    total = sum(int(pl[:, 1].sum()) for pl in idx.postings.values())
    assert total == idx.sum_total_term_freq


def test_oracle_topk_tiebreak_and_modes():
    df = fixtures.make_transcripts(n_convs=24)
    idx = build_oracle_index(df["text"].tolist())

    # duplicate turns tie → doc_id ascending
    res = oracle_topk(idx, ["duplicated", "breaker"], "conjunctive", k=10)
    assert len(res) == 2
    assert res.iloc[0]["score"] == res.iloc[1]["score"]
    assert res.iloc[0]["doc_id"] < res.iloc[1]["doc_id"]

    # absent term: conjunctive empty, disjunctive ignores
    assert oracle_topk(idx, ["qqabsentterm", "repeatterm"], "conjunctive").empty
    d = oracle_topk(idx, ["qqabsentterm", "repeatterm"], "disjunctive", k=5)
    assert len(d) == 1  # repeatterm occurs in exactly one doc

    # scores sorted desc, float32
    head = fixtures.make_vocab()[0]
    r = oracle_topk(idx, [head], "disjunctive", k=10)
    assert len(r) == 10
    assert r["score"].dtype == np.float32
    s = r["score"].to_numpy()
    assert np.all(s[:-1] >= s[1:])


def test_queries_fixture():
    q = fixtures.make_queries()
    assert set(q["mode"]) == {"disjunctive", "conjunctive"}
    assert set(q["k"]) == {1, 10}
    assert q["query_id"].is_unique
