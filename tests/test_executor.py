"""Parsed-query executor: phrase+term combination semantics.

Reference: search/ReqOptSumScorer.java (required phrase + optional
should terms), ReqExclScorer.java (must_not), Boolean2ScorerSupplier
clause wiring.
"""

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import transcripts_from_pandas
from lucene_solr_spark.index.segments import build_segmented_index
from lucene_solr_spark.search.bruteforce import search_bruteforce
from lucene_solr_spark.search.executor import execute_parsed
from lucene_solr_spark.search.phrase import search_phrase


@pytest.fixture(scope="module")
def pos_index(spark, tiny_corpus, tmp_path_factory):
    df = transcripts_from_pandas(spark, tiny_corpus)
    return build_segmented_index(
        df,
        str(tmp_path_factory.mktemp("exec_idx")),
        num_segments=4,
        seg_group_size=2,
        n_buckets=8,
        index_positions=True,
    )


def _bigram(spark, pos_index):
    from lucene_solr_spark.index.builder import standard_tokens

    tok = pos_index.stored.select(
        "doc_id", F.posexplode(standard_tokens("text")).alias("pos", "term")
    )
    pair = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .groupBy(F.col("a.term").alias("t1"), F.col("b.term").alias("t2"))
        .agg(F.count_distinct("a.doc_id").alias("nd"))
        .filter(F.col("nd") >= 3)
        .orderBy(F.desc("nd"), "t1", "t2")
        .first()
    )
    return pair["t1"], pair["t2"]


def test_req_opt_sum(spark, tiny_index, pos_index):
    """Phrase required; should-term contributes where present, docs
    outside the phrase set never appear."""
    t1, t2 = _bigram(spark, pos_index)
    opt = "the"  # high-df term, usually present
    q = f'"{t1} {t2}" {opt}'
    got = {
        r["doc_id"]: r["score"]
        for r in execute_parsed(q, tiny_index, pos_index, k=None).collect()
    }
    ph = {
        r["doc_id"]: r["score"]
        for r in search_phrase(pos_index, [t1, t2]).collect()
    }
    ts = {
        r["doc_id"]: r["score"]
        for r in search_bruteforce(tiny_index, [opt], k=None).collect()
    }
    assert set(got) == set(ph)  # required clause defines the doc set
    for d, s in got.items():
        assert math.isclose(s, ph[d] + ts.get(d, 0.0), rel_tol=1e-6)


def test_conjunctive_with_phrase(spark, tiny_index, pos_index):
    t1, t2 = _bigram(spark, pos_index)
    q = f'"{t1} {t2}" AND {t1}'
    got = {
        r["doc_id"]: r["score"]
        for r in execute_parsed(q, tiny_index, pos_index, k=None).collect()
    }
    ph = {
        r["doc_id"]: r["score"]
        for r in search_phrase(pos_index, [t1, t2]).collect()
    }
    ts = {
        r["doc_id"]: r["score"]
        for r in search_bruteforce(tiny_index, [t1], k=None).collect()
    }
    assert set(got) == set(ph) & set(ts)
    for d, s in got.items():
        assert math.isclose(s, ph[d] + ts[d], rel_tol=1e-6)


def test_must_not_excludes(spark, tiny_index, pos_index):
    t1, t2 = _bigram(spark, pos_index)
    base = {
        r["doc_id"]
        for r in execute_parsed(
            f'"{t1} {t2}"', tiny_index, pos_index, k=None
        ).collect()
    }
    excl_docs = {
        r["doc_id"]
        for r in tiny_index.postings.filter(F.col("term") == t1)
        .select("doc_id")
        .collect()
    }
    got = {
        r["doc_id"]
        for r in execute_parsed(
            f'"{t1} {t2}" -{t1}', tiny_index, pos_index, k=None
        ).collect()
    }
    assert got == base - excl_docs == set()  # t1 is in every phrase doc


def test_terms_only_matches_bruteforce(spark, tiny_index):
    got = [
        (r["doc_id"], r["score"])
        for r in execute_parsed("the data", tiny_index, k=10).collect()
    ]
    exp = [
        (r["doc_id"], r["score"])
        for r in search_bruteforce(tiny_index, ["the", "data"], k=10).collect()
    ]
    assert got == exp


def test_phrase_without_pos_index_raises(tiny_index):
    with pytest.raises(ValueError):
        execute_parsed('"a b"', tiny_index, None)
