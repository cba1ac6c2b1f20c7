"""Highlighter, MoreLikeThis, suggest/spellcheck unit tests.

Mirrors the reference test style: hand-checked small corpora
(lucene/highlighter/src/test/.../highlight/HighlighterTest.java,
lucene/queries/src/test/.../mlt/TestMoreLikeThis.java,
lucene/suggest/src/test/.../spell/TestDirectSpellChecker.java).
"""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.highlight import highlight
from lucene_solr_spark.search.mlt import mlt_terms, more_like_this
from lucene_solr_spark.search.suggest import spellcheck, suggest_prefix

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark merge spark merge spark shuffle partition"),
    (2, "merge policy controls segment merge cascades and merge cost"),
    (3, "nothing relevant here at all"),
    (4, "spark streaming micro batch spark executor spark driver spark"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def idx(corpus):
    return build_index(corpus, analyzer="simple", id_col="doc_id")


def test_highlight_fragment_and_filter(corpus):
    rows = {
        r.doc_id: r
        for r in highlight(corpus, "text", ["spark", "merge"]).collect()
    }
    assert set(rows) == {1, 2, 4}  # doc 0/3 have no match → filtered
    assert rows[1].first_pos == 1
    assert rows[1].fragment.startswith("<em>spark</em> <em>merge</em>")
    # doc 2: first match "merge" at pos 1
    assert rows[2].fragment.count("<em>merge</em>") >= 3


def test_highlight_window_starts_before_match(spark):
    df = spark.createDataFrame(
        [(0, ("x" * 50) + " needle " + ("y" * 100))], "doc_id long, text string"
    )
    r = highlight(df, "text", ["needle"], frag_size=20, lead=5).collect()[0]
    assert r.first_pos == 52
    # 20 raw chars starting 5 before the match, then markup
    assert r.fragment == "xxxx <em>needle</em> yyyyyyyy"


def test_mlt_terms_gates_and_order(idx):
    # doc 4: spark tf=4 (df=2 >= min_df with min_df=1); use low gates
    t = mlt_terms(idx, 4, min_tf=2, min_df=1, max_terms=5).collect()
    assert t[0].term == "spark" and t[0].tf == 4
    # min_tf=2 excludes every single-occurrence term
    assert all(r.tf >= 2 for r in t)


def test_more_like_this_excludes_source(idx):
    r = more_like_this(idx, 4, k=3, min_tf=2, min_df=1, max_terms=5).collect()
    assert all(row.doc_id != 4 for row in r)
    # doc 1 shares "spark" → retrieved
    assert r and r[0].doc_id == 1


def test_suggest_prefix_weight_order(idx):
    s = suggest_prefix(idx, "s", 10).collect()
    terms = [r.term for r in s]
    assert "spark" in terms and "segment" in terms
    weights = [r.weight for r in s]
    assert weights == sorted(weights, reverse=True)


def test_spellcheck_distance_rank(idx):
    s = spellcheck(idx, "spork", max_edits=2, k=5).collect()
    assert s[0].term == "spark" and s[0].distance == 1
    assert all(0 < r.distance <= 2 for r in s)


def test_spellcheck_excludes_exact(idx):
    s = spellcheck(idx, "spark", max_edits=2, k=5).collect()
    assert all(r.term != "spark" for r in s)
