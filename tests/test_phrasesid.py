"""PhrasesIdentificationComponent analog (search/phrasesid.py):
closed-form score on a hand-computable corpus + the greedy
non-overlap response selection."""

import math

from lucene_solr_spark.search.phrasesid import (
    enumerate_phrases,
    select_phrases,
)


def test_enumerate_phrases_order_and_flags():
    ps = enumerate_phrases(["a", "b", "c"], max_indexed=2, max_query=3)
    # position ascending then length ascending, indexed iff len<=2
    assert [(p[0], p[1]) for p in ps] == [
        (0, 1), (0, 2), (0, 3), (1, 1), (1, 2), (2, 1),
    ]
    assert [p[3] for p in ps] == [True, True, False, True, True, True]


def test_select_phrases_greedy_non_overlap():
    scored = [
        (0, 2, ("a", "b"), 0.9),
        (1, 2, ("b", "c"), 0.8),   # overlaps winner at position 1
        (2, 1, ("c",), 0.5),
        (3, 1, ("d",), 0.0),       # score <= 0 dropped
        (0, 1, ("a",), -1.0),
    ]
    kept = select_phrases(scored)
    assert [(s, l) for s, l, _, _ in kept] == [(0, 2), (2, 1)]


def test_phrases_identification_hand_corpus(spark):
    """3-doc corpus where 'big data' is a true collocation: hand-check
    of computeFieldScore for the bigram candidate."""
    from lucene_solr_spark.search.phrasesid import (
        phrases_identification,
    )
    from pyspark.sql import functions as F

    texts = [
        "big data big data lake",
        "data big data flows",
        "big sur data",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "term"),
    )
    out = {
        (r["pos_start"], r["pos_len"]): r
        for r in phrases_identification(
            toks, ["big", "data"], max_indexed=2, max_query=2
        ).collect()
    }
    # stats: ttf(big)=4, ttf(data)=5, ttf('big data')=3 (adjacent),
    # conj{big,data}=3 docs
    # words==phrase: phrase_prob=1, wrapper=0 (no longer indexed span)
    # score = [ (3/4)*(1-0) - (3/5)*(1-(1-0)) ] * 1/(1+2-2) * (3/3)
    #       = 0.75
    big_data = out[(0, 2)]
    assert math.isclose(big_data["score"], 0.75, abs_tol=1e-9)
    assert big_data["selected"] is True
    # unigrams score exactly 0 and lose to the selected bigram span
    assert out[(0, 1)]["score"] == 0.0
    assert out[(1, 1)]["score"] == 0.0
    assert out[(0, 1)]["selected"] is False


def test_phrases_identification_absent_word(spark):
    from lucene_solr_spark.search.phrasesid import (
        phrases_identification,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, "only known words here")], "doc_id long, text string"
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "term"),
    )
    out = {
        (r["pos_start"], r["pos_len"]): r["score"]
        for r in phrases_identification(
            toks, ["known", "zzz"], max_indexed=2, max_query=2
        ).collect()
    }
    assert out[(1, 1)] == -1.0   # absent word
    assert out[(0, 2)] == -1.0   # phrase containing it
    assert out[(0, 1)] == 0.0
