"""Gopher/C4 pretraining-data filter operators — hand-computed cases.

Definitions pinned in operators/textqual.py (Rae et al. 2021 A1.1;
Raffel et al. 2020 §2.2); these tests fix the arithmetic on tiny frames
where every metric can be verified by hand.
"""

import pytest

from lucene_solr_spark.operators import textqual as tq


def _one(df, doc_id=0):
    return {r["doc_id"]: r.asDict() for r in df.collect()}[doc_id]


def test_pseudo_lines_windows(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "")], "doc_id long, text string"
    )
    rows = sorted(
        (r.doc_id, r.line_id, r.line, r.n_words)
        for r in tq.pseudo_lines(df, width=2).collect()
    )
    # doc 1 has no tokens -> no lines at all
    assert rows == [
        (0, 0, "a b", 2), (0, 1, "c d", 2), (0, 2, "e", 1)
    ]


def test_line_repetition_hand(spark):
    lines = spark.createDataFrame(
        [(0, 0, "x y"), (0, 1, "x y"), (0, 2, "z"), (1, 0, "q")],
        "doc_id long, line_id int, line string",
    )
    out = {r["doc_id"]: r.asDict() for r in tq.line_repetition(lines).collect()}
    # doc 0: 3 lines, 2 distinct; dup chars = one extra "x y" (3 chars)
    # of total 3+3+1=7
    assert out[0]["n_lines"] == 3
    assert out[0]["n_distinct_lines"] == 2
    assert out[0]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[0]["dup_line_char_frac"] == pytest.approx(3 / 7, abs=1e-6)
    assert out[1]["dup_line_frac"] == 0.0


def test_ngram_repetition_hand(spark):
    # tokens: a b a b a   bigrams: "a b"(2) "b a"(2); joined len = 9
    # 5-grams: one ("a b a b a"), count 1 -> dup frac 0
    df = spark.createDataFrame(
        [(0, "a b a b a")], "doc_id long, text string"
    )
    row = _one(tq.ngram_repetition(df, top_n=2, dup_n=5))
    # top bigram: cnt 2 x len 3 = 6 of 9 chars
    assert row["top2gram_char_frac"] == pytest.approx(6 / 9, abs=1e-6)
    assert row["dup5gram_char_frac"] == 0.0


def test_ngram_repetition_dup5(spark):
    text = "a b c d e a b c d e"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = _one(tq.ngram_repetition(df, top_n=2, dup_n=5))
    # "a b c d e" appears twice among the 6 5-grams: cov = 2*9 = 18 of 19
    assert row["dup5gram_char_frac"] == pytest.approx(18 / 19, abs=1e-6)


def test_gopher_quality_rules(spark):
    good = "the be to of and that have with " + "word " * 50
    short = "the be"
    symbols = "### " * 30 + "the be to of"
    df = spark.createDataFrame(
        [(0, good), (1, short), (2, symbols)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in tq.gopher_quality(df).collect()}
    assert out[0]["gq_keep"] == 1
    assert out[1]["gq_words_ok"] == 0 and out[1]["gq_keep"] == 0
    assert out[2]["gq_symbol_ok"] == 0 and out[2]["gq_keep"] == 0
    assert out[2]["gq_stop_hits"] == 4


def test_c4_line_filter_rules(spark):
    lines = spark.createDataFrame(
        [
            (0, 0, "this line has five words.", 5),
            (0, 1, "too short.", 2),
            (0, 2, "no terminal punctuation here at all", 6),
            (0, 3, "contains lorem ipsum so it is dropped.", 7),
            (0, 4, "has a { brace so dropped too.", 7),
            (1, 0, "one good line with enough words.", 6),
        ],
        "doc_id long, line_id int, line string, n_words int",
    )
    out = {r["doc_id"]: r.asDict() for r in tq.c4_line_filter(lines).collect()}
    assert out[0]["c4_n_lines"] == 5
    assert out[0]["c4_kept_lines"] == 1
    assert out[0]["c4_kept_chars"] == 25
    assert out[0]["c4_keep_doc"] == 0
    assert out[1]["c4_kept_lines"] == 1
