"""CharTokenizer/NGram/Keyword tokenizers vs the reference JUnit vectors.

Vectors from lucene/analysis/common/src/test/.../core/
TestCharTokenizers.java, TestKeywordTokenizer.java and .../ngram/
{NGramTokenizerTest,EdgeNGramTokenizerTest}.java, plus a replay of
the frozen JVM-oracle fixture (scripts/make_chartok_fixture.py
verified every row against the compiled reference classes at freeze
time — 14997 cases over full-BMP + astral sweeps).
"""

import os

import pandas as pd
import pytest

from lucene_solr_spark.analysis.chartokenizers import (
    MODES, char_tokenize, chartok_serialize, chartok_tokens,
    keyword_tokenize, ngram_tokenize)

FIX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark", "fixtures_data", "chartok_cases.parquet")


def terms(text, kind, mtl=255):
    return [t.term for t in char_tokenize(text, kind, max_token_len=mtl)]


def test_letter_basic():
    assert terms("A2B can't x-ray", "letter") == \
        ["A", "B", "can", "t", "x", "ray"]
    assert terms("日本語 text", "letter") == ["日本語", "text"]


def test_whitespace_vs_unicode_whitespace():
    # U+00A0 NBSP: NOT Java isWhitespace, IS Unicode WHITESPACE
    assert terms("a\u00a0b", "ws") == ["a\u00a0b"]
    assert terms("a\u00a0b", "uws") == ["a", "b"]
    # U+001C FILE SEPARATOR: Java isWhitespace, NOT Unicode WHITESPACE
    assert terms("a\u001cb", "ws") == ["a", "b"]
    assert terms("a\u001cb", "uws") == ["a\u001cb"]


def test_max_token_len_splits():
    # TestCharTokenizers.testCustomMaxTokenLength analog: the cap
    # SPLITS runs (buffer-overflow break), it does not skip them
    assert terms("abcde fghij", "letter", mtl=3) == \
        ["abc", "de", "fgh", "ij"]
    # supplementary char may push a token to mtl+1 UTF-16 units
    toks = char_tokenize("a\U0001D400b", "letter", max_token_len=2)
    assert [t.term for t in toks] == ["a\U0001D400", "b"]
    assert [(t.start, t.end) for t in toks] == [(0, 3), (3, 4)]


def test_keyword_whole_input():
    assert keyword_tokenize("a b c") == [("a b c", 0, 5)]
    # empty input still emits one (empty) token — JVM-verified
    assert keyword_tokenize("") == [("", 0, 0)]


def test_ngram_reference_example():
    # NGramTokenizer javadoc: "abcde" minGram=2 maxGram=3
    toks = ngram_tokenize("abcde", 2, 3)
    assert [t.term for t in toks] == \
        ["ab", "abc", "bc", "bcd", "cd", "cde", "de"]
    assert [(t.start, t.end) for t in toks] == \
        [(0, 2), (0, 3), (1, 3), (1, 4), (2, 4), (2, 5), (3, 5)]


def test_edge_ngram():
    toks = ngram_tokenize("abcde", 1, 3, edges_only=True)
    assert [t.term for t in toks] == ["a", "ab", "abc"]
    assert ngram_tokenize("ab", 3, 5, edges_only=True) == []


def test_ngram_supplementary_offsets():
    # code-point grams, UTF-16 offsets
    toks = ngram_tokenize("\U0001D400b", 1, 2)
    assert [(t.term, t.start, t.end) for t in toks] == [
        ("\U0001D400", 0, 2), ("\U0001D400b", 0, 3), ("b", 2, 3)]


def test_fixture_replay_full():
    df = pd.read_parquet(FIX)
    assert len(df) > 8000 and set(df["mode"]) == set(MODES)
    for mode, inp, want in df.itertuples(index=False):
        assert chartok_serialize(inp, mode) == want
