"""UAX29URLEmailTokenizer vs the reference JUnit vectors.

Vectors from lucene/analysis/common/src/test/.../standard/
TestUAX29URLEmailTokenizer.java, plus a replay of the frozen
JVM-oracle fixture (scripts/make_uax29_fixture.py verified every row
against the compiled reference scanner at freeze time — 5905 docs
covering the reference's random URL/email resources, a structured
corpus, and full-BMP + astral sweeps).
"""

import os

import pandas as pd
import pytest

from lucene_solr_spark.analysis.uax29 import (
    MODES, uax29_serialize, uax29_tokenize)

FIX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark", "fixtures_data", "uax29_cases.parquet")


def terms(text, mtl=255):
    return [t.term for t in uax29_tokenize(text, max_token_length=mtl)]


def types(text):
    return [t.type for t in uax29_tokenize(text)]


@pytest.mark.parametrize("text,expect", [
    ("B2B", ["B2B"]),
    ("2B", ["2B"]),
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),
    ("ac/dc", ["ac", "dc"]),
    ("O'Reilly", ["O'Reilly"]),
    ("you're", ["you're"]),
    ("she's", ["she's"]),
    ("KIA 1000V", ["KIA", "1000V"]),
    ("David has 5000 bones", ["David", "has", "5000", "bones"]),
    ("C embedded developers wanted",
     ["C", "embedded", "developers", "wanted"]),
    ("foo bar FOO BAR", ["foo", "bar", "FOO", "BAR"]),
    ('"QUOTED" word', ["QUOTED", "word"]),
    ("R2D2 C3PO", ["R2D2", "C3PO"]),
    ("21.35", ["21.35"]),
    ("1,000", ["1,000"]),
    ("word_with_underscore", ["word_with_underscore"]),
    ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
])
def test_junit_word_break(text, expect):
    assert terms(text) == expect


@pytest.mark.parametrize("text,expect_terms,expect_types", [
    ("test@example.com", ["test@example.com"], ["<EMAIL>"]),
    ("first.lastname@example.com",
     ["first.lastname@example.com"], ["<EMAIL>"]),
    ("http://www.example.com/",
     ["http://www.example.com/"], ["<URL>"]),
    ("https://example.com?q=1#frag",
     ["https://example.com?q=1#frag"], ["<URL>"]),
    ("example.com", ["example.com"], ["<URL>"]),
    # LUCENE-5391: a no-scheme host followed by [-\w] is NOT a URL
    ("example.comX", ["example.comX"], ["<ALPHANUM>"]),
    # LUCENE-5391 pushback: host-prefix "216.239.63.10" + digit
    # follower rejects the URL parse -> NUM (JVM-verified)
    ("216.239.63.104", ["216.239.63.104"], ["<NUM>"]),
    ("1.2.3.4", ["1.2.3.4"], ["<URL>"]),
    ("216.239.63.104/health", ["216.239.63.104/health"], ["<URL>"]),
    ("mailto:test@example.org",
     ["mailto", "test@example.org"], ["<ALPHANUM>", "<EMAIL>"]),
    ("ftp://ftp.gnu.org/gnu/;type=d",
     ["ftp://ftp.gnu.org/gnu/;type=d"], ["<URL>"]),
])
def test_junit_url_email(text, expect_terms, expect_types):
    toks = uax29_tokenize(text)
    assert [t.term for t in toks] == expect_terms
    assert [t.type for t in toks] == expect_types


@pytest.mark.parametrize("text,expect", [
    ("💩", ["<EMOJI>"]),
    ("👍🏻", ["<EMOJI>"]),
    ("👩‍👩‍👧‍👦", ["<EMOJI>"]),
    ("#️⃣", ["<EMOJI>"]),
    ("🇺🇸🇫🇷", ["<EMOJI>", "<EMOJI>"]),
    ("日本", ["<IDEOGRAPHIC>", "<IDEOGRAPHIC>"]),
    ("ひらがな", ["<HIRAGANA>"] * 4),
    ("カタカナ", ["<KATAKANA>"]),
    ("한국어", ["<HANGUL>"]),
    ("ภาษาไทย", ["<SOUTHEAST_ASIAN>"]),
])
def test_junit_scripts_emoji(text, expect):
    assert types(text) == expect


def test_thai_extend_fuses_into_word():
    # Thai combining vowel U+0E31 is Complex_Context AND WB:Extend —
    # after a letter it absorbs (one ALPHANUM), standalone it is SEA
    toks = uax29_tokenize("aั1")
    assert [(t.term, t.type) for t in toks] == [("aั1", "<ALPHANUM>")]


def test_max_token_length_splits_not_skips():
    # the scanner buffer is sized to maxTokenLength, so overlong runs
    # SPLIT at the window (UAX29URLEmailTokenizer.java:139-163)
    toks = uax29_tokenize("x" * 7, max_token_length=3)
    assert [t.term for t in toks] == ["xxx", "xxx", "x"]
    assert [t.pos_inc for t in toks] == [1, 1, 1]


def test_offsets_utf16():
    toks = uax29_tokenize("ab \U0001F600 cd")
    assert [(t.term, t.start, t.end) for t in toks] == \
        [("ab", 0, 2), ("\U0001F600", 3, 5), ("cd", 6, 8)]


def test_fixture_replay_full():
    df = pd.read_parquet(FIX)
    assert len(df) > 3000 and set(df["mode"]) == set(MODES)
    for mode, inp, want in df.itertuples(index=False):
        assert uax29_serialize(inp, mode) == want
