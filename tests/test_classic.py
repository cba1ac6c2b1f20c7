"""ClassicTokenizer/ClassicFilter vs the reference JUnit vectors.

Vectors from lucene/analysis/common/src/test/.../standard/
TestClassicAnalyzer.java (tokenizer+ClassicFilter level — lowercase/
stopword stages are exercised elsewhere), plus a replay of the frozen
JVM-oracle fixture (scripts/make_classic_fixture.py verified every
row against the compiled reference scanner at freeze time).
"""

import os

import pandas as pd
import pytest

from lucene_solr_spark.analysis.classic import (
    MODES, classic_filter, classic_serialize, classic_tokenize)

FIX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark", "fixtures_data", "classic_cases.parquet")


def terms(text, filtered=False, mtl=255):
    toks = classic_tokenize(text, max_token_length=mtl)
    if filtered:
        toks = classic_filter(toks)
    return [t.term for t in toks]


def types(text):
    return [t.type for t in classic_tokenize(text)]


@pytest.mark.parametrize("text,expect", [
    ("B2B", ["B2B"]),
    ("2B", ["2B"]),
    ("word_having_underscore", ["word", "having", "underscore"]),
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),
    ("ac/dc", ["ac", "dc"]),
    ("David has 5000 bones", ["David", "has", "5000", "bones"]),
    ("\"QUOTED\" word", ["QUOTED", "word"]),
    ("C++", ["C"]),
    ("C#", ["C"]),
    ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
    ("test@example.com", ["test@example.com"]),
    ("first.lastname@example.com", ["first.lastname@example.com"]),
    ("first_lastname@example.com", ["first_lastname@example.com"]),
    ("21.35", ["21.35"]),
    ("R2D2 C3PO", ["R2D2", "C3PO"]),
    ("216.239.63.104", ["216.239.63.104"]),
    ("1-2-3", ["1-2-3"]),
    ("a1-b2-c3", ["a1-b2-c3"]),
    ("a1-b-c3", ["a1-b-c3"]),
])
def test_junit_terms(text, expect):
    assert terms(text) == expect


@pytest.mark.parametrize("text,expect", [
    ("O'Reilly", ["O'Reilly"]),
    ("you're", ["you're"]),
    ("she's", ["she"]),
    ("Jim's", ["Jim"]),
    ("don't", ["don't"]),
    ("O'Reilly's", ["O'Reilly"]),
    ("U.S.A.", ["USA"]),
    ("www.nutch.org.", ["www.nutch.org"]),
])
def test_junit_filtered(text, expect):
    assert terms(text, filtered=True) == expect


@pytest.mark.parametrize("text,expect", [
    ("www.nutch.org", ["<HOST>"]),
    ("www.nutch.org.", ["<HOST>"]),      # ACRONYM_DEP retyped
    ("2004.jpg", ["<HOST>"]),
    ("62.46", ["<HOST>"]),
    ("978-0-94045043-1", ["<NUM>"]),
    ("78academyawards/rules/rule02.html", ["<NUM>"]),
    ("2006-03-11t082958z_01_ban130523_rtridst_0_ozabs", ["<NUM>"]),
    ("mid-20th", ["<NUM>"]),
    ("AT&T", ["<COMPANY>"]),
    ("Excite@Home", ["<COMPANY>"]),
    ("U.S.A.", ["<ACRONYM>"]),
    ("日本", ["<CJ>", "<CJ>"]),
])
def test_junit_types(text, expect):
    assert types(text) == expect


def test_compliance_many_tokens():
    text = ("/money.cnn.com/magazines/fortune/fortune_archive/2007/03/19/"
            "8402357/index.htm safari-0-sheikh-zayed-grand-mosque.jpg")
    toks = classic_tokenize(text)
    assert [t.term for t in toks] == [
        "money.cnn.com", "magazines", "fortune", "fortune",
        "archive/2007/03/19/8402357", "index.htm", "safari-0-sheikh",
        "zayed", "grand", "mosque.jpg"]
    assert [t.type for t in toks] == [
        "<HOST>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<NUM>",
        "<HOST>", "<NUM>", "<ALPHANUM>", "<ALPHANUM>", "<HOST>"]


def test_max_token_length_pos_inc():
    toks = classic_tokenize("ab cd toolong xy z", max_token_length=5)
    assert [t.term for t in toks] == ["ab", "cd", "xy", "z"]
    assert [t.pos_inc for t in toks] == [1, 1, 2, 1]
    long255 = "a" * 255
    assert terms("ab cd %s xy z" % long255) == \
        ["ab", "cd", long255, "xy", "z"]
    assert terms("ab cd %sa xy z" % long255) == ["ab", "cd", "xy", "z"]


def test_offsets_and_non_bmp():
    toks = classic_tokenize("ab \U0001F600 cd")
    # UTF-16 offsets: the emoji is two code units of filler
    assert [(t.term, t.start, t.end) for t in toks] == \
        [("ab", 0, 2), ("cd", 6, 8)]


def test_fixture_replay_full():
    df = pd.read_parquet(FIX)
    assert len(df) > 4000 and set(df["mode"]) == set(MODES)
    for mode, inp, want in df.itertuples(index=False):
        assert classic_serialize(inp, mode) == want
