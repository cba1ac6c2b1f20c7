"""Full WordDelimiterGraphFilter vs the reference JUnit vectors.

Vectors from lucene/analysis/common/src/test/.../miscellaneous/
TestWordDelimiterGraphFilter.java, plus a replay of the frozen
JVM-oracle fixture (scripts/make_wdgf_fixture.py verified every row —
term+posInc+posLen+offsets — against the compiled reference filter at
freeze time, 5744 cases across 8 flag modes).
"""

import os

import pandas as pd
import pytest

from lucene_solr_spark.analysis.worddelim import (
    CATENATE_ALL, CATENATE_NUMBERS, CATENATE_WORDS,
    GENERATE_NUMBER_PARTS, GENERATE_WORD_PARTS, MODES,
    PRESERVE_ORIGINAL, SPLIT_ON_CASE_CHANGE, SPLIT_ON_NUMERICS,
    STEM_ENGLISH_POSSESSIVE, WordDelimiterGraph, wdgf_serialize,
    wdgf_tokenize)

FIX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark", "fixtures_data", "wdgf_cases.parquet")

ALL_SPLIT = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
             | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
             | STEM_ENGLISH_POSSESSIVE)


def run(flags, term, prot=None, adjust=True):
    f = WordDelimiterGraph(flags, prot_words=prot,
                           adjust_internal_offsets=adjust)
    return f.process_token(term, 0, len(term))


def terms(flags, term, **kw):
    return [t.term for t in run(flags, term, **kw)]


def test_junit_splits():
    assert terms(ALL_SPLIT, "PowerShot") == ["Power", "Shot"]
    assert terms(ALL_SPLIT, "Power-Shot") == ["Power", "Shot"]
    assert terms(ALL_SPLIT, "O'Neil's") == ["O", "Neil"]
    assert terms(ALL_SPLIT, "j2se") == ["j", "2", "se"]
    assert terms(ALL_SPLIT, "500-42") == ["500", "42"]
    # lower->UPPER splits, but UPPER->letter does NOT (isBreak's
    # "UPPER->letter: Don't split" rule) — JVM-verified
    assert terms(ALL_SPLIT, "TransAM") == ["Trans", "AM"]
    assert terms(ALL_SPLIT, "ABCDef") == ["ABCDef"]


def test_no_case_split():
    flags = GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS \
        | SPLIT_ON_NUMERICS
    assert terms(flags, "PowerShot") == ["PowerShot"]
    assert terms(flags, "Power-Shot") == ["Power", "Shot"]


def test_no_numeric_split():
    flags = GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS \
        | SPLIT_ON_CASE_CHANGE
    assert terms(flags, "j2se") == ["j2se"]
    assert terms(flags, "Power2Shot") == ["Power2Shot"]


def test_catenate_words():
    flags = ALL_SPLIT | CATENATE_WORDS
    got = run(flags, "wi-fi")
    assert [(t.term, t.pos_inc, t.pos_len) for t in got] == [
        ("wifi", 1, 2), ("wi", 0, 1), ("fi", 1, 1)]


def test_catenate_all_and_preserve():
    flags = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
             | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
             | CATENATE_ALL | PRESERVE_ORIGINAL)
    got = run(flags, "wi-fi-4000")
    # original first (posLen spans the whole graph), then parts
    assert got[0].term == "wi-fi-4000" and got[0].pos_len == 3
    assert [t.term for t in got[1:]] == ["wifi4000", "wi", "fi", "4000"]


def test_catenate_numbers():
    flags = GENERATE_NUMBER_PARTS | CATENATE_NUMBERS \
        | SPLIT_ON_NUMERICS
    got = run(flags, "500-42")
    assert [(t.term, t.pos_inc) for t in got] == [
        ("50042", 1), ("500", 0), ("42", 1)]


def test_protected_words():
    flags = GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS \
        | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
    assert terms(flags, "mp3", prot=("mp3",)) == ["mp3"]
    assert terms(flags, "mp3") == ["mp", "3"]


def test_delimiter_only_token_creates_hole():
    f = WordDelimiterGraph(ALL_SPLIT)
    assert f.process_token("----", 0, 4) == []
    nxt = f.process_token("abc", 5, 8)
    # the swallowed token's posInc accumulates into the next token
    assert [(t.term, t.pos_inc) for t in nxt] == [("abc", 2)]


def test_offsets_adjusted_and_clamped():
    got = run(ALL_SPLIT, "Power-Shot")
    assert [(t.term, t.start, t.end) for t in got] == [
        ("Power", 0, 5), ("Shot", 6, 10)]
    got = run(ALL_SPLIT, "Power-Shot", adjust=False)
    assert [(t.term, t.start, t.end) for t in got] == [
        ("Power", 0, 10), ("Shot", 0, 10)]


def test_full_stream_positions():
    got = wdgf_tokenize("PowerShot500-42 NASA", "full")
    assert [(t.term, t.pos_inc, t.pos_len) for t in got] == [
        ("PowerShot", 1, 2), ("Power", 0, 1), ("Shot", 1, 1),
        ("50042", 1, 2), ("500", 0, 1), ("42", 1, 1), ("NASA", 1, 1)]


def test_flatten_graph_sausage():
    # FlattenGraphFilter: the catall graph (wifi4000 posLen 3 spanning
    # wi/fi/4000) collapses into a linear chain where every path
    # touches every node — posLen is recomputed on output numbering
    from lucene_solr_spark.analysis.flattengraph import flatten_graph

    flat = flatten_graph(wdgf_tokenize("wi-fi-4000", "catall"))
    assert [(t.term, t.pos_inc, t.pos_len) for t in flat] == [
        ("wi-fi-4000", 1, 3), ("wifi4000", 0, 3), ("wi", 0, 1),
        ("fi", 1, 1), ("4000", 1, 1)]


def test_flatten_graph_hole():
    from lucene_solr_spark.analysis.flattengraph import flatten_graph

    f = WordDelimiterGraph(ALL_SPLIT)
    toks = f.process_token("----", 0, 4) + f.process_token("ab", 5, 7)
    flat = flatten_graph(toks)
    # the hole survives flattening as a posInc=2
    assert [(t.term, t.pos_inc) for t in flat] == [("ab", 2)]


def test_fixture_replay_full():
    df = pd.read_parquet(FIX)
    assert len(df) > 2000 and set(df["mode"]) == set(MODES)
    for mode, inp, want in df.itertuples(index=False):
        assert wdgf_serialize(inp, mode) == want
