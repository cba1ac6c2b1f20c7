"""Lucene RegExp engine + SimplePattern tokenizers vs reference vectors.

Vectors from lucene/analysis/common/src/test/.../pattern/
TestSimplePatternTokenizer.java / TestSimplePatternSplitTokenizer.java
and lucene/core/src/test/.../automaton/TestRegExp.java semantics, plus
a replay of the frozen JVM-oracle fixture
(scripts/make_simplepattern_fixture.py verified 14952 pattern x doc
cases against the compiled reference — full util/automaton package +
both tokenizers — at freeze time).
"""

import os

import pandas as pd
import pytest

from lucene_solr_spark.analysis.luceneregex import compile_regexp
from lucene_solr_spark.analysis.simplepattern import (
    CASES, simplepattern_serialize, simplepattern_split_tokenize,
    simplepattern_tokenize)

FIX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark", "fixtures_data", "simplepattern_cases.parquet")


def toks(pattern, text):
    return [t.term for t in
            simplepattern_tokenize(text, compile_regexp(pattern))]


def stoks(pattern, text):
    return [t.term for t in
            simplepattern_split_tokenize(text, compile_regexp(pattern))]


# ---------------------------------------------------- RegExp language

@pytest.mark.parametrize("pattern,accept,reject", [
    ("[abc]+", ["a", "cab"], ["", "d", "abd"]),
    ("a|bc", ["a", "bc"], ["b", "abc"]),
    ("(ab)+c?", ["ab", "ababc"], ["a", "c"]),
    ("a{2,3}", ["aa", "aaa"], ["a", "aaaa"]),
    ("a{2,}", ["aa", "aaaaa"], ["a"]),
    ("~(abc)", ["", "ab", "abcd"], ["abc"]),
    ("[a-z]&[^m-z]", ["a", "l"], ["m", "A"]),
    ("<1-100>", ["1", "55", "100", "007", "0000100"], ["0", "101"]),
    ("<01-10>", ["01", "05", "10"], ["5", "11", "005"]),
    ('"a.b"', ["a.b"], ["axb"]),
    ("()", [""], ["a"]),
    ("a\\.b", ["a.b"], ["axb"]),
    (".", ["a", "\U0001F600"], ["", "ab"]),
    ("@", ["", "anything at all"], []),
    ("x#y", [], ["xy", "x", "y"]),          # '#' = empty LANGUAGE
    ("[^a]", ["b", "\U0001F600"], ["a", ""]),
    ("a[b-", [], []),                        # parsed below
])
def test_regexp_language(pattern, accept, reject):
    if pattern == "a[b-":
        with pytest.raises(ValueError):
            compile_regexp(pattern)
        return
    d = compile_regexp(pattern)
    for s in accept:
        assert d.run(s), (pattern, s)
    for s in reject:
        assert not d.run(s), (pattern, s)


def test_regexp_invalid_syntax():
    # pinned against the compiled reference: a bare '"' opens a quoted
    # string, so the unescaped form is a parse error
    with pytest.raises(ValueError):
        compile_regexp('"[^"]*"|[a-z]+')
    # trailing '-' inside a class consumes ']' as the range end
    with pytest.raises(ValueError):
        compile_regexp("[,. ;-]+")


# ------------------------------------------------------ tokenizer loop

def test_basic_pattern():
    # TestSimplePatternTokenizer.testBasic analog
    assert toks("[a-z]+", "hello big world") == \
        ["hello", "big", "world"]


def test_greedy_longest_match():
    assert toks("(ab)+", "ababab ab abab") == ["ababab", "ab", "abab"]


def test_false_alarm_restarts_one_unit_later():
    # "aaab" vs pattern aab: scan from 0 fails after aa; restart at 1
    assert toks("aab", "aaab") == ["aab"]


def test_eof_without_accept_ends_tokenization():
    # the reference returns false when the DFA is mid-scan at EOF with
    # no recorded accept — later viable tokens are NOT emitted
    assert toks('"ab"', "xx ab") == ["ab"]
    assert toks('"abc"', "ab") == []


def test_offsets_utf16():
    got = simplepattern_tokenize("x 😀y😀 x",
                                 compile_regexp("[^ ]+"))
    assert [(t.term, t.start, t.end) for t in got] == [
        ("x", 0, 1), ("😀y😀", 2, 7), ("x", 8, 9)]


def test_split_basic():
    # TestSimplePatternSplitTokenizer.testBasic analog
    assert stoks("[ \t\r\n]+", "a  b\tc") == ["a", "b", "c"]
    assert stoks(",", ",a,,b,") == ["a", "b"]


def test_split_greedy_separator():
    assert stoks("(--)|-", "a--b-c---d") == ["a", "b", "c", "d"]


def test_split_no_match_whole_text():
    assert stoks(",", "abc") == ["abc"]
    assert stoks(",", "") == []


def test_lone_surrogate_pairs_with_next_unit():
    # nextCodePoint composes a high surrogate with whatever unit
    # follows (no validation), so the SPACE is swallowed into the
    # composed code point and the token never breaks — pinned against
    # the compiled reference
    got = simplepattern_tokenize("a\ud83d b", compile_regexp("[^ ]+"))
    assert [(t.term, t.start, t.end) for t in got] == [
        ("a\ud83d b", 0, 4)]


def test_fixture_replay_full():
    df = pd.read_parquet(FIX)
    assert len(df) > 3000 and set(df["case"]) == set(CASES)
    for case, inp, want in df.itertuples(index=False):
        assert simplepattern_serialize(inp, case) == want
