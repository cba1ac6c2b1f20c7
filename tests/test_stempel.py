"""Stempel Polish stemmer — Egothor patch-command trie.

The full contract is pinned at fixture build (scripts/
make_stempel_fixture.py): 114k words stemmed identically to the
reference's own Trie/MultiTrie2/Diff/StempelStemmer compiled as a JVM
test oracle over stemmer_20000.tbl.  Here: the reference's JUnit
vectors (TestPolishAnalyzer.java:37-40), the StempelFilter gating
rules (StempelFilter.java:43,73-76), Diff.apply edit semantics
(Diff.java), and fixture replay.
"""

import os

import pandas as pd
import pytest

from lucene_solr_spark.analysis.stempel import (
    diff_apply,
    multi_last_on_path,
    stempel_polish_stem,
    stempel_stem_raw,
)

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark", "fixtures_data", "light_stems.parquet",
)


def test_junit_vectors():
    # TestPolishAnalyzer.testBasics
    assert stempel_polish_stem("studenta") == "student"
    assert stempel_polish_stem("studenci") == "student"
    # TestPolishAnalyzer.testExclude: without the keyword marker the
    # inflected form stems
    assert stempel_polish_stem("studentami") == "student"


def test_min_length_gate():
    # StempelFilter.DEFAULT_MIN_LENGTH = 3: length <= 3 passes through
    assert stempel_polish_stem("kot") == "kot"
    assert stempel_polish_stem("ab") == "ab"
    assert stempel_polish_stem("") == ""


def test_null_stem_keeps_original():
    # a word the table maps to an all-delete command (or no command)
    # must come back unchanged at filter level
    for w in ("xyzzyq", "qqqq", "aaaa"):
        raw = stempel_stem_raw(w)
        got = stempel_polish_stem(w)
        assert got == (raw if raw else w)


def test_diff_apply_commands():
    # '-a' moves the cursor (no edit), 'Da' deletes one, 'Rx'
    # replaces, 'Ix' inserts after the cursor
    buf = list("studenta")
    diff_apply(buf, "Da")
    assert "".join(buf) == "student"
    buf = list("studenta")
    diff_apply(buf, "-a")  # cursor move only
    assert "".join(buf) == "studenta"
    buf = list("abc")
    diff_apply(buf, "Rz")
    assert "".join(buf) == "abz"
    buf = list("abcdef")
    diff_apply(buf, "Dc")  # delete 3 ending at last char
    assert "".join(buf) == "abc"
    buf = list("abc")
    diff_apply(buf, "Ix")  # insert after last char
    assert "".join(buf) == "abcx"


def test_diff_apply_partial_on_out_of_bounds():
    # Java catches StringIndexOutOfBounds mid-script and KEEPS the
    # partial edit (Diff.java apply catch block)
    buf = list("ab")
    diff_apply(buf, "-a-a-aRz")  # third pop moves pos below 0; R throws
    assert "".join(buf) == "ab"  # pops don't edit, R never lands


def test_multi_last_on_path_shape():
    cmd = multi_last_on_path("studenta")
    assert isinstance(cmd, str) and len(cmd) % 2 == 0 and cmd
    # every pair is (op, param) with op in the patch alphabet
    assert all(c in "-RDI" for c in cmd[::2])


def test_fixture_replay():
    df = pd.read_parquet(FIXTURE)
    sub = df[df.lang == "pl"]
    assert len(sub) >= 1000
    bad = [
        (w, want, stempel_polish_stem(w))
        for w, want in zip(sub.term, sub.stem)
        if stempel_polish_stem(w) != want
    ]
    assert not bad, f"{len(bad)} mismatches, e.g. {bad[:5]}"
