"""Hunspell stemmer vs the reference's 30 unit-test dictionaries.

Every assertStemsTo vector from the reference hunspell test suite
(extracted mechanically into fixtures_data/hunspell_tests.json.gz by
scripts/make_hunspell_fixture.py) replays against the live
implementation, plus HunspellStemFilter-level semantics.
"""

import gzip
import json
import os

import pytest

from lucene_solr_spark.analysis.hunspell import (
    HunspellDictionary,
    hunspell_stem_tokens,
)

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark", "fixtures_data", "hunspell_tests.json.gz")


def _suites():
    with gzip.open(FIXTURE, "rt", encoding="utf-8") as f:
        return json.load(f)


SUITES = _suites()


@pytest.mark.parametrize("name", sorted(SUITES))
def test_reference_vectors(name):
    cfg = SUITES[name]
    d = HunspellDictionary(cfg["aff"], cfg["dics"], cfg["ignore_case"])
    bad = []
    for case in cfg["cases"]:
        got = sorted(d.stem(case["word"]))
        if got != case["stems"]:
            bad.append((case["word"], case["stems"], got))
    assert not bad, f"{name}: {bad[:5]}"


def test_fixture_coverage():
    # the reference test tree carries 30 StemmerTestBase suites
    assert len(SUITES) == 30
    assert sum(len(s["cases"]) for s in SUITES.values()) == 281


def test_unique_stems_dedup():
    cfg = SUITES["Homonyms"]
    d = HunspellDictionary(cfg["aff"], cfg["dics"], cfg["ignore_case"])
    stems = d.stem("works")  # noun and verb homonyms -> dup stems
    assert sorted(stems) == ["work", "work"]
    assert d.unique_stems("works") == ["work"]


def test_stem_filter_semantics():
    cfg = SUITES["TwoSuffixes"]
    d = HunspellDictionary(cfg["aff"], cfg["dics"], cfg["ignore_case"])
    # stems replace the token; unknown tokens pass through
    assert hunspell_stem_tokens(d, ["drinkable", "zzz"]) == [
        "drink", "zzz"]


def test_longest_only():
    cfg = SUITES["Stemmer"]
    d = HunspellDictionary(cfg["aff"], cfg["dics"], cfg["ignore_case"])
    multi = [w for w in ("ab", "apach", "foos", "food")
             if len(d.unique_stems(w)) > 1]
    for w in multi:
        longest = hunspell_stem_tokens(d, [w], longest_only=True)
        best = max(len(s) for s in d.unique_stems(w))
        assert all(len(s) == best for s in longest)


def test_case_variant_union():
    cfg = SUITES["CaseSensitive"]
    d = HunspellDictionary(cfg["aff"], cfg["dics"], cfg["ignore_case"])
    # UPPER input unions exact, title, and lower stems
    for case in cfg["cases"]:
        assert sorted(d.stem(case["word"])) == case["stems"]
