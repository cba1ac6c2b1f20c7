"""Compound decompounding — reference JUnit vectors replayed.

Every vector is from lucene/analysis/common/src/test/org/apache/
lucene/analysis/compound/TestCompoundWordTokenFilter.java; the Danish
hyphenation patterns are the frozen da_UTF8.xml table
(fixtures_data/hyphenation_da.json, scripts/make_compound_fixture.py).
"""

import pytest

from lucene_solr_spark.analysis.compound import (
    COMPOUND_CASES,
    dictionary_decompound,
    hyphenate,
    hyphenation_decompound,
    load_hyphenation_fixture,
)


@pytest.fixture(scope="module")
def da():
    return load_hyphenation_fixture("hyphenation_da")


def test_hyphenation_compound_words_da(da):
    # testHyphenationCompoundWordsDA
    out = hyphenation_decompound(
        "min veninde som er lidt af en læsehest".split(),
        da, ["læse", "hest"])
    assert out == ["min", "veninde", "som", "er", "lidt", "af", "en",
                   "læsehest", "læse", "hest"]


def test_hyphenation_compound_words_de_longest_match(da):
    # testHyphenationCompoundWordsDELongestMatch
    out = hyphenation_decompound(
        ["basketballkurv"], da,
        ["basketball", "basket", "ball", "kurv"],
        max_subword_size=40, only_longest_match=True)
    assert out == ["basketballkurv", "basketball", "ball", "kurv"]


def test_hyphenation_only(da):
    # testHyphenationOnly — min/max subword windows, no dictionary
    out = hyphenation_decompound(["basketballkurv"], da, None,
                                 min_subword_size=2, max_subword_size=4)
    assert out == ["basketballkurv", "ba", "sket", "bal", "ball", "kurv"]

    out = hyphenation_decompound(["basketballkurv"], da, None,
                                 min_subword_size=4, max_subword_size=6)
    assert out == ["basketballkurv", "basket", "sket", "ball", "lkurv",
                   "kurv"]

    out = hyphenation_decompound(["basketballkurv"], da, None,
                                 min_subword_size=4, max_subword_size=10)
    assert out == ["basketballkurv", "basket", "basketbal", "basketball",
                   "sket", "sketbal", "sketball", "ball", "ballkurv",
                   "lkurv", "kurv"]


SE_DICT = ["Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
           "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare",
           "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad"]


def test_dumb_compound_words_se():
    # testDumbCompoundWordsSE
    out = dictionary_decompound(
        ("Bildörr Bilmotor Biltak Slagborr Hammarborr Pelarborr "
         "Glasögonfodral Basfiolsfodral Basfiolsfodralmakaregesäll "
         "Skomakare Vindrutetorkare Vindrutetorkarblad abba").split(),
        SE_DICT)
    assert out == [
        "Bildörr", "Bil", "dörr", "Bilmotor", "Bil", "motor",
        "Biltak", "Bil", "tak", "Slagborr", "Slag", "borr",
        "Hammarborr", "Hammar", "borr", "Pelarborr", "Pelar", "borr",
        "Glasögonfodral", "Glas", "ögon", "fodral",
        "Basfiolsfodral", "Bas", "fiol", "fodral",
        "Basfiolsfodralmakaregesäll", "Bas", "fiol", "fodral",
        "makare", "gesäll",
        "Skomakare", "Sko", "makare",
        "Vindrutetorkare", "Vind", "rute", "torkare",
        "Vindrutetorkarblad", "Vind", "rute", "blad", "abba"]


def test_dumb_compound_words_se_longest_match():
    # testDumbCompoundWordsSELongestMatch
    dict_lm = ["Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
               "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiols",
               "Makare", "Gesäll", "Sko", "Vind", "Rute", "Torkare",
               "Blad", "Fiolsfodral"]
    out = dictionary_decompound(["Basfiolsfodralmakaregesäll"], dict_lm,
                                only_longest_match=True)
    assert out == ["Basfiolsfodralmakaregesäll", "Bas", "fiolsfodral",
                   "fodral", "makare", "gesäll"]


def test_token_ending_with_word_component_of_minimum_length():
    # testTokenEndingWithWordComponentOfMinimumLength
    out = dictionary_decompound(["abcdef"], ["ab", "cd", "ef"])
    assert out == ["abcdef", "ab", "cd", "ef"]


def test_word_component_with_less_than_minimum_length():
    # testWordComponentWithLessThanMinimumLength — "d" < minSubwordSize
    out = dictionary_decompound(["abcdefg"], ["abc", "d", "efg"])
    assert out == ["abcdefg", "abc", "efg"]


def test_hyphenate_points(da):
    # the interior hyphenation points behind testHyphenationOnly
    assert hyphenate("basketballkurv", da) == [0, 2, 6, 9, 10, 14]


def test_short_and_nonletter_words(da):
    # words below minWordSize pass through; interior non-letters are
    # unhyphenatable (HyphenationTree.java:321 returns null)
    assert hyphenation_decompound(["hest"], da, ["hest"]) == ["hest"]
    assert hyphenation_decompound(["læse-hest99x"], da, ["læse", "hest"]) \
        == ["læse-hest99x"]


def test_case_insensitive_dictionary():
    # CharArraySet(..., ignoreCase=true): dict entries match any case;
    # emitted subwords slice the original token (case preserved)
    assert dictionary_decompound(["BILDÖRR"], ["Bil", "Dörr"]) == [
        "BILDÖRR", "BIL", "DÖRR"]


def test_compound_cases_registry(da):
    assert set(COMPOUND_CASES) == {
        "dict_se", "dict_se_longest", "hyph_da_dict",
        "hyph_da_longest", "hyph_da_2_4", "hyph_da_4_10"}
    assert COMPOUND_CASES["hyph_da_dict"](["læsehest"]) == [
        "læsehest", "læse", "hest"]
