"""Morfologik FSA5 dictionary lemmatization tests.

Pinned against the reference's own shipped custom-dictionary.dict and
the TestMorfologikFilterFactory.testExplicitDictionary JUnit vector
(the Polish default dictionary lives in the external
morfologik-stemming artifact — declared scope in analysis/morfologik.py).
"""

import os

import pytest

from lucene_solr_spark.analysis.morfologik import (
    FSA5, MorfologikDictionary, _decode_stem, morfologik_filter_tokens,
)

_FIX = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "lucene_solr_spark", "fixtures_data")


@pytest.fixture(scope="module")
def custom_dict():
    return MorfologikDictionary.load(
        os.path.join(_FIX, "morfologik_custom.dict"),
        os.path.join(_FIX, "morfologik_custom.info"))


def test_metadata_parsed(custom_dict):
    assert custom_dict.separator == b";"
    assert custom_dict.encoder == "INFIX"
    assert custom_dict.encoding.upper() == "UTF-8"


def test_fsa_header(custom_dict):
    fsa = custom_dict.fsa
    assert fsa.gtl == 2 and fsa.node_data_len == 0
    assert fsa.filler == ord("_") and fsa.annotation == ord("+")


def test_fsa_language(custom_dict):
    # full language of the shipped automaton
    seqs = sorted(custom_dict.fsa.completions(b""))
    assert seqs == [b"inflected1;ADFmma1;tag1", b"inflected2;ADFmma2;tag2"]


def test_lookup(custom_dict):
    assert custom_dict.lookup("inflected1") == [("lemma1", "tag1")]
    assert custom_dict.lookup("inflected2") == [("lemma2", "tag2")]
    assert custom_dict.lookup("nope") == []


# TestMorfologikFilterFactory.testExplicitDictionary
def test_junit_explicit_dictionary_vector(custom_dict):
    assert morfologik_filter_tokens(
        ["inflected1", "inflected2"], custom_dict) == ["lemma1", "lemma2"]


def test_filter_keeps_unknown_and_lowercases(custom_dict):
    assert morfologik_filter_tokens(
        ["Inflected1", "other"], custom_dict) == ["lemma1", "other"]


def test_stem_decoders():
    # 'A'-biased byte-count decoders (morfologik stemming encoders)
    assert _decode_stem("NONE", b"abc", b"xyz") == b"xyz"
    # SUFFIX: strip k bytes from the end, append rest
    assert _decode_stem("SUFFIX", b"walking", b"Dk") == b"walkk"[:5]
    assert _decode_stem("SUFFIX", b"walking", b"A") == b"walking"
    # PREFIX: strip p from start, k from end, append rest
    assert _decode_stem("PREFIX", b"unwalked", b"CCs") == b"walks"
    # INFIX: remove infix (pos, len), strip suffix, append rest
    assert _decode_stem("INFIX", b"inflected1", b"ADFmma1") == b"lemma1"


def test_rejects_bad_magic():
    with pytest.raises(ValueError):
        FSA5(b"NOPE" + b"\x00" * 16)
