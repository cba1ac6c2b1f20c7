"""Phonetic encoder family vs the reference's pinned test vectors.

Pins come from the reference's own filter tests
(lucene/analysis/phonetic/src/test/.../TestPhoneticFilter.java:41-70,
TestPhoneticFilterFactory.java:128-164, DoubleMetaphoneFilterTest.java,
TestDaitchMokotoffSoundexFilter.java:35-40); the full-vocabulary
verification against the real commons-codec (27.9k words per encoder,
zero mismatches) runs at fixture build (scripts/
make_phonetic_fixture.py) and is re-checked here over the frozen
sample.
"""

import os

import pandas as pd
import pytest

from lucene_solr_spark.analysis.encoders import (
    caverphone2,
    cologne_phonetic,
    daitch_mokotoff,
    double_metaphone,
    double_metaphone_alternate,
    metaphone,
    nysiis,
    refined_soundex,
)
from lucene_solr_spark.analysis.phonetic import (
    dm_soundex_filter_tokens,
    phonetic_filter_tokens,
)

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark", "fixtures_data", "phonetic_codes.parquet")


# ----------------------------------------------------- encoder pins
def test_metaphone_reference_vectors():
    # TestPhoneticFilter.java:41-44
    assert metaphone("aaa") == "A"
    assert metaphone("bbb") == "B"
    assert metaphone("ccc") == "KKK"
    assert metaphone("easgasg") == "ESKS"


def test_double_metaphone_reference_vectors():
    # DoubleMetaphoneFilterTest.java:31-58
    assert double_metaphone("international") == "ANTR"
    assert double_metaphone("international", 8) == "ANTRNXNL"
    assert double_metaphone("Kuczewski") == "KSSK"
    assert double_metaphone_alternate("Kuczewski") == "KXFS"
    assert double_metaphone("hello") == "HL"
    # TestPhoneticFilter.java:46-49
    assert double_metaphone("bbb") == "PP"
    assert double_metaphone("ccc") == "KK"
    assert double_metaphone("easgasg") == "ASKS"


def test_refined_soundex_reference_vectors():
    # TestPhoneticFilter.java:56-59
    assert refined_soundex("aaa") == "A0"
    assert refined_soundex("bbb") == "B1"
    assert refined_soundex("ccc") == "C3"
    assert refined_soundex("easgasg") == "E034034"


def test_caverphone2_reference_vectors():
    # TestPhoneticFilter.java:61-65
    assert caverphone2("Darda") == "TTA1111111"
    assert caverphone2("Karleen") == "KLN1111111"
    assert caverphone2("Datha") == "TTA1111111"
    assert caverphone2("Carlene") == "KLN1111111"


def test_cologne_reference_vectors():
    # TestPhoneticFilterFactory.java:154-158
    assert cologne_phonetic("Meier") == "67"
    assert cologne_phonetic("Schmitt") == "862"
    assert cologne_phonetic("Meir") == "67"
    assert cologne_phonetic("Schmidt") == "862"


def test_nysiis_reference_vectors():
    # TestPhoneticFilterFactory.java:160-164, TestPhoneticFilter:67-70
    assert nysiis("Macintosh") == "MCANT"
    assert nysiis("Knuth") == "NAT"
    assert nysiis("Bart") == "BAD"
    assert nysiis("Hurd") == "HAD"
    assert nysiis("easgasg") == "EASGAS"


def test_daitch_mokotoff_reference_vectors():
    # TestDaitchMokotoffSoundexFilter.java:35-40
    assert daitch_mokotoff("aaa") == ["000000"]
    assert daitch_mokotoff("bbb") == ["700000"]
    assert daitch_mokotoff("ccc") == [
        "400000", "450000", "454000", "540000", "545000", "500000"]
    assert daitch_mokotoff("easgasg") == ["045450"]


# ------------------------------------------------- filter semantics
def test_phonetic_filter_inject_order():
    # TestPhoneticFilter.java:41-44 — code first, then original
    toks = ["aaa", "bbb", "ccc", "easgasg"]
    assert phonetic_filter_tokens(toks, "Metaphone", True) == [
        "A", "aaa", "B", "bbb", "KKK", "ccc", "ESKS", "easgasg"]
    assert phonetic_filter_tokens(toks, "Metaphone", False) == [
        "A", "B", "KKK", "ESKS"]


def test_phonetic_filter_nonconvertible_passthrough():
    # DoubleMetaphoneFilterTest.java:55-69
    toks = ["12345", "#$%@#^%&"]
    assert phonetic_filter_tokens(toks, "DoubleMetaphone", True) == toks
    assert phonetic_filter_tokens(toks, "DoubleMetaphone", False) == toks
    assert phonetic_filter_tokens(
        ["12345", "#$%@#^%&", "hello"], "DoubleMetaphone", False
    ) == ["12345", "#$%@#^%&", "HL"]


def test_dm_filter_inject_semantics():
    # TestDaitchMokotoffSoundexFilter.java:35-40
    assert dm_soundex_filter_tokens(["aaa", "bbb"], True) == [
        "aaa", "000000", "bbb", "700000"]
    assert dm_soundex_filter_tokens(["ccc"], False) == [
        "400000", "450000", "454000", "540000", "545000", "500000"]
    # non-convertible tokens pass through (filter behavior pinned by
    # testNonConvertableStringsWithoutInject)
    assert dm_soundex_filter_tokens(["12345"], False) == ["12345"]


def test_unknown_encoder_raises():
    with pytest.raises(KeyError):
        phonetic_filter_tokens(["x"], "NoSuchEncoder", True)


# ------------------------------------------------ frozen-sample parity
@pytest.mark.parametrize("encoder,fn", [
    ("metaphone", metaphone),
    ("dmeta", double_metaphone),
    ("dmeta_alt", double_metaphone_alternate),
    ("refined_soundex", refined_soundex),
    ("caverphone2", caverphone2),
    ("cologne", cologne_phonetic),
    ("nysiis", nysiis),
    ("daitch_mokotoff", lambda w: "|".join(daitch_mokotoff(w))),
])
def test_golden_sample(encoder, fn):
    df = pd.read_parquet(FIXTURE)
    sub = df[df.encoder == encoder]
    assert len(sub) > 300
    bad = [(t, want, fn(t)) for t, want in zip(sub.term, sub.code)
           if fn(t) != want]
    assert not bad, f"{encoder}: {len(bad)} mismatches, e.g. {bad[:5]}"
