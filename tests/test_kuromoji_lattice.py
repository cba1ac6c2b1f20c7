"""Kuromoji lattice segmentation over the real extracted lexicon.

The lexicon fixture is the complete surface-form set decoded from the
reference's shipped TokenInfoDictionary$fst.dat (version-6 Lucene FST,
BYTE2 labels, PositiveIntOutputs — scripts/make_kuromoji_fixture.py);
the cost model is a DECLARED substitute (buffer.dat with word costs is
absent from the reference tree — verified)."""

from lucene_solr_spark.analysis.cjk import segment_cjk
from lucene_solr_spark.analysis.kuromoji_lattice import (
    CLASS_NAMES,
    _chardef,
    _lexicon,
    char_class,
    lattice_segment,
)


def test_lexicon_extraction_stats():
    words, prefixes = _lexicon()
    # IPADIC-scale vocabulary, decoded from the real FST
    assert len(words) > 300_000
    for w in ("東京", "日本語", "形態素", "解析", "図書館",
              "東京大学", "乗り出せれ", "コーヒー"):
        assert w in words, w


def test_chardef_classes():
    classes, flags = _chardef()
    assert len(flags) == 12
    assert CLASS_NAMES[char_class("あ")] == "HIRAGANA"
    assert CLASS_NAMES[char_class("ア")] == "KATAKANA"
    assert CLASS_NAMES[char_class("漢")] == "KANJI"
    assert CLASS_NAMES[char_class("A")] == "ALPHA"
    assert CLASS_NAMES[char_class("7")] == "NUMERIC"
    # KATAKANA groups, KANJI does not (CharacterDefinition.dat flags)
    assert flags[char_class("ア")][1] == 1
    assert flags[char_class("漢")][1] == 0


def test_lattice_beats_greedy_prefix_trap():
    """The compound 東京大学 is a dictionary entry — the lattice emits
    it whole; the particles around it split off."""
    assert lattice_segment("東京大学で言語学習") == [
        "東京大学", "で", "言語", "学習",
    ]
    assert lattice_segment("日本語の形態素解析") == [
        "日本語", "の", "形態素", "解析",
    ]


def test_unknown_katakana_groups():
    """A katakana run absent from the lexicon stays ONE token (the
    KATAKANA class group flag), not per-char shrapnel."""
    toks = lattice_segment("グーグリッシュ")
    assert len(toks) <= 2, toks


def test_full_coverage_and_determinism():
    cases = [
        "すもももももももものうち",
        "機械学習モデルの訓練",
        "アメリカンコーヒーを飲んだ",
        "漢字とひらがなとカタカナ",
    ]
    for c in cases:
        toks = lattice_segment(c)
        assert "".join(toks) == c, (c, toks)  # lossless cover
        assert toks == lattice_segment(c)     # deterministic


def test_segment_cjk_routes_ja_to_lattice_ko_to_longest_match():
    assert segment_cjk("mixed ASCII and 東京大学 text") == [
        "mixed", "ascii", "and", "東京大学", "text",
    ]
    # Hangul run still the pinned-dict longest-match path
    assert segment_cjk("한국어 형태소 분석과 검색") == [
        "한국어", "형태소", "분석", "과", "검색",
    ]
