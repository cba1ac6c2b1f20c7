"""smartcn HHMM segmenter — reference-parity unit tests.

The heavyweight verification is scripts/make_smartcn_fixture.py (the
reference's own WordSegmenter compiled as a JVM oracle, 60k mixed-script
sentences, 0 mismatches). These tests pin the JUnit-published vectors
and the behavioral corners so regressions surface without the JVM.
"""

import pandas as pd
import pytest

from lucene_solr_spark.analysis.smartcn import (
    ZH_PHRASES, segment_smartcn, segment_tokens,
)


# TestSmartChineseAnalyzer.testChineseStopWordsOff: with no stop filter
# the IDEOGRAPHIC FULL STOP is normalized to ',' by SegTokenFilter.
def test_junit_stopwords_off():
    assert segment_smartcn("我购买了道具和服装。") == [
        "我", "购买", "了", "道具", "和", "服装", ","]


def test_junit_two_phrases():
    assert segment_smartcn("我购买了道具和服装。 我购买了道具和服装。") == [
        "我", "购买", "了", "道具", "和", "服装", ",",
        "我", "购买", "了", "道具", "和", "服装", ","]


def test_junit_ideographic_space():
    # U+3000 is SPACE_LIKE: skipped, no delimiter token
    assert segment_smartcn("我购买了道具和服装　我购买了道具和服装。") == [
        "我", "购买", "了", "道具", "和", "服装",
        "我", "购买", "了", "道具", "和", "服装", ","]


def test_junit_surrogate_pairs():
    # testSurrogatePairCharacter: each astral hanzi is its own token
    s = ("\U0002CB3B\U0002CB4A\U0002CB73\U0002CB5B鿏\U0002B7FC"
         "\U0002CB2D鿔")
    assert segment_smartcn(s) == [
        "\U0002CB3B", "\U0002CB4A", "\U0002CB73", "\U0002CB5B",
        "鿏", "\U0002B7FC", "\U0002CB2D", "鿔"]


def test_latin_mixed_lowercased():
    # WordType.STRING run is lowercased by SegTokenFilter
    assert segment_smartcn("我购买 Tests 了道具和服装") == [
        "我", "购买", "tests", "了", "道具", "和", "服装"]


def test_fullwidth_folding():
    # FULLWIDTH letters/digits fold to halfwidth and lowercase
    assert segment_smartcn("ＡＢＣ１２３") == ["abc", "123"]


def test_number_run_single_token():
    toks = segment_tokens("价格1949元")
    texts = [t[3] for t in toks]
    assert "1949" in texts
    i = texts.index("1949")
    start, end, wtype, _ = toks[i]
    assert (end - start) == 4 and wtype == 4  # WordType.NUMBER


def test_offsets_are_utf16_units():
    # astral char occupies two UTF-16 units, as in Java
    toks = segment_tokens("\U0002CB3B中")
    assert toks[0][:2] == (0, 2) and toks[1][:2] == (2, 3)


def test_empty_and_space_only():
    assert segment_smartcn("") == []
    assert segment_smartcn(" \t　") == []


def test_delimiter_normalized():
    # 你好 is a coredict word; '!' normalizes to the common delimiter
    assert segment_smartcn("你好!") == ["你好", ","]


def test_frozen_phrase_fixture_replays():
    import os
    fix = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "lucene_solr_spark",
        "fixtures_data", "smartcn_segments.parquet")
    seg = pd.read_parquet(fix)
    assert len(seg) == len(ZH_PHRASES)
    for r in seg.itertuples():
        toks = segment_smartcn(ZH_PHRASES[r.phrase_id])
        assert len(toks) == r.n_tokens
        assert "|".join(toks) == r.tokens_s


def test_dictionary_sorted_invariant():
    import os
    fix = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "lucene_solr_spark",
        "fixtures_data", "smartcn_coredict.parquet")
    core = pd.read_parquet(fix)
    assert len(core) > 80000
    g = core[core["head"] == "中"].sort_values("rank")
    sfx = list(g["suffix"])
    assert sfx == sorted(sfx)
    assert "" in sfx  # single-char word 中 exists


def test_viterbi_prefers_dictionary_phrase():
    # 中华人民共和国 is a single dictionary word — the Viterbi keeps it
    # whole rather than splitting into single characters.
    assert segment_smartcn("中华人民共和国") == ["中华人民共和国"]


def test_udf_batch(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.smartcn import smartcn_tokens_udf

    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ZH_PHRASES)], "id long, text string")
    out = df.select("id", smartcn_tokens_udf(F.col("text")).alias("toks")) \
        .orderBy("id").collect()
    for row in out:
        assert row.toks == segment_smartcn(ZH_PHRASES[row.id])
