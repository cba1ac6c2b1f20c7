"""CJK dictionary segmentation (kuromoji/nori analog) goldens."""

import os

import pandas as pd

from lucene_solr_spark.analysis.cjk import (
    CJK_DICT, CJK_PHRASES, segment_cjk,
)


def test_segment_goldens():
    assert segment_cjk("日本語の形態素解析") == [
        "日本語", "の", "形態素", "解析"
    ]
    assert segment_cjk("Spark検索エンジンでデータ処理") == [
        "spark", "検索", "エンジン", "で", "データ", "処理"
    ]
    assert segment_cjk("한국어 형태소 분석과 검색") == [
        "한국어", "형태소", "분석", "과", "검색"
    ]
    # longest match beats prefix: 日本語 is chosen over 日本 when the
    # longer entry fits; 日本 wins when it does not
    assert segment_cjk("日本語") == ["日本語"]
    assert segment_cjk("日本で") == ["日本", "で"]
    # OOV CJK falls back per character; punctuation separates tokens
    assert segment_cjk("猫と犬") == ["猫", "と", "犬"]
    assert segment_cjk("a,b 東京!") == ["a", "b", "東京"]
    assert segment_cjk("") == [] and segment_cjk(None or "") == []


def test_dictionary_is_pure_cjk():
    from lucene_solr_spark.analysis.cjk import _is_cjk

    for w in CJK_DICT:
        assert all(_is_cjk(c) for c in w), w


def test_fixture_matches_segmenter():
    """The golden fixture (what the DuckDB gate oracle joins) must be
    exactly the live segmenter's output for every pinned phrase."""
    import lucene_solr_spark as pkg

    fixture = os.path.join(
        os.path.dirname(pkg.__file__), "fixtures_data",
        "cjk_segments.parquet",
    )
    pdf = pd.read_parquet(fixture).sort_values("phrase_id")
    assert len(pdf) == len(CJK_PHRASES)
    for r in pdf.itertuples():
        toks = segment_cjk(CJK_PHRASES[int(r.phrase_id)])
        assert int(r.n_tokens) == len(toks)
        assert r.tokens_s == "|".join(toks)


def test_cjk_udf_batch(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.cjk import cjk_tokens_udf

    df = spark.createDataFrame(
        [(0, "日本語の解析"), (1, None), (2, "abc 検索")],
        "id long, t string",
    )
    got = {
        r["id"]: r["toks"]
        for r in df.select(
            "id", cjk_tokens_udf(F.col("t")).alias("toks")
        ).collect()
    }
    assert got == {
        0: ["日本語", "の", "解析"], 1: [], 2: ["abc", "検索"]
    }
