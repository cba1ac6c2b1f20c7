"""BM25 math unit tests: float cast points, known values, invariants."""

import numpy as np

from lucene_solr_spark.functions import bm25
from lucene_solr_spark.functions.smallfloat import LENGTH_TABLE


def test_idf_known_value():
    # df=1, docCount=1 → ln(1 + 0.5/1.5) = ln(4/3)
    got = bm25.idf(1, 1)
    assert got.dtype == np.float32
    np.testing.assert_allclose(float(got), np.log(4.0 / 3.0), rtol=1e-7)


def test_idf_monotone_decreasing_in_df():
    dfs = np.arange(1, 1000)
    vals = bm25.idf(dfs, 1000)
    assert np.all(np.diff(vals) <= 0)
    assert vals.dtype == np.float32


def test_avgdl_cast():
    a = bm25.avgdl(10, 3)
    assert isinstance(a, np.float32)
    assert a == np.float32(np.float64(10) / np.float64(3))


def test_norm_cache_shape_and_b0():
    cache = bm25.norm_cache(np.float32(5.0))
    assert cache.shape == (256,) and cache.dtype == np.float32
    # b=0 → cache is constant k1
    c0 = bm25.norm_cache(np.float32(5.0), b=np.float32(0.0))
    np.testing.assert_array_equal(c0, np.full(256, np.float32(1.2)))


def test_norm_cache_formula_spotcheck():
    avgdl = np.float32(7.5)
    cache = bm25.norm_cache(avgdl)
    i = 37
    expected = np.float32(1.2) * (
        (np.float32(1.0) - np.float32(0.75))
        + (np.float32(0.75) * LENGTH_TABLE[i]) / avgdl
    )
    assert cache[i] == expected


def test_score_no_k1_plus_1_numerator():
    """score = w * freq/(freq + norm): bounded by w, NOT w*(k1+1)."""
    cache = bm25.norm_cache(np.float32(10.0))
    w = np.float32(2.0)
    s = bm25.score_term(np.array([1000000]), np.array([20]), w, cache)
    assert s.dtype == np.float32
    assert 0 < float(s[0]) < 2.0
    np.testing.assert_allclose(float(s[0]), 2.0, rtol=1e-4)


def test_score_monotone_in_freq_and_dl():
    cache = bm25.norm_cache(np.float32(10.0))
    w = np.float32(1.0)
    freqs = np.array([1, 2, 5, 50])
    s = bm25.score_term(freqs, np.full(4, 25), w, cache)
    assert np.all(np.diff(s) > 0)
    # longer doc (bigger norm byte) → lower score at same freq
    s2 = bm25.score_term(np.array([2, 2]), np.array([10, 200]), w, cache)
    assert s2[0] > s2[1]


def test_sum_scores_double_accumulate():
    parts = np.array([0.1, 0.2, 0.3], dtype=np.float32)
    got = bm25.sum_scores(parts)
    expect = np.float32(
        np.float64(parts[0]) + np.float64(parts[1]) + np.float64(parts[2])
    )
    assert got == expect and got.dtype == np.float32
