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


# ---------------------------------------- TestBM25Similarity-style axioms
# Reference lucene/core/src/test/org/apache/lucene/search/similarities/
# TestBM25Similarity.java + BaseSimilarityTestCase invariants: scores
# finite and non-negative, idf decreasing in df, tf saturating and
# monotonic in freq, norm monotonic in doc length.

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.integers(1, 10**9),
    st.integers(1, 10**9),
)
@settings(max_examples=200, deadline=None)
def test_idf_positive_finite_and_decreasing(df1, df2):
    n = max(df1, df2)
    a, b_ = bm25.idf(np.array([min(df1, n)]), n), bm25.idf(
        np.array([min(df2, n)]), n
    )
    assert np.isfinite(a)[0] and a[0] >= 0
    if df1 <= df2 <= n:
        assert bm25.idf(np.array([df1]), n)[0] >= bm25.idf(
            np.array([df2]), n
        )[0]


@given(st.integers(0, 254), st.integers(1, 1000))
@settings(max_examples=200, deadline=None)
def test_tf_saturating_monotonic(norm_byte, freq):
    """score(freq+1) >= score(freq), and score < weight (saturation
    bound: tf/(tf+norm) < 1)."""
    cache = bm25.norm_cache(np.float32(55.0))
    w = np.float32(2.0)
    nb = np.array([norm_byte], dtype=np.int64)
    s1 = bm25.score_term(np.array([freq]), nb, w, cache)
    s2 = bm25.score_term(np.array([freq + 1]), nb, w, cache)
    assert np.isfinite(s1)[0] and s1[0] >= 0
    assert s2[0] >= s1[0]
    assert s1[0] < w


@given(st.integers(0, 253), st.integers(1, 100))
@settings(max_examples=200, deadline=None)
def test_longer_docs_score_no_higher(norm_byte, freq):
    """At equal freq, a doc with a larger quantized length (higher norm
    byte) never outscores a shorter one — the b-normalization axiom."""
    cache = bm25.norm_cache(np.float32(55.0))
    w = np.float32(2.0)
    s_short = bm25.score_term(
        np.array([freq]), np.array([norm_byte]), w, cache
    )
    s_long = bm25.score_term(
        np.array([freq]), np.array([norm_byte + 1]), w, cache
    )
    assert s_long[0] <= s_short[0]


def test_boost_scales_weight_linearly():
    """BoostQuery axiom: boost multiplies the clause weight, float32
    cast points preserved (weight computed in float32 like term_weights)."""
    from lucene_solr_spark.search.scoring import term_weights

    w1 = dict(term_weights({"t": 100}, 10_000, ["t"], 1.0, bm25.K1, bm25.B))
    w2 = dict(term_weights({"t": 100}, 10_000, ["t"], 2.5, bm25.K1, bm25.B))
    assert w2["t"] == np.float32(np.float32(2.5) * w1["t"])
