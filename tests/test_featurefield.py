"""FeatureField encode/decode + scoring parity.

The encode/decode pair is checked bit-exactly against the float
bit-twiddling the reference performs (floatToIntBits >>> 15,
intBitsToFloat(tf << 15) — FeatureField.java:153,199), via numpy views;
scores are checked against a numpy float32 model of the three scorer
chains."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.featurefield import (
    decode_feature_value,
    encode_feature_freq,
    feature_scores,
)


def _ref_encode(v):
    return int(np.float32(v).view(np.uint32)) >> 15


def _ref_decode(freq):
    return float(np.uint32(freq << 15).view(np.float32))


VALUES = [
    1.0, 0.5, 2.0, 3.14159, 1e-3, 123456.78, 1.1754944e-38,  # MIN_NORMAL
    3.4028234e38, 7.0, 0.12345, 42.5, 1e10, 2.0**-100, 1.9999999,
]


def test_encode_matches_float_bits(spark):
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(VALUES)],
                               "i long, v double")
    got = {r["i"]: r["f"] for r in df.select(
        "i", encode_feature_freq(F.col("v")).alias("f")).collect()}
    for i, v in enumerate(VALUES):
        assert got[i] == _ref_encode(v), (v, got[i], _ref_encode(v))


def test_decode_roundtrip(spark):
    freqs = [_ref_encode(v) for v in VALUES]
    df = spark.createDataFrame([(i, f) for i, f in enumerate(freqs)],
                               "i long, freq long")
    got = {r["i"]: r["d"] for r in df.select(
        "i", decode_feature_value(F.col("freq")).alias("d")).collect()}
    for i, f in enumerate(freqs):
        assert got[i] == _ref_decode(f), (f, got[i], _ref_decode(f))
        # quantization: decoded <= original, within 2^-8 relative
        v = VALUES[i]
        assert got[i] <= np.float32(v)
        assert got[i] >= np.float32(v) * (1 - 2.0**-8)


def test_encode_random_sweep(spark):
    import random

    rng = random.Random(7)
    vals = [math.exp(rng.uniform(-80, 80)) for _ in range(300)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, v double")
    got = {r["i"]: r["f"] for r in df.select(
        "i", encode_feature_freq(F.col("v")).alias("f")).collect()}
    for i, v in enumerate(vals):
        assert got[i] == _ref_encode(v), (v,)


def _features(spark, vals):
    return spark.createDataFrame(
        [(i, "pr", _ref_encode(v)) for i, v in enumerate(vals)],
        "doc_id long, feature string, freq long",
    )


def test_saturation_explicit_pivot(spark):
    vals = [0.5, 3.0, 42.5]
    out = {r["doc_id"]: r["score"] for r in feature_scores(
        _features(spark, vals), "pr", "saturation", weight=1.8, pivot=3.0
    ).collect()}
    for i, v in enumerate(vals):
        f = np.float32(_ref_decode(_ref_encode(v)))
        w, p = np.float32(1.8), np.float32(3.0)
        want = np.float32(w * np.float32(
            np.float32(1.0) - np.float32(p / np.float32(f + p))))
        assert out[i] == pytest.approx(float(want), abs=0), (v,)


def test_saturation_auto_pivot_geomean(spark):
    # bit-average pivot: decode(float(mean of encoded freqs))
    vals = [1.0, 4.0, 16.0]
    feats = _features(spark, vals)
    out = feature_scores(feats, "pr", "saturation", weight=1.0).collect()
    freqs = [_ref_encode(v) for v in vals]
    pivot = np.float32(_ref_decode(int(np.float32(sum(freqs) / 3.0))))
    # ~geometric mean of {1,4,16} = 4
    assert 3.5 < float(pivot) < 4.5
    got = {r["doc_id"]: r["score"] for r in out}
    for i, v in enumerate(vals):
        f = np.float32(_ref_decode(_ref_encode(v)))
        want = np.float32(np.float32(1.0) * np.float32(
            np.float32(1.0) - np.float32(pivot / np.float32(f + pivot))))
        assert got[i] == pytest.approx(float(want), rel=1e-6), (v,)


def test_log_and_sigmoid(spark):
    vals = [2.0, 9.5]
    feats = _features(spark, vals)
    logs = {r["doc_id"]: r["score"] for r in feature_scores(
        feats, "pr", "log", weight=2.0, scaling=1.0).collect()}
    sigs = {r["doc_id"]: r["score"] for r in feature_scores(
        feats, "pr", "sigmoid", weight=2.0, pivot=2.5, a=0.6).collect()}
    for i, v in enumerate(vals):
        f = float(np.float32(_ref_decode(_ref_encode(v))))
        want_log = np.float32(2.0 * math.log(float(np.float32(1.0 + np.float32(f)))))
        assert logs[i] == pytest.approx(float(want_log), rel=1e-7)
        ppa = math.pow(2.5, 0.6)
        want_sig = np.float32(2.0 * (1 - ppa / (math.pow(f, 0.6) + ppa)))
        assert sigs[i] == pytest.approx(float(want_sig), rel=1e-7)


def test_rejects_unknown_fn(spark):
    with pytest.raises(ValueError):
        feature_scores(_features(spark, [1.0]), "pr", "nope")
    with pytest.raises(ValueError):
        feature_scores(_features(spark, [1.0]), "pr", "sigmoid")


def test_auto_pivot_truncates_fractional_avg(spark):
    # avg freq non-integral: decode must (int)-truncate it first
    # (FeatureField.java:201 `int tf = (int) freq`)
    vals = [1.0, 1.5, 2.5]
    feats = _features(spark, vals)
    freqs = [_ref_encode(v) for v in vals]
    avg32 = np.float32(sum(freqs) / 3.0)
    assert float(avg32) != int(avg32)  # genuinely fractional
    pivot = np.float32(_ref_decode(int(avg32)))
    got = {r["doc_id"]: r["score"] for r in feature_scores(
        feats, "pr", "saturation", weight=1.0).collect()}
    for i, v in enumerate(vals):
        f = np.float32(_ref_decode(_ref_encode(v)))
        want = np.float32(np.float32(1.0) * np.float32(
            np.float32(1.0) - np.float32(pivot / np.float32(f + pivot))))
        assert got[i] == pytest.approx(float(want), abs=0), (v,)


def test_long_distance_feature(spark):
    from lucene_solr_spark.search.featurefield import (
        long_distance_feature_scores,
    )

    df = spark.createDataFrame(
        [(0, 1000), (1, 1500), (2, 100)], "doc_id long, ts long"
    )
    got = {r["doc_id"]: r["score"] for r in long_distance_feature_scores(
        df, "ts", origin=1000, pivot_distance=250, weight=1.5
    ).collect()}
    for i, v in [(0, 1000), (1, 1500), (2, 100)]:
        want = np.float32(
            float(np.float32(1.5)) * (250.0 / (250.0 + abs(v - 1000)))
        )
        assert got[i] == pytest.approx(float(want), abs=0)
    with pytest.raises(ValueError):
        long_distance_feature_scores(df, "ts", 0, 0)
