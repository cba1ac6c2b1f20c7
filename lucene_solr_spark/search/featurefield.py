"""FeatureField / FeatureQuery: static per-document ranking features.

The reference indexes a feature (pagerank, url length, ...) as a term
whose TERM FREQUENCY carries the float value's top bits —
``freq = floatToIntBits(v) >>> 15`` (FeatureField.java:153-154), i.e. a
~9-significant-bit quantization — and scores it query-time with one of
three monotonic functions over the decoded value
(FeatureField.java:199-400):

- log:        ``(float)(w * Math.log(a + f))``
- saturation: ``w * (1 - pivot / (f + pivot))``  (all-float chain)
- sigmoid:    ``(float)(w * (1 - pivot^a / (f^a + pivot^a)))``

with the no-pivot saturation variant deriving its pivot from index
stats: ``decode(float(totalTermFreq / docFreq))`` — an approximate
geometric mean because the average runs over the float's BIT pattern
(FeatureField.java:500-520).

Spark shape: the feature table is (doc_id, feature, freq) with freq
holding the same quantized encoding the reference's postings hold.
Encode/decode are closed-form exponent/mantissa arithmetic — pure
Column expressions, no UDF, no bit-cast builtin needed — so both the
engine and the DuckDB oracle run the identical formulas.  Scores are
float32 at every step the reference keeps float32 (FLOAT casts; float
divisions follow the f64-divide-then-f32-round model, the same declared
convention as the similarity family).  Feature scoring composes with
BM25 by per-doc score addition, exactly like a SHOULD clause
(FeatureField javadoc usage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "encode_feature_freq",
    "decode_feature_value",
    "feature_scores",
    "pivot_feature_value",
    "long_distance_feature_scores",
]

_M23 = 8388608.0  # 2^23
_SHIFT = 32768.0  # 2^15


def encode_feature_freq(value: Column) -> Column:
    """``floatToIntBits(float32(value)) >>> 15`` for positive normal
    floats, as closed-form exponent/mantissa arithmetic: with
    v32 = (2^23 + m)·2^(e-23), bits = (e+127)·2^23 + m, both exact in
    doubles.  The log2-floor gets a one-step correction so power-of-two
    boundaries can't be off by an ulp of ln()."""
    v32 = value.cast("float").cast("double")
    e0 = F.floor(F.log(2.0, v32))
    p0 = F.pow(F.lit(2.0), e0)
    e = (
        F.when(v32 < p0, e0 - 1)
        .when(v32 >= 2 * p0, e0 + 1)
        .otherwise(e0)
    )
    p = F.pow(F.lit(2.0), e)
    m = F.floor(v32 / p * _M23 - _M23)
    bits = (e + 127) * F.lit(_M23) + m
    return F.floor(bits / _SHIFT).cast("long")


def decode_feature_value(freq: Column) -> Column:
    """``intBitsToFloat((int) freq << 15)`` (FeatureField.java:199-209):
    the float whose top 16 bits are the stored freq, low mantissa bits
    zero — exact double arithmetic, result float32-valued.  The
    ``(int) freq`` truncation matters on the pivot path, where freq is
    the fractional average of stored freqs."""
    bits = F.floor(freq.cast("double")) * _SHIFT
    e = F.floor(bits / _M23) - 127
    m = bits - (F.floor(bits / _M23) * _M23)
    return ((F.lit(_M23) + m) * F.pow(F.lit(2.0), e - 23)).cast("float")


def pivot_feature_value(features: DataFrame, feature: str) -> Column:
    """computePivotFeatureValue (FeatureField.java:508-520): the decoded
    float of the average stored freq — freq averages the float's bit
    pattern, so this approximates the geometric mean.  Returns a 1-row
    aggregate frame's column; compose via a broadcast cross join."""
    agg = features.filter(F.col("feature") == feature).agg(
        (F.sum("freq").cast("double") / F.count("*")).cast("float")
        .alias("avg_freq")
    )
    return agg.select(
        decode_feature_value(F.col("avg_freq")).alias("pivot")
    )


def feature_scores(
    features: DataFrame,
    feature: str,
    fn: str = "saturation",
    weight: float = 1.0,
    pivot: float | None = None,
    a: float = 1.0,
    scaling: float = 1.0,
) -> DataFrame:
    """(doc_id, score) for one feature function — the FeatureQuery
    scorer.  ``fn='saturation'`` with ``pivot=None`` uses the
    stats-derived pivot like newSaturationQuery(field, feature)."""
    import math

    f = features.filter(F.col("feature") == feature)
    val = decode_feature_value(F.col("freq")).cast("double")
    w = F.lit(weight).cast("float").cast("double")
    if fn == "log":
        score = (
            w * F.log(
                (F.lit(scaling).cast("float") + val.cast("float"))
                .cast("float").cast("double")
            )
        ).cast("float")
        return f.select("doc_id", score.alias("score"))
    if fn == "sigmoid":
        if pivot is None:
            raise ValueError("sigmoid needs an explicit pivot")
        pivot_pa = math.pow(pivot, a)  # double, like `Math.pow(pivot, a)`
        score = (
            w * (F.lit(1.0) - F.lit(pivot_pa)
                 / (F.pow(val.cast("float").cast("double"), F.lit(float(a)))
                    + F.lit(pivot_pa)))
        ).cast("float")
        return f.select("doc_id", score.alias("score"))
    if fn != "saturation":
        raise ValueError(f"unknown feature function {fn!r}")
    if pivot is not None:
        pv = F.lit(pivot).cast("float")
        frame = f
    else:
        frame = f.crossJoin(F.broadcast(pivot_feature_value(features, feature)))
        pv = F.col("pivot")
    f32 = val.cast("float")
    denom = (f32 + pv).cast("float")
    score = (
        w.cast("float")
        * (F.lit(1.0).cast("float")
           - (pv.cast("double") / denom.cast("double")).cast("float"))
        .cast("float")
    ).cast("float")
    return frame.select("doc_id", score.alias("score"))


def long_distance_feature_scores(
    df: DataFrame,
    value_col: str,
    origin: int,
    pivot_distance: int,
    weight: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """LongDistanceFeatureQuery (document/LongDistanceFeatureQuery.java:
    110): recency/proximity boost over a long field —
    ``(float)(boost * (pivot / (pivot + |value - origin|)))``, double
    arithmetic, float32 result.  The LatLon twin composes the same
    saturation over the geodist surface already in
    functions/valuesource.py (its SloppyMath haversine stays the
    engine-wide standard-cosine declared divergence)."""
    if pivot_distance <= 0:
        raise ValueError(
            f"pivotDistance must be > 0, got {pivot_distance}"
        )
    dist = F.abs(
        F.col(value_col).cast("long") - F.lit(int(origin))
    ).cast("double")
    p = float(pivot_distance)
    score = (
        F.lit(weight).cast("float").cast("double")
        * (F.lit(p) / (F.lit(p) + dist))
    ).cast("float")
    return df.select(F.col(id_col).alias("doc_id"), score.alias("score"))
