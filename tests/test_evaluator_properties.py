"""Property tests: array/series/distance evaluators vs numpy over
hypothesis-generated inputs (one Spark job per case batch — arrays are
packed into a single DataFrame to keep the suite fast)."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from lucene_solr_spark.functions.evaluators import (
    moving_avg,
    sum_v,
    ts_diff,
    value_at,
)
from lucene_solr_spark.functions.valuesource import (
    canberra_dist,
    chebyshev_dist,
    euclidean_dist,
    manhattan_dist,
)

_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=12, deadline=None)
@given(st.lists(_floats, min_size=3, max_size=24), st.integers(2, 3))
def test_series_evaluators_match_numpy(spark, xs, w):
    a = np.array(xs, dtype="float64")
    row = (
        spark.createDataFrame([(xs,)], "a array<double>")
        .select(
            moving_avg(F.col("a"), w).alias("ma"),
            ts_diff(F.col("a"), 1).alias("d1"),
            sum_v(F.col("a")).alias("s"),
            value_at(F.col("a"), len(xs) - 1).alias("last"),
        )
        .collect()[0]
    )
    want_ma = [float(a[i - w + 1:i + 1].mean()) for i in range(w - 1, len(a))]
    assert len(row["ma"]) == len(want_ma)
    for got, want in zip(row["ma"], want_ma):
        assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-9)
    want_d1 = (a[1:] - a[:-1]).tolist()
    assert len(row["d1"]) == len(want_d1)
    for got, want in zip(row["d1"], want_d1):
        assert math.isclose(got, want, rel_tol=1e-12, abs_tol=1e-12)
    assert math.isclose(row["s"], float(np.sum(a)), rel_tol=1e-9,
                        abs_tol=1e-9)
    assert row["last"] == xs[-1]


@settings(max_examples=12, deadline=None)
@given(
    st.lists(_floats, min_size=1, max_size=16),
    st.lists(_floats, min_size=1, max_size=16),
)
def test_distance_evaluators_match_numpy(spark, xs, ys):
    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    a = np.array(xs, dtype="float64")
    b = np.array(ys, dtype="float64")
    row = (
        spark.createDataFrame([(xs, ys)], "a array<double>, b array<double>")
        .select(
            euclidean_dist(F.col("a"), F.col("b")).alias("eu"),
            manhattan_dist(F.col("a"), F.col("b")).alias("ma"),
            chebyshev_dist(F.col("a"), F.col("b")).alias("ch"),
            canberra_dist(F.col("a"), F.col("b")).alias("ca"),
        )
        .collect()[0]
    )
    d = np.abs(a - b)
    assert math.isclose(row["eu"], float(np.sqrt(np.sum(d * d))),
                        rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(row["ma"], float(np.sum(d)), rel_tol=1e-9,
                        abs_tol=1e-12)
    assert math.isclose(row["ch"], float(np.max(d)), rel_tol=1e-12,
                        abs_tol=1e-12)
    den = np.abs(a) + np.abs(b)
    terms = np.where(den == 0, 0.0, d / np.where(den == 0, 1.0, den))
    assert math.isclose(row["ca"], float(np.sum(terms)), rel_tol=1e-9,
                        abs_tol=1e-12)
