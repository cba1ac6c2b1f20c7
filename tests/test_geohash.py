"""geohash / hsin / ghhsin function queries — public test vectors
(the classic geohash examples) and haversine identities."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.valuesource import (
    GEO_MEAN_RADIUS_KM,
    geodist,
    geohash_encode,
    ghhsin,
    hsin,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_geohash_known_vectors(spark):
    # Wikipedia / geohash.org canonical examples
    assert _one(spark, geohash_encode(
        F.lit(57.64911), F.lit(10.40744))).startswith("u4pruydqqvj")
    assert _one(spark, geohash_encode(
        F.lit(42.6), F.lit(-5.6), 5)) == "ezs42"
    # agreed by an independent canonical interval-halving computation
    assert _one(spark, geohash_encode(
        F.lit(38.897), F.lit(-77.036), 6)) == "dqcjr0"


def test_geohash_poles_and_bounds(spark):
    assert _one(spark, geohash_encode(F.lit(90.0), F.lit(180.0), 4)) \
        == "zzzz"
    assert _one(spark, geohash_encode(F.lit(-90.0), F.lit(-180.0), 4)) \
        == "0000"
    assert _one(spark, geohash_encode(F.lit(0.0), F.lit(0.0), 1)) == "s"


def test_hsin_radians_matches_geodist(spark):
    # hsin over radian inputs with the earth radius == geodist (km)
    lat1, lon1, lat2, lon2 = 40.0, -74.0, 51.5, -0.12
    km = _one(spark, geodist(F.lit(lat1), F.lit(lon1),
                             F.lit(lat2), F.lit(lon2)))
    rad = _one(spark, hsin(
        F.lit(GEO_MEAN_RADIUS_KM),
        F.lit(math.radians(lat1)), F.lit(math.radians(lon1)),
        F.lit(math.radians(lat2)), F.lit(math.radians(lon2))))
    assert km == pytest.approx(rad, abs=1e-9)
    conv = _one(spark, hsin(
        F.lit(GEO_MEAN_RADIUS_KM), F.lit(lat1), F.lit(lon1),
        F.lit(lat2), F.lit(lon2), convert=True))
    assert km == pytest.approx(conv, abs=1e-9)


def test_hsin_zero_and_antipodal(spark):
    assert _one(spark, hsin(F.lit(1.0), F.lit(0.5), F.lit(0.5),
                            F.lit(0.5), F.lit(0.5))) == 0.0
    # antipodal points: half circumference
    anti = _one(spark, hsin(F.lit(1.0), F.lit(0.0), F.lit(0.0),
                            F.lit(0.0), F.lit(math.pi)))
    assert anti == pytest.approx(math.pi, rel=1e-12)


def test_ghhsin_near_raw_haversine(spark):
    # cell centers are within ~2e-7 degrees of the raw points, so the
    # geohash-cell distance tracks the raw distance to sub-meter error
    raw = _one(spark, geodist(F.lit(40.0), F.lit(-74.0),
                              F.lit(51.5), F.lit(-0.12)))
    gh = _one(spark, ghhsin(F.lit(GEO_MEAN_RADIUS_KM),
                            F.lit(40.0), F.lit(-74.0),
                            F.lit(51.5), F.lit(-0.12)))
    assert gh == pytest.approx(raw, abs=1e-3)
