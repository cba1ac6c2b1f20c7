"""WGS84 ellipsoid geodesic — independent verification.

The engine's `with_vincenty_distance` mirrors
PlanetModel.surfaceDistance; these tests pin it against (a) an
INDEPENDENTLY-written geodesic solver (numpy, organized around the
standard-notation Vincenty inverse from the published formulae — not a
transcription of the reference's variable flow), and (b) the published
Vincenty test line: Flinders Peak → Buninyong, s = 54 972.271 m on
WGS-84 (Vincenty 1975 / Geoscience Australia worked example), and
(c) the sphere-vs-ellipsoid sanity that the two diverge by ~f.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.spatial import (
    WGS84_MEAN,
    _W84_SCALE,
    with_vincenty_distance,
)

A_M = 6378137.0
B_M = 6356752.314245
F_FLAT = (A_M - B_M) / A_M


def vincenty_inverse_m(p1, p2, tol=1e-13):
    """Clean-room Vincenty inverse (meters), standard notation."""
    phi1, lam1 = map(math.radians, p1)
    phi2, lam2 = map(math.radians, p2)
    U1 = math.atan((1 - F_FLAT) * math.tan(phi1))
    U2 = math.atan((1 - F_FLAT) * math.tan(phi2))
    L = lam2 - lam1
    lam = L
    for _ in range(200):
        sin_sigma = math.hypot(
            math.cos(U2) * math.sin(lam),
            math.cos(U1) * math.sin(U2)
            - math.sin(U1) * math.cos(U2) * math.cos(lam),
        )
        if sin_sigma == 0:
            return 0.0
        cos_sigma = (
            math.sin(U1) * math.sin(U2)
            + math.cos(U1) * math.cos(U2) * math.cos(lam)
        )
        sigma = math.atan2(sin_sigma, cos_sigma)
        sin_alpha = math.cos(U1) * math.cos(U2) * math.sin(lam) / sin_sigma
        cos2_alpha = 1 - sin_alpha**2
        cos_2sm = (
            cos_sigma - 2 * math.sin(U1) * math.sin(U2) / cos2_alpha
            if cos2_alpha
            else 0.0
        )
        C = F_FLAT / 16 * cos2_alpha * (4 + F_FLAT * (4 - 3 * cos2_alpha))
        lam_new = L + (1 - C) * F_FLAT * sin_alpha * (
            sigma
            + C
            * sin_sigma
            * (cos_2sm + C * cos_sigma * (2 * cos_2sm**2 - 1))
        )
        if abs(lam_new - lam) < tol:
            lam = lam_new
            break
        lam = lam_new
    u2 = cos2_alpha * (A_M**2 - B_M**2) / B_M**2
    k1 = (math.sqrt(1 + u2) - 1) / (math.sqrt(1 + u2) + 1)
    AA = (1 + 0.25 * k1**2) / (1 - k1)
    BB = k1 * (1 - 3 / 8 * k1**2)
    d_sigma = (
        BB
        * sin_sigma
        * (
            cos_2sm
            + BB
            / 4
            * (
                cos_sigma * (2 * cos_2sm**2 - 1)
                - BB
                / 6
                * cos_2sm
                * (4 * sin_sigma**2 - 3)
                * (4 * cos_2sm**2 - 3)
            )
        )
    )
    return B_M * AA * (sigma - d_sigma)


def _engine_m(spark, pairs):
    df = spark.createDataFrame(
        [
            (i, float(p1[0]), float(p1[1]), float(p2[0]), float(p2[1]))
            for i, (p1, p2) in enumerate(pairs)
        ],
        "i long, la1 double, lo1 double, la2 double, lo2 double",
    )
    out = with_vincenty_distance(
        df, F.col("la1"), F.col("lo1"), F.col("la2"), F.col("lo2")
    )
    rows = out.select(
        "i", (F.col("vincenty_scaled") * _W84_SCALE * WGS84_MEAN).alias("m")
    ).collect()
    return {r["i"]: r["m"] for r in rows}


FLINDERS = (-(37 + 57 / 60 + 3.72030 / 3600), 144 + 25 / 60 + 29.52440 / 3600)
BUNINYONG = (-(37 + 39 / 60 + 10.15610 / 3600), 143 + 55 / 60 + 35.38390 / 3600)


def test_published_vincenty_line(spark):
    got = _engine_m(spark, [(FLINDERS, BUNINYONG)])[0]
    assert got == pytest.approx(54972.271, abs=0.002)


def test_against_independent_solver(spark):
    rng = np.random.default_rng(42)
    pairs = []
    for _ in range(60):
        la1, la2 = rng.uniform(-80, 80, 2)
        lo1, lo2 = rng.uniform(-179, 179, 2)
        # keep away from the antipodal region where Vincenty inverse
        # may not converge (the reference has the same limitation)
        if abs((lo2 - lo1 + 180) % 360 - 180) > 150 and la1 * la2 < 0:
            continue
        pairs.append(((la1, lo1), (la2, lo2)))
    got = _engine_m(spark, pairs)
    for i, (p1, p2) in enumerate(pairs):
        want = vincenty_inverse_m(p1, p2)
        assert got[i] == pytest.approx(want, rel=1e-9), (p1, p2)


def test_flattening_matters_vs_sphere(spark):
    """A pole-to-equator geodesic must differ from the great-circle
    (mean-radius sphere) length by roughly the flattening scale —
    proving the gate member exercises the ellipsoid, not the sphere."""
    got = _engine_m(spark, [((0.0, 10.0), (80.0, 10.0))])[0]
    sphere = WGS84_MEAN * math.radians(80.0)
    assert abs(got - sphere) > 1000  # > 1 km apart
    assert got == pytest.approx(sphere, rel=0.01)  # but same order
