"""General polygon (even-odd ray cast) + heatmap facet."""

import random

from pyspark.sql import functions as F

from lucene_solr_spark.operators.spatial import (
    heatmap_facet, polygon_contains_general_col,
)


def _pnpoly(lat, lon, verts):
    inside = False
    n = len(verts)
    for i in range(n):
        y1, x1 = verts[i]
        y2, x2 = verts[(i + 1) % n]
        if (y1 > lat) != (y2 > lat) and lon < (x2 - x1) * (lat - y1) / (
            y2 - y1
        ) + x1:
            inside = not inside
    return inside


def test_nonconvex_polygon_matches_pnpoly(spark):
    """L-shape and a self-intersecting bowtie: the Column parity sum
    must agree with the scalar PNPOLY oracle on 400 random points."""
    l_shape = [(0, 0), (4, 0), (4, 4), (2, 4), (2, 2), (0, 2)]
    bowtie = [(0, 0), (4, 4), (0, 4), (4, 0)]
    rng = random.Random(99)
    pts = [
        (i, rng.uniform(-1, 5) + 1e-3, rng.uniform(-1, 5) + 1e-3)
        for i in range(400)
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    for verts in (l_shape, bowtie):
        got = {
            r["id"]
            for r in df.filter(
                polygon_contains_general_col(
                    F.col("lat"), F.col("lon"), verts
                )
            ).collect()
        }
        want = {i for i, la, lo in pts if _pnpoly(la, lo, verts)}
        assert got == want
    # hand checks: notch of the L excluded, arm included
    one = spark.createDataFrame(
        [(0, 1.0, 3.0), (1, 1.0, 1.0), (2, 3.0, 3.0)],
        "id long, lat double, lon double",
    )
    got = {
        r["id"]
        for r in one.filter(
            polygon_contains_general_col(F.col("lat"), F.col("lon"), l_shape)
        ).collect()
    }
    assert got == {1, 2}  # (lat=1, lon=3) sits in the cut-out notch


def test_heatmap_counts_and_clamping(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (0.5, 0.5), (9.9, 9.9), (10.0, 10.0),  # max edge
         (5.0, 5.0), (-1.0, 5.0), (5.0, 11.0)],              # outside
        "lat double, lon double",
    )
    got = {
        (r["grid_row"], r["grid_col"]): r["cnt"]
        for r in heatmap_facet(df, 0.0, 10.0, 0.0, 10.0, 2, 2).collect()
    }
    # box-inclusive; the (10,10) point clamps into the last cell
    assert got == {(0, 0): 2, (1, 1): 3}
    import pytest

    with pytest.raises(ValueError):
        heatmap_facet(df, 0.0, 10.0, 0.0, 10.0, 0, 2)
    with pytest.raises(ValueError):
        heatmap_facet(df, 10.0, 0.0, 0.0, 10.0, 2, 2)


def test_geojson_polygon_parse_and_holes(spark):
    """Polygon.fromGeoJSON analog: [lon,lat] order, closed rings,
    holes; containment drops points inside holes (even-odd parity)."""
    import json

    import pytest
    from pyspark.sql import functions as F

    from lucene_solr_spark.operators.spatial import (
        polygon_with_holes_contains_col,
        polygons_from_geojson,
    )

    gj = json.dumps({
        "type": "Feature",
        "geometry": {
            "type": "Polygon",
            "coordinates": [
                [[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]],
                [[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]],
            ],
        },
    })
    polys = polygons_from_geojson(gj)
    assert len(polys) == 1
    shell, holes = polys[0]
    assert shell[0] == (0.0, 0.0) and len(shell) == 4
    assert len(holes) == 1 and len(holes[0]) == 4

    pts = [(0, 2.0, 2.0), (1, 5.0, 5.0), (2, 11.0, 5.0), (3, 4.5, 9.5)]
    df = spark.createDataFrame(pts, "i long, lat double, lon double")
    got = {r["i"]: r["inp"] for r in df.select(
        "i", polygon_with_holes_contains_col(
            F.col("lat"), F.col("lon"), shell, holes).alias("inp")
    ).collect()}
    assert got == {0: True, 1: False, 2: False, 3: True}

    multi = polygons_from_geojson(json.dumps({
        "type": "MultiPolygon",
        "coordinates": [
            [[[0, 0], [0, 1], [1, 1], [0, 0]]],
            [[[5, 5], [5, 6], [6, 6], [5, 5]]],
        ],
    }))
    assert len(multi) == 2 and multi[1][0][0] == (5.0, 5.0)

    with pytest.raises(ValueError, match="close"):
        polygons_from_geojson(json.dumps({
            "type": "Polygon",
            "coordinates": [[[0, 0], [0, 1], [1, 1], [2, 2]]],
        }))
    with pytest.raises(ValueError, match="Polygon or MultiPolygon"):
        polygons_from_geojson('{"type": "Point", "coordinates": [1, 2]}')
