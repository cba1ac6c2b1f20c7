"""Spatial cell index: LatLonPoint / BKD box queries at rest.

The reference answers box queries by walking a BKD tree of packed
(lat, lon) points (lucene/core/.../document/LatLonPoint.java,
util/bkd/BKDReader.java) — the tree prunes whole leaf blocks whose
bounding box misses the query box. The at-rest Spark analog is the
same trick the engine already uses for terms (term_bucket), LSH
buckets and IVF centroids: quantize each point into a fixed-degree
grid CELL, write the point table partitioned by cell, and answer a box
query by reading only the cells that intersect the box
(PartitionFilters), then applying the exact predicate to the survivors
— conservative prune + exact verify, exactly the BKD leaf visit.

Cell ids are pure integer arithmetic (no library, no floats in the
id), so the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["geo_cell_col", "geo_cells_for_box", "build_geo_index",
           "box_query", "polygon_contains_col",
           "polygon_contains_general_col", "heatmap_facet"]

DEFAULT_CELL_DEG = 5.0


def geo_cell_col(lat: Column, lon: Column, cell_deg: float = DEFAULT_CELL_DEG) -> Column:
    """Grid cell id: row-major over (lat+90)/deg × (lon+180)/deg."""
    n_lon = int(math.ceil(360.0 / cell_deg))
    row = F.floor((lat + F.lit(90.0)) / F.lit(cell_deg)).cast("long")
    col = F.floor((lon + F.lit(180.0)) / F.lit(cell_deg)).cast("long")
    return (row * n_lon + col).alias("geo_cell")


def geo_cells_for_box(
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    cell_deg: float = DEFAULT_CELL_DEG,
) -> list:
    """Every cell id intersecting the box (conservative — computed
    driver-side with the same arithmetic as geo_cell_col).

    lon_min > lon_max means the box crosses the antimeridian (the
    GeoJSON / Lucene GeoUtils convention — Rectangle.crossesDateline);
    it splits into two wrapped longitude ranges."""
    if lon_min > lon_max:
        return sorted(
            set(geo_cells_for_box(lat_min, lat_max, lon_min, 180.0, cell_deg))
            | set(geo_cells_for_box(lat_min, lat_max, -180.0, lon_max, cell_deg))
        )
    n_lon = int(math.ceil(360.0 / cell_deg))
    r0 = int(math.floor((lat_min + 90.0) / cell_deg))
    r1 = int(math.floor((lat_max + 90.0) / cell_deg))
    c0 = int(math.floor((lon_min + 180.0) / cell_deg))
    c1 = int(math.floor((lon_max + 180.0) / cell_deg))
    return [
        r * n_lon + c for r in range(r0, r1 + 1) for c in range(c0, c1 + 1)
    ]


def build_geo_index(
    pts: DataFrame,
    index_dir: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_deg: float = DEFAULT_CELL_DEG,
) -> None:
    """Write the point table partitioned by grid cell; metadata
    committed last (tmp+rename)."""
    (
        pts.withColumn(
            "geo_cell", geo_cell_col(F.col(lat_col), F.col(lon_col), cell_deg)
        )
        .write.mode("overwrite")
        .partitionBy("geo_cell")
        .parquet(f"{index_dir}/points")
    )
    tmp = f"{index_dir}/.meta.json.tmp"
    with open(tmp, "w") as f:
        json.dump({"cell_deg": cell_deg}, f)
    os.replace(tmp, f"{index_dir}/meta.json")


def box_query(
    spark: SparkSession,
    index_dir: str,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Box query over the at-rest cell index: cell list resolved
    driver-side (no Spark job) → partition-pruned read → exact
    predicate on the surviving rows (BKD leaf-visit analog)."""
    with open(f"{index_dir}/meta.json") as f:
        cell_deg = json.load(f)["cell_deg"]
    cells = geo_cells_for_box(lat_min, lat_max, lon_min, lon_max, cell_deg)
    if lon_min > lon_max:  # antimeridian-crossing box: wrapped range
        lon_pred = (F.col(lon_col) >= lon_min) | (F.col(lon_col) <= lon_max)
    else:
        lon_pred = F.col(lon_col).between(lon_min, lon_max)
    return (
        spark.read.parquet(f"{index_dir}/points")
        .filter(F.col("geo_cell").isin(cells))
        .filter(F.col(lat_col).between(lat_min, lat_max) & lon_pred)
        .drop("geo_cell")
    )


def polygon_contains_col(lat_col, lon_col, vertices):
    """CONVEX-polygon point containment as a pure Column expression:
    the point is inside iff it lies on the same side of every edge
    (cross-product sign test), vertices given counter-clockwise as
    (lat, lon) pairs. The reference's LatLonPoint.newPolygonQuery
    handles arbitrary polygons via triangulation (lucene/core/.../
    geo/Polygon2D.java, Tessellator.java); the convex case is pinned
    here — a general polygon decomposes into convex pieces OR'd
    together, each this same predicate. Boundary points count as
    inside (>= 0)."""
    from pyspark.sql import functions as F

    pred = F.lit(True)
    n = len(vertices)
    for i in range(n):
        y1, x1 = vertices[i]
        y2, x2 = vertices[(i + 1) % n]
        cross = (
            F.lit(float(x2 - x1)) * (lat_col - F.lit(float(y1)))
            - F.lit(float(y2 - y1)) * (lon_col - F.lit(float(x1)))
        )
        pred = pred & (cross >= 0)
    return pred


def polygon_contains_general_col(lat_col, lon_col, vertices):
    """ARBITRARY (non-convex, any winding) polygon containment as a
    pure Column expression: even-odd ray casting — count edges whose
    segment straddles the point's latitude and whose crossing with the
    eastward ray lies east of the point; odd parity = inside (the
    PNPOLY test; reference lucene/sandbox/.../document/LatLonShape.java
    + lucene/core/.../geo/Tessellator.java, which answer the same
    general-polygon predicate via triangulation — a tessellation is
    unnecessary here because the parity sum is already one flat codegen
    expression per edge). Horizontal edges never straddle and are
    skipped. Boundary semantics follow PNPOLY's half-open asymmetry,
    not Polygon2D's boundary-is-inside — callers with on-edge points
    should use the convex same-side test (polygon_contains_col)."""
    n = len(vertices)
    cnt = F.lit(0)
    for i in range(n):
        y1, x1 = (float(v) for v in vertices[i])
        y2, x2 = (float(v) for v in vertices[(i + 1) % n])
        if y1 == y2:
            continue
        straddle = (F.lit(y1) > lat_col) != (F.lit(y2) > lat_col)
        xint = (
            F.lit(x2 - x1) * (lat_col - F.lit(y1)) / F.lit(y2 - y1)
            + F.lit(x1)
        )
        cnt = cnt + F.when(straddle & (lon_col < xint), 1).otherwise(0)
    return cnt % 2 == 1


def heatmap_facet(
    pts: DataFrame,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    grid_rows: int,
    grid_cols: int,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Heatmap facet (reference solr/core/.../search/facet/
    FacetHeatmap.java): 2D grid counts over a bounding box — Solr walks
    a prefix-tree spatial field per cell; the distributed shape is one
    box filter + one hash-agg on integer cell coordinates (pure
    Column arithmetic, exactly reproducible in SQL).

    → (grid_row, grid_col, cnt); rows index south→north, cols
    west→east; points on the max edge clamp into the last cell
    (FacetHeatmap includes the box boundary)."""
    if grid_rows < 1 or grid_cols < 1 or lat_max <= lat_min or lon_max <= lon_min:
        raise ValueError("heatmap needs a positive grid over a real box")
    lat_span = (lat_max - lat_min) / grid_rows
    lon_span = (lon_max - lon_min) / grid_cols
    lat = F.col(lat_col)
    lon = F.col(lon_col)
    return (
        pts.filter(
            lat.between(lat_min, lat_max) & lon.between(lon_min, lon_max)
        )
        .select(
            F.least(
                F.floor((lat - F.lit(lat_min)) / F.lit(lat_span)),
                F.lit(grid_rows - 1),
            ).cast("long").alias("grid_row"),
            F.least(
                F.floor((lon - F.lit(lon_min)) / F.lit(lon_span)),
                F.lit(grid_cols - 1),
            ).cast("long").alias("grid_col"),
        )
        .groupBy("grid_row", "grid_col")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def polygons_from_geojson(geojson):
    """Polygon.fromGeoJSON analog (geo/SimpleGeoJSONPolygonParser.java):
    parse a GeoJSON string or mapping — a Polygon, a MultiPolygon, or a
    Feature/geometry wrapping one — into [(shell, holes)] where shell
    and each hole are (lat, lon) vertex lists in the engine's format
    (GeoJSON positions are [lon, lat]; rings must be closed and the
    closing duplicate is stripped, since the containment expressions
    close implicitly)."""
    import json

    obj = json.loads(geojson) if isinstance(geojson, str) else dict(geojson)
    while obj.get("type") in ("Feature",):
        obj = obj["geometry"]
    if obj.get("type") == "FeatureCollection":
        feats = obj.get("features") or []
        if len(feats) != 1:
            raise ValueError(
                "FeatureCollection must hold exactly one polygon feature"
            )
        obj = feats[0]["geometry"]
    gtype = obj.get("type")
    if gtype == "Polygon":
        polys = [obj["coordinates"]]
    elif gtype == "MultiPolygon":
        polys = list(obj["coordinates"])
    else:
        raise ValueError(
            f"can only parse Polygon or MultiPolygon, got {gtype!r}"
        )

    def ring(coords):
        if len(coords) < 4:
            raise ValueError("ring must have at least 4 positions")
        if coords[0] != coords[-1]:
            raise ValueError(
                "first and last points of the polygon must be the same "
                "(it must close itself): "
                f"{coords[0]} != {coords[-1]}"
            )
        return [(float(lat), float(lon)) for lon, lat, *_ in coords[:-1]]

    out = []
    for rings in polys:
        if not rings:
            raise ValueError("polygon has no rings")
        out.append((ring(rings[0]), [ring(r) for r in rings[1:]]))
    return out


def polygon_with_holes_contains_col(lat_col, lon_col, shell, holes=()):
    """General polygon containment with holes: even-odd parity of ray
    crossings summed over the shell AND every hole ring — a point
    inside a hole crosses an even total and drops out, exactly the
    Polygon2D-with-holes semantics under the PNPOLY boundary
    convention (see polygon_contains_general_col)."""
    cnt = F.lit(0)
    for ring in [shell, *holes]:
        n = len(ring)
        for i in range(n):
            y1, x1 = (float(v) for v in ring[i])
            y2, x2 = (float(v) for v in ring[(i + 1) % n])
            if y1 == y2:
                continue
            straddle = (F.lit(y1) > lat_col) != (F.lit(y2) > lat_col)
            xint = (
                F.lit(x2 - x1) * (lat_col - F.lit(y1)) / F.lit(y2 - y1)
                + F.lit(x1)
            )
            cnt = cnt + F.when(straddle & (lon_col < xint), 1).otherwise(0)
    return cnt % 2 == 1


# ----------------------------------------------- WGS84 ellipsoid geo3d

# PlanetModel.WGS84 normalized scaling constants (reference
# lucene/spatial3d/src/java/org/apache/lucene/spatial3d/geom/
# PlanetModel.java:34-41,92-108): xy scaling ab = equatorial/mean,
# z scaling c = polar/mean, flattening = (ab-c)/ab,
# squareRatio = (ab^2-c^2)/c^2, scale = (2*ab+c)/3.
#
# Note on membership shapes: every geo3d polygon edge plane passes
# through the origin (Plane(A, B) with D=0, Plane.java:71-74), and
# the WGS84 GeoPoint is the SAME unit direction as the sphere's
# scaled by computeDesiredEllipsoidMagnitude (Vector.java:564-566) —
# a positive scalar — so cross-product sidedness (and hence convex-
# polygon membership) is IDENTICAL to the SPHERE model; fn_geo3d's
# sphere result IS the WGS84 result for through-origin planes.  What
# the flattening genuinely changes is the SURFACE (geodesic) metric:
# PlanetModel.surfaceDistance (PlanetModel.java:281-338) runs
# Vincenty's inverse formula on the ellipsoid.  That is what this
# operator rebuilds.
WGS84_MEAN = 6371008.7714
WGS84_POLAR = 6356752.314245
WGS84_EQUATORIAL = 6378137.0
_W84_AB = WGS84_EQUATORIAL / WGS84_MEAN
_W84_C = WGS84_POLAR / WGS84_MEAN
_W84_FLATTENING = (_W84_AB - _W84_C) / _W84_AB
_W84_SQUARE_RATIO = (_W84_AB * _W84_AB - _W84_C * _W84_C) / (_W84_C * _W84_C)
_W84_SCALE = (2.0 * _W84_AB + _W84_C) / 3.0
_W84_INV_SCALE = 1.0 / _W84_SCALE


def with_vincenty_distance(
    df: DataFrame,
    lat1,
    lon1,
    lat2,
    lon2,
    out_col: str = "vincenty_scaled",
    iters: int = 8,
) -> DataFrame:
    """WGS84 geodesic distance — PlanetModel.surfaceDistance
    (PlanetModel.java:281-338), Vincenty's inverse formula with the
    lambda iteration UNROLLED to a fixed ``iters`` rounds (the
    reference loops to MINIMUM_RESOLUTION=1e-12; convergence is
    linear with ratio ~flattening≈1/298, so 8 rounds reach <1e-12
    for the non-antipodal fixture domain — once converged, extra
    rounds are a fixed point).  Inputs are lat/lon Columns in
    DEGREES; the result is in the reference's scaled planet units
    (c * inverseScale * A * (sigma - deltaSigma)); multiply by
    scale * WGS84_MEAN for meters.

    DataFrame-level (withColumn chain) so each iteration's
    intermediates are named once instead of exponentially duplicated
    subtrees; all arithmetic is codegen Column expressions — no
    shuffle, no UDF.  The sinSigma==0 early return (coincident
    points) is NOT reproduced — callers must keep zero-distance
    pairs out (the gate fixture guarantees it)."""
    f = _W84_FLATTENING
    P = "_vc_"
    lat1, lon1 = F.radians(lat1), F.radians(lon1)
    lat2, lon2 = F.radians(lat2), F.radians(lon2)
    df = df.withColumn(P + "L", lon2 - lon1)
    df = df.withColumn(P + "U1", F.atan(F.lit(1.0 - f) * F.tan(lat1)))
    df = df.withColumn(P + "U2", F.atan(F.lit(1.0 - f) * F.tan(lat2)))
    df = (
        df.withColumn(P + "sU1", F.sin(F.col(P + "U1")))
        .withColumn(P + "cU1", F.cos(F.col(P + "U1")))
        .withColumn(P + "sU2", F.sin(F.col(P + "U2")))
        .withColumn(P + "cU2", F.cos(F.col(P + "U2")))
    )
    df = (
        df.withColumn(P + "cc", F.col(P + "cU1") * F.col(P + "cU2"))
        .withColumn(P + "cs", F.col(P + "cU1") * F.col(P + "sU2"))
        .withColumn(P + "ss", F.col(P + "sU1") * F.col(P + "sU2"))
        .withColumn(P + "sc", F.col(P + "sU1") * F.col(P + "cU2"))
    )
    df = df.withColumn(P + "lam", F.col(P + "L"))
    for _ in range(iters):
        sl, cl = F.sin(F.col(P + "lam")), F.cos(F.col(P + "lam"))
        df = df.withColumn(P + "sl", sl).withColumn(P + "cl", cl)
        df = df.withColumn(
            P + "sinSig",
            F.sqrt(
                (F.col(P + "cU2") * F.col(P + "sl"))
                * (F.col(P + "cU2") * F.col(P + "sl"))
                + (F.col(P + "cs") - F.col(P + "sc") * F.col(P + "cl"))
                * (F.col(P + "cs") - F.col(P + "sc") * F.col(P + "cl"))
            ),
        )
        df = df.withColumn(
            P + "cosSig", F.col(P + "ss") + F.col(P + "cc") * F.col(P + "cl")
        )
        df = df.withColumn(
            P + "sig", F.atan2(F.col(P + "sinSig"), F.col(P + "cosSig"))
        )
        df = df.withColumn(
            P + "sinAl",
            F.col(P + "cc") * F.col(P + "sl") / F.col(P + "sinSig"),
        )
        df = df.withColumn(
            P + "cosSqAl", 1.0 - F.col(P + "sinAl") * F.col(P + "sinAl")
        )
        c2sm = (
            F.col(P + "cosSig")
            - 2.0 * F.col(P + "ss") / F.col(P + "cosSqAl")
        )
        df = df.withColumn(
            P + "c2sm", F.when(F.isnan(c2sm), F.lit(0.0)).otherwise(c2sm)
        )
        df = df.withColumn(
            P + "C",
            F.lit(f / 16.0)
            * F.col(P + "cosSqAl")
            * (4.0 + F.lit(f) * (4.0 - 3.0 * F.col(P + "cosSqAl"))),
        )
        df = df.withColumn(
            P + "lam",
            F.col(P + "L")
            + (1.0 - F.col(P + "C"))
            * F.lit(f)
            * F.col(P + "sinAl")
            * (
                F.col(P + "sig")
                + F.col(P + "C")
                * F.col(P + "sinSig")
                * (
                    F.col(P + "c2sm")
                    + F.col(P + "C")
                    * F.col(P + "cosSig")
                    * (-1.0 + 2.0 * F.col(P + "c2sm") * F.col(P + "c2sm"))
                )
            ),
        )
    df = df.withColumn(
        P + "uSq", F.col(P + "cosSqAl") * F.lit(_W84_SQUARE_RATIO)
    )
    df = df.withColumn(
        P + "A",
        1.0
        + F.col(P + "uSq")
        / 16384.0
        * (
            4096.0
            + F.col(P + "uSq")
            * (-768.0 + F.col(P + "uSq") * (320.0 - 175.0 * F.col(P + "uSq")))
        ),
    )
    df = df.withColumn(
        P + "B",
        F.col(P + "uSq")
        / 1024.0
        * (
            256.0
            + F.col(P + "uSq")
            * (-128.0 + F.col(P + "uSq") * (74.0 - 47.0 * F.col(P + "uSq")))
        ),
    )
    df = df.withColumn(
        P + "dSig",
        F.col(P + "B")
        * F.col(P + "sinSig")
        * (
            F.col(P + "c2sm")
            + F.col(P + "B")
            / 4.0
            * (
                F.col(P + "cosSig")
                * (-1.0 + 2.0 * F.col(P + "c2sm") * F.col(P + "c2sm"))
                - F.col(P + "B")
                / 6.0
                * F.col(P + "c2sm")
                * (-3.0 + 4.0 * F.col(P + "sinSig") * F.col(P + "sinSig"))
                * (-3.0 + 4.0 * F.col(P + "c2sm") * F.col(P + "c2sm"))
            )
        ),
    )
    df = df.withColumn(
        out_col,
        F.lit(_W84_C * _W84_INV_SCALE)
        * F.col(P + "A")
        * (F.col(P + "sig") - F.col(P + "dSig")),
    )
    drop = [c for c in df.columns if c.startswith(P)]
    return df.drop(*drop)
