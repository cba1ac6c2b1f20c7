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
