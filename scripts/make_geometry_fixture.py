"""Freeze convexHull/enclosingDisk oracle values from commons-math3.

ConvexHullEvaluator (+ getVertices/getArea/getBaryCenter accessors) and
EnclosingDiskEvaluator (+ getCenter/getRadius) delegate to commons-math3
MonotoneChain/ConvexHull2D and WelzlEncloser/DiskGenerator. Both
results are UNIQUE properties of the point set (hull region, minimum
enclosing disk), so any correct algorithm matches; this script freezes
deterministic point sets plus the real library's hull size/area/
centroid and disk center/radius into fixtures_data/geometry.parquet,
asserting the rebuild agrees < 1e-9.

Usage: python scripts/make_geometry_fixture.py
"""

import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

OUT = os.path.join(HERE, "lucene_solr_spark", "fixtures_data",
                   "geometry.parquet")


def main():
    from lucene_solr_spark.functions.evaluators import (
        convex_hull, enclosing_disk,
    )
    from lucene_solr_spark.session import get_spark

    spark = get_spark(cores=2, shuffle_partitions=2,
                      extra_conf={"spark.driver.memory": "4g",
                                  "spark.ui.showConsoleProgress": "false"})
    jvm = spark._jvm
    g2d = jvm.org.apache.commons.math3.geometry.euclidean.twod

    rng = random.Random(20260819)
    rows = []
    worst = 0.0
    for pid in range(30):
        n = rng.randrange(5, 40)
        pts = [(round(rng.uniform(-10, 10), 2),
                round(rng.uniform(-10, 10), 2)) for _ in range(n)]
        jl = jvm.java.util.ArrayList()
        for x, y in pts:
            jl.add(g2d.Vector2D(float(x), float(y)))
        hull = g2d.hull.MonotoneChain().generate(jl)
        region = hull.createRegion()
        ball = jvm.org.apache.commons.math3.geometry.enclosing \
            .WelzlEncloser(1e-10, g2d.DiskGenerator()).enclose(jl)
        h, area, cen = convex_hull(pts)
        c, r = enclosing_disk(pts)
        worst = max(
            worst,
            abs(area - region.getSize()),
            abs(cen[0] - region.getBarycenter().getX()),
            abs(len(h) - len(list(hull.getVertices()))),
            abs(r - ball.getRadius()),
            abs(c[0] - ball.getCenter().getX()),
            abs(c[1] - ball.getCenter().getY()),
        )
        rows.append((
            pid, [p[0] for p in pts], [p[1] for p in pts],
            len(list(hull.getVertices())), region.getSize(),
            region.getBarycenter().getX(), region.getBarycenter().getY(),
            ball.getRadius(), ball.getCenter().getX(),
            ball.getCenter().getY(),
        ))
    spark.stop()
    print(f"max |commons-math - rebuild| = {worst:.2e}")
    assert worst < 1e-9, worst
    pd.DataFrame(rows, columns=[
        "pair_id", "xs", "ys", "hull_n", "hull_area", "bary_x", "bary_y",
        "disk_r", "disk_cx", "disk_cy",
    ]).to_parquet(OUT, index=False)
    print(f"froze {len(rows)} geometry rows -> {OUT}")


if __name__ == "__main__":
    main()
