"""Freeze LOESS oracle values from commons-math3 (bit-exact check).

LoessEvaluator delegates to commons-math3 LoessInterpolator (bandwidth
0.25, robustIterations 2). This script freezes deterministic series
plus the real library's smoothed output into
fixtures_data/loess.parquet, asserting the rebuild reproduces every
value to < 1e-9 before freezing (observed ~1e-13).

Usage: python scripts/make_loess_fixture.py
"""

import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np
import pandas as pd

OUT = os.path.join(HERE, "lucene_solr_spark", "fixtures_data",
                   "loess.parquet")


def main():
    from lucene_solr_spark.functions.evaluators import loess_smooth
    from lucene_solr_spark.session import get_spark

    spark = get_spark(cores=2, shuffle_partitions=2,
                      extra_conf={"spark.driver.memory": "4g",
                                  "spark.ui.showConsoleProgress": "false"})
    jvm = spark._jvm
    gw = spark.sparkContext._gateway

    def jarr(vals):
        arr = gw.new_array(gw.jvm.double, len(vals))
        for i, v in enumerate(vals):
            arr[i] = float(v)
        return arr

    rng = random.Random(20260819)
    rows = []
    worst = 0.0
    for pid in range(30):
        n = rng.randrange(10, 30)
        ys = [round(0.3 * i + rng.uniform(-5, 5), 3) for i in range(n)]
        lo = jvm.org.apache.commons.math3.analysis.interpolation \
            .LoessInterpolator(0.25, 2)
        ref = list(lo.smooth(jarr(range(n)), jarr(ys)))
        mine = loess_smooth(ys)
        worst = max(worst, float(np.max(np.abs(
            np.array(ref) - np.array(mine)))))
        rows.append((pid, ys, ref))
    spark.stop()
    print(f"max |commons-math - rebuild| = {worst:.2e}")
    assert worst < 1e-9, worst
    pd.DataFrame(rows, columns=["pair_id", "ys", "smoothed"]).to_parquet(
        OUT, index=False)
    print(f"froze {len(rows)} loess rows -> {OUT}")


if __name__ == "__main__":
    main()
