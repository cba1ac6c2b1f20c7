"""Freeze PolyFit oracle values from commons-math3.

PolyFitEvaluator delegates to commons-math3 PolynomialCurveFitter
(Levenberg-Marquardt on a linear-in-parameters model, i.e. the least
squares optimum). This script freezes deterministic series plus the
real library's degree-3 fitted predictions into
fixtures_data/polyfit.parquet, and asserts numpy's lstsq polyfit agrees
to < 1e-8 (they solve the same normal equations) so the LIVE Arrow UDF
is a faithful replacement.

Usage: python scripts/make_polyfit_fixture.py
"""

import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np
import pandas as pd

OUT = os.path.join(HERE, "lucene_solr_spark", "fixtures_data",
                   "polyfit.parquet")


def main():
    from lucene_solr_spark.session import get_spark

    spark = get_spark(cores=2, shuffle_partitions=2,
                      extra_conf={"spark.driver.memory": "4g",
                                  "spark.ui.showConsoleProgress": "false"})
    jvm = spark._jvm
    gw = spark.sparkContext._gateway

    rng = random.Random(20260819)
    rows = []
    worst = 0.0
    for pid in range(30):
        n = rng.randrange(8, 17)
        ys = [round(0.5 * i * i - 3.0 * i + rng.uniform(-4, 4), 3)
              for i in range(n)]
        pts = jvm.org.apache.commons.math3.fitting.WeightedObservedPoints()
        for i, y in enumerate(ys):
            pts.add(float(i), float(y))
        fitter = jvm.org.apache.commons.math3.fitting \
            .PolynomialCurveFitter.create(3)
        coef = list(fitter.fit(pts.toList()))
        pf = jvm.org.apache.commons.math3.analysis.polynomials \
            .PolynomialFunction(gw.new_array(gw.jvm.double, len(coef)))
        # build PolynomialFunction via array fill
        arr = gw.new_array(gw.jvm.double, len(coef))
        for i, c in enumerate(coef):
            arr[i] = c
        pf = jvm.org.apache.commons.math3.analysis.polynomials \
            .PolynomialFunction(arr)
        preds = [pf.value(float(i)) for i in range(n)]
        np_preds = np.polyval(np.polyfit(np.arange(n), np.array(ys), 3),
                              np.arange(n))
        worst = max(worst, float(np.max(np.abs(np_preds - preds))))
        rows.append((pid, ys, preds))
    spark.stop()
    print(f"max |commons-math - numpy| = {worst:.2e}")
    assert worst < 1e-8, worst
    pd.DataFrame(rows, columns=["pair_id", "ys", "preds"]).to_parquet(
        OUT, index=False)
    print(f"froze {len(rows)} polyfit rows -> {OUT}")


if __name__ == "__main__":
    main()
