"""Freeze the spline/derivative/integrate oracle from commons-math3.

SplineEvaluator/DerivativeEvaluator/IntegrateEvaluator delegate to
commons-math3 (SplineInterpolator natural cubic, spline .derivative(),
RombergIntegrator). This script freezes deterministic series plus the
real library's midpoint values, knot derivatives, and Romberg integral
into fixtures_data/spline_chain.parquet, asserting the rebuild's numpy
natural-cubic implementation agrees < 1e-7 before freezing.

Usage: python scripts/make_spline_fixture.py
"""

import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np
import pandas as pd

OUT = os.path.join(HERE, "lucene_solr_spark", "fixtures_data",
                   "spline_chain.parquet")


def main():
    from lucene_solr_spark.functions.evaluators import _natural_cubic_spline
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

    interp = jvm.org.apache.commons.math3.analysis.interpolation \
        .SplineInterpolator()
    # tight-tolerance Romberg: the reference default runs at 1e-6
    # RELATIVE accuracy, so its return value wanders ~1e-4 absolute
    # around the true integral; freeze the converged value instead and
    # document the tolerance in the gate docstring.
    romberg = jvm.org.apache.commons.math3.analysis.integration \
        .RombergIntegrator(1e-12, 1e-12, 3, 32)

    rng = random.Random(20260819)
    rows = []
    worst = 0.0
    for pid in range(30):
        n = rng.randrange(5, 13)
        ys = [round(rng.uniform(-20, 20), 3) for _ in range(n)]
        xs = list(range(n))
        sf = interp.interpolate(jarr(xs), jarr(ys))
        dsf = sf.derivative()
        mids = [sf.value(i + 0.5) for i in range(n - 1)]
        derivs = [dsf.value(float(i)) for i in range(n)]
        integral = romberg.integrate(100000, sf, 0.0, float(n - 1))

        a, b, c, d = _natural_cubic_spline(ys)
        my_mid = [a[i] + b[i] * 0.5 + c[i] * 0.25 + d[i] * 0.125
                  for i in range(n - 1)]
        my_der = [b[i] for i in range(n - 1)] + [
            b[-1] + 2.0 * c[-1] + 3.0 * d[-1]]
        my_int = sum(a[i] + b[i] / 2.0 + c[i] / 3.0 + d[i] / 4.0
                     for i in range(n - 1))
        worst = max(
            worst,
            float(np.max(np.abs(np.array(my_mid) - np.array(mids)))),
            float(np.max(np.abs(np.array(my_der) - np.array(derivs)))),
            abs(my_int - integral),
        )
        rows.append((pid, ys, mids, derivs, integral))
    spark.stop()
    print(f"max |commons-math - rebuild| = {worst:.2e}")
    assert worst < 1e-7, worst
    pd.DataFrame(rows, columns=[
        "pair_id", "ys", "mids", "derivs", "integral",
    ]).to_parquet(OUT, index=False)
    print(f"froze {len(rows)} spline rows -> {OUT}")


if __name__ == "__main__":
    main()
