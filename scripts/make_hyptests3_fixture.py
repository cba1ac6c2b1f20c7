"""Freeze paired-t / G-test oracle values from commons-math3.

The reference's PairedTTestEvaluator / GTestDataSetEvaluator delegate
to commons-math3's TTest.pairedTTest / GTest.gTestDataSetsComparison —
the library bundled in Spark's JVM. This script freezes deterministic
paired samples + count vectors along with that library's p-values
(plus exact mean/sum differences) into
fixtures_data/hyp_tests3.parquet, ASSERTING the Python reformulations
in functions/evaluators.py agree with the JVM to <1e-10 on every case;
the gate recomputes all four LIVE via the Arrow UDF.

Usage: python scripts/make_hyptests3_fixture.py
"""

import os
import random
import statistics
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

OUT = os.path.join(HERE, "lucene_solr_spark", "fixtures_data",
                   "hyp_tests3.parquet")


def main():
    from lucene_solr_spark.functions.evaluators import (
        _gtest_datasets_p, _paired_ttest_p,
    )
    from lucene_solr_spark.session import get_spark

    spark = get_spark(cores=2, shuffle_partitions=2,
                      extra_conf={"spark.driver.memory": "4g",
                                  "spark.ui.showConsoleProgress": "false"})
    jvm = spark._jvm
    tt = jvm.org.apache.commons.math3.stat.inference.TTest()
    gt = jvm.org.apache.commons.math3.stat.inference.GTest()
    gw = spark.sparkContext._gateway

    def jdarr(vals):
        arr = gw.new_array(gw.jvm.double, len(vals))
        for i, v in enumerate(vals):
            arr[i] = float(v)
        return arr

    def jlarr(vals):
        arr = gw.new_array(gw.jvm.long, len(vals))
        for i, v in enumerate(vals):
            arr[i] = int(v)
        return arr

    rng = random.Random(20260820)
    rows = []
    for pid in range(40):
        n = rng.randrange(5, 14)
        xs = [float(rng.randrange(0, 40)) / 2.0 for _ in range(n)]
        ys = [x + float(rng.randrange(-6, 9)) / 2.0 for x in xs]
        if all(x == y for x, y in zip(xs, ys)):
            ys[0] += 1.0
        k = rng.randrange(3, 8)
        c1 = [rng.randrange(1, 40) for _ in range(k)]
        c2 = [rng.randrange(1, 40) for _ in range(k)]

        jp = tt.pairedTTest(jdarr(xs), jdarr(ys))
        jg = gt.gTestDataSetsComparison(jlarr(c1), jlarr(c2))
        pp = _paired_ttest_p(xs, ys)
        pg = _gtest_datasets_p(c1, c2)
        assert abs(jp - pp) < 1e-10, (pid, jp, pp)
        assert abs(jg - pg) < 1e-10, (pid, jg, pg)

        d = [x - y for x, y in zip(xs, ys)]
        rows.append({
            "pair_id": pid, "xs": xs, "ys": ys, "c1": c1, "c2": c2,
            "paired_p": jp, "gtest_p": jg,
            "mean_diff": statistics.fmean(d), "sum_diff": float(sum(d)),
        })

    pd.DataFrame(rows).to_parquet(OUT, index=False)
    print(f"wrote {OUT} ({len(rows)} cases, JVM parity asserted)")


if __name__ == "__main__":
    main()
