"""Freeze two-sample inference oracle values from commons-math3.

The reference's MannWhitneyUEvaluator / KolmogorovSmirnovEvaluator
delegate to commons-math3's MannWhitneyUTest / KolmogorovSmirnovTest —
the library bundled in Spark's JVM. This script freezes deterministic
sample pairs (with ties, to exercise tie-averaged ranking) plus that
library's U statistic, asymptotic p, and KS D into
fixtures_data/hyp_tests2.parquet; the gate recomputes all three LIVE
with higher-order Column exprs.

Usage: python scripts/make_hyptests_fixture.py
"""

import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

OUT = os.path.join(HERE, "lucene_solr_spark", "fixtures_data",
                   "hyp_tests2.parquet")


def main():
    from lucene_solr_spark.session import get_spark

    spark = get_spark(cores=2, shuffle_partitions=2,
                      extra_conf={"spark.driver.memory": "4g",
                                  "spark.ui.showConsoleProgress": "false"})
    jvm = spark._jvm
    mw = jvm.org.apache.commons.math3.stat.inference.MannWhitneyUTest()
    ks = jvm.org.apache.commons.math3.stat.inference.KolmogorovSmirnovTest()

    gw = spark.sparkContext._gateway

    def jarr(vals):
        arr = gw.new_array(gw.jvm.double, len(vals))
        for i, v in enumerate(vals):
            arr[i] = float(v)
        return arr

    rng = random.Random(20260819)
    rows = []
    for pid in range(40):
        n1 = rng.randrange(6, 16)
        n2 = rng.randrange(6, 16)
        xs = [float(rng.randrange(0, 12)) for _ in range(n1)]
        ys = [float(rng.randrange(2, 14)) for _ in range(n2)]
        rows.append((
            pid, xs, ys,
            mw.mannWhitneyU(jarr(xs), jarr(ys)),
            mw.mannWhitneyUTest(jarr(xs), jarr(ys)),
            ks.kolmogorovSmirnovStatistic(jarr(xs), jarr(ys)),
        ))
    spark.stop()
    pd.DataFrame(rows, columns=["pair_id", "xs", "ys", "mw_u", "mw_p",
                                "ks_d"]).to_parquet(OUT, index=False)
    print(f"froze {len(rows)} commons-math3 test rows -> {OUT}")


if __name__ == "__main__":
    main()
