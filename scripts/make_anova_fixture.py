"""Freeze ANOVA / earth-movers / OLS-regression oracle values from
commons-math3, plus gamma/beta/enumerated distribution CDF values.

The reference evaluators delegate straight to commons-math3 (the
library bundled in Spark's JVM): AnovaEvaluator → OneWayAnova,
EarthMoversEvaluator → ml.distance.EarthMoversDistance,
OLSRegressionEvaluator → stat.regression.OLSMultipleLinearRegression,
{Gamma,Beta}DistributionEvaluator → distribution.{Gamma,Beta}Distribution,
EnumeratedDistributionEvaluator → EnumeratedIntegerDistribution
(solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/). This
script freezes deterministic inputs plus that library's outputs into
fixtures_data/{anova_ols.parquet, distrib3.parquet}; the gates
recompute everything LIVE (HOF Column exprs + Arrow UDFs).

Usage: python scripts/make_anova_fixture.py
"""

import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

OUT_ANOVA = os.path.join(HERE, "lucene_solr_spark", "fixtures_data",
                         "anova_ols.parquet")
OUT_DISTRIB3 = os.path.join(HERE, "lucene_solr_spark", "fixtures_data",
                            "distrib3.parquet")

from lucene_solr_spark.functions.evaluators import (  # noqa: E402
    ENUM_VALUES, ENUM_WEIGHTS,
)


def main():
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

    def jmat(rows):
        m = gw.new_array(gw.jvm.double, len(rows), len(rows[0]))
        for i, r in enumerate(rows):
            for j, v in enumerate(r):
                m[i][j] = float(v)
        return m

    anova = jvm.org.apache.commons.math3.stat.inference.OneWayAnova()
    emd = jvm.org.apache.commons.math3.ml.distance.EarthMoversDistance()
    tt = jvm.org.apache.commons.math3.stat.inference.TTest()
    chi = jvm.org.apache.commons.math3.stat.inference.ChiSquareTest()

    def jlong(vals):
        arr = gw.new_array(gw.jvm.long, len(vals))
        for i, v in enumerate(vals):
            arr[i] = int(v)
        return arr

    rng = random.Random(20260819)
    rows = []
    for pid in range(30):
        n = rng.randrange(6, 14)  # equal length: EMD requires it
        g1 = [round(rng.uniform(0, 20), 3) for _ in range(n)]
        g2 = [round(rng.uniform(2, 24), 3) for _ in range(n)]
        g3 = [round(rng.uniform(1, 22), 3) for _ in range(n)]
        groups = jvm.java.util.ArrayList()
        for g in (g1, g2, g3):
            groups.add(jarr(g))
        f_ratio = anova.anovaFValue(groups)
        p_value = anova.anovaPValue(groups)
        emd_12 = emd.compute(jarr(g1), jarr(g2))

        # inference-p trio — frozen from the JVM, with the live Python
        # implementations asserted against it here so a formula drift
        # fails THIS script, not the gate
        from lucene_solr_spark.functions.evaluators import (
            _chi2_datasets_p, _pearson_p, _welch_p,
        )

        welch_p = tt.tTest(jarr(g1), jarr(g2))
        assert abs(welch_p - _welch_p(g1, g2)) < 1e-10, (pid, "welch")
        # PearsonsCorrelation.getCorrelationPValues over the 2-col matrix
        pc = (jvm.org.apache.commons.math3.stat.correlation
              .PearsonsCorrelation(jmat([[a, b] for a, b in zip(g1, g2)])))
        corr_p = pc.getCorrelationPValues().getEntry(0, 1)
        assert abs(corr_p - _pearson_p(g1, g2)) < 1e-10, (pid, "corr")
        c1 = [int(round(x)) + 1 for x in g1]
        c2 = [int(round(x)) + 1 for x in g2]
        chi2_p = chi.chiSquareTestDataSetsComparison(jlong(c1), jlong(c2))
        assert abs(chi2_p - _chi2_datasets_p(c1, c2)) < 1e-10, (pid, "chi2")

        # OLS: 2 features + intercept over 12-18 rows
        m = rng.randrange(12, 19)
        X = [[round(rng.uniform(0, 10), 3), round(rng.uniform(-5, 5), 3)]
             for _ in range(m)]
        y = [round(2.0 + 1.5 * a - 0.7 * b + rng.uniform(-1, 1), 3)
             for a, b in X]
        ols = (jvm.org.apache.commons.math3.stat.regression
               .OLSMultipleLinearRegression())
        ols.newSampleData(jarr(y), jmat(X))
        beta = list(ols.estimateRegressionParameters())
        rsq = ols.calculateRSquared()
        rows.append((pid, g1, g2, g3, f_ratio, p_value, emd_12,
                     X, y, beta[0], beta[1], beta[2], rsq,
                     welch_p, corr_p, chi2_p))
    pd.DataFrame(rows, columns=[
        "pair_id", "g1", "g2", "g3", "f_ratio", "p_value", "emd",
        "xmat", "yvec", "b0", "b1", "b2", "rsq",
        "welch_p", "corr_p", "chi2_p",
    ]).to_parquet(OUT_ANOVA, index=False)

    gamma = jvm.org.apache.commons.math3.distribution.GammaDistribution(
        3.0, 5.0)
    beta_d = jvm.org.apache.commons.math3.distribution.BetaDistribution(
        2.5, 4.0)
    ivals = gw.new_array(gw.jvm.int, len(ENUM_VALUES))
    for i, v in enumerate(ENUM_VALUES):
        ivals[i] = v
    wvals = jarr(ENUM_WEIGHTS)
    enum_d = (jvm.org.apache.commons.math3.distribution
              .EnumeratedIntegerDistribution(ivals, wvals))
    drows = []
    for x in range(1, 51):
        drows.append((
            x,
            gamma.cumulativeProbability(float(x)),
            beta_d.cumulativeProbability(x / 51.0),
            enum_d.probability(x),
            enum_d.cumulativeProbability(x),
        ))
    pd.DataFrame(drows, columns=[
        "x", "gamma_cdf", "beta_cdf", "enum_pmf", "enum_cdf",
    ]).to_parquet(OUT_DISTRIB3, index=False)
    spark.stop()
    print("wrote", OUT_ANOVA, "and", OUT_DISTRIB3)


if __name__ == "__main__":
    main()
