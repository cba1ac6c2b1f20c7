"""Freeze the distribution-evaluator oracle fixture from commons-math3.

The reference's distribution stream evaluators (solr/solrj/.../io/eval/
{Normal,Binomial,Poisson,Geometric,UniformReal}DistributionEvaluator +
CumulativeProbability/ProbabilityEvaluator) delegate to Apache
commons-math3 — the SAME library bundled inside Spark's JVM. This
script evaluates that real library over the integer quantity domain
(x = 1..50, the fn_eval_math domain) and freezes the values to
fixtures_data/distrib_probs.parquet. The driver gate then runs the
rebuild's LIVE Column/Arrow implementations on Spark and the frozen
commons-math values on DuckDB — non-circular, library-exact (compared
at 6dp, absorbing commons-math's saddle-point vs direct-formula ulps).

Usage: python scripts/make_distrib_fixture.py
"""

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

OUT = os.path.join(HERE, "lucene_solr_spark", "fixtures_data",
                   "distrib_probs.parquet")


def main():
    from lucene_solr_spark.session import get_spark

    spark = get_spark(cores=2, shuffle_partitions=2,
                      extra_conf={"spark.driver.memory": "4g",
                                  "spark.ui.showConsoleProgress": "false"})
    jvm = spark._jvm.org.apache.commons.math3.distribution
    norm = jvm.NormalDistribution(25.0, 10.0)
    binom = jvm.BinomialDistribution(50, 0.3)
    pois = jvm.PoissonDistribution(4.0)
    geom = jvm.GeometricDistribution(0.25)
    weib = jvm.WeibullDistribution(1.5, 20.0)
    logn = jvm.LogNormalDistribution(3.0, 0.5)
    zipf = jvm.ZipfDistribution(50, 1.2)
    tri = jvm.TriangularDistribution(0.0, 20.0, 55.0)
    rows = []
    for x in range(1, 51):
        rows.append((
            x,
            norm.cumulativeProbability(float(x)),
            binom.probability(x),
            pois.probability(x % 15),
            geom.cumulativeProbability(x % 12),
            weib.cumulativeProbability(float(x)),
            logn.cumulativeProbability(float(x)),
            zipf.probability(x),
            tri.cumulativeProbability(float(x)),
        ))
    spark.stop()
    pd.DataFrame(rows, columns=[
        "x", "norm_cdf", "binom_pmf", "poisson_pmf", "geom_cdf",
        "weibull_cdf", "lognorm_cdf", "zipf_pmf", "tri_cdf",
    ]).to_parquet(OUT, index=False)
    print(f"froze {len(rows)} commons-math3 rows -> {OUT}")


if __name__ == "__main__":
    main()
