"""Freeze FFT + Akima oracle values from commons-math3.

FFTEvaluator / AkimaEvaluator delegate to commons-math3
(FastFourierTransformer STANDARD, AkimaSplineInterpolator). This
script freezes deterministic series plus the real library's outputs
into fixtures_data/transform_chain.parquet, asserting the rebuild
(numpy.fft / the Akima Hermite construction) agrees < 1e-9.

Usage: python scripts/make_transform_fixture.py
"""

import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np
import pandas as pd

OUT = os.path.join(HERE, "lucene_solr_spark", "fixtures_data",
                   "transform_chain.parquet")


def main():
    from lucene_solr_spark.functions.evaluators import akima_smooth
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

    tf = jvm.org.apache.commons.math3.transform.FastFourierTransformer(
        jvm.org.apache.commons.math3.transform.DftNormalization.STANDARD)
    fwd = jvm.org.apache.commons.math3.transform.TransformType.FORWARD
    ak = jvm.org.apache.commons.math3.analysis.interpolation \
        .AkimaSplineInterpolator()

    rng = random.Random(20260819)
    rows = []
    worst = 0.0
    for pid in range(30):
        # FFT needs radix-2 length
        n = rng.choice([8, 16, 32])
        ys = [round(rng.uniform(-10, 10), 3) for _ in range(n)]
        z = tf.transform(jarr(ys), fwd)
        re = [c.getReal() for c in z]
        im = [c.getImaginary() for c in z]
        npz = np.fft.fft(np.array(ys))
        worst = max(worst,
                    float(np.max(np.abs(npz.real - re))),
                    float(np.max(np.abs(npz.imag - im))))
        f = ak.interpolate(jarr(range(n)), jarr(ys))
        probes = [i + 0.5 for i in range(n - 1)]
        akref = [f.value(p) for p in probes]
        mine = akima_smooth(ys, probes)
        worst = max(worst, float(np.max(np.abs(
            np.array(akref) - np.array(mine)))))
        rows.append((pid, ys, re, im, akref))
    spark.stop()
    print(f"max |commons-math - rebuild| = {worst:.2e}")
    assert worst < 1e-9, worst
    pd.DataFrame(rows, columns=["pair_id", "ys", "fft_re", "fft_im",
                                "akima_mid"]).to_parquet(OUT, index=False)
    print(f"froze {len(rows)} transform rows -> {OUT}")


if __name__ == "__main__":
    main()
