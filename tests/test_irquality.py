"""QualityStats parity (operators/irquality.py) vs a direct port of
the reference's addResult fold (lucene/benchmark/.../quality/
QualityStats.java:80-130)."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def reference_fold(ranked_rel_flags, max_good, mrr_cut=5):
    """Literal transcription of QualityStats.addResult + getters."""
    num_good = 0
    p_sum = 0.0
    mrr = 0.0
    first = True
    p_at = {}
    for n, is_rel in enumerate(ranked_rel_flags, start=1):
        if is_rel:
            num_good += 1
            if first and n <= mrr_cut:
                mrr = 1.0 / n
            first = False
        p = num_good / n
        if is_rel:
            p_sum += p
        p_at[n] = p
    num_points = len(ranked_rel_flags)

    def precision_at(n):
        if n > num_points:
            return (num_points * p_at[num_points]) / n if num_points else 0.0
        return p_at[n]

    return {
        "num_good": num_good,
        "avp": 0.0 if max_good == 0 else p_sum / max_good,
        "mrr": mrr,
        "recall": (
            num_good / max_good
            if max_good > 0
            else (num_good / num_points if num_points else 0.0)
        ),
        "p5": precision_at(5),
        "p10": precision_at(10),
    }


@settings(deadline=None, max_examples=15)
@given(
    st.lists(
        st.lists(st.booleans(), min_size=1, max_size=20),
        min_size=1,
        max_size=4,
    ),
    st.integers(0, 10),
)
def test_quality_stats_matches_reference_fold(spark, flags_per_q, extra_rel):
    from lucene_solr_spark.operators.irquality import quality_stats

    run_rows, judg_rows, want = [], [], {}
    for qi, flags in enumerate(flags_per_q):
        qid = f"q{qi}"
        for rank, is_rel in enumerate(flags, start=1):
            run_rows.append((qid, rank * 100, rank))  # doc_id = rank*100
            if is_rel:
                judg_rows.append((qid, rank * 100))
        # unretrieved relevant docs enlarge the pool (TREC judgments
        # include docs the run never returned)
        n_extra = extra_rel if qi == 0 else 0
        for e in range(n_extra):
            judg_rows.append((qid, 10_000 + e))
        max_good = sum(flags) + n_extra
        want[qid] = reference_fold(flags, max_good)

    run = spark.createDataFrame(
        run_rows, "qid string, doc_id long, rank int"
    )
    judg = spark.createDataFrame(judg_rows, "qid string, doc_id long") \
        if judg_rows else spark.createDataFrame(
            [], "qid string, doc_id long")
    got = {
        r["qid"]: r
        for r in quality_stats(run, judg, cutoffs=(5, 10)).collect()
    }
    assert set(got) == set(want)
    for qid, w in want.items():
        g = got[qid]
        assert g["num_good"] == w["num_good"]
        for k_spark, k_ref in [
            ("avp", "avp"), ("mrr", "mrr"), ("recall", "recall"),
            ("p_at_5", "p5"), ("p_at_10", "p10"),
        ]:
            assert math.isclose(
                g[k_spark], w[k_ref], rel_tol=0, abs_tol=1e-12
            ), (qid, k_spark, g[k_spark], w[k_ref])
