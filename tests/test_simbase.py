"""SimilarityBase family (search/simbase.py) — three verifications:

1. Cross-engine parity: each family gate vs its DuckDB oracle at
   sf0.001 (the driver re-checks at sf0.01).
2. An INDEPENDENT numpy reference scorer (no SQL templates, plain
   Python math replicating the Java arithmetic incl. float32
   intermediates) must reproduce every registered model at 4dp.
3. The declared-divergence guards are unreachable for the registered
   terms: lambda_df/lambda_ttf != 1 and DistributionSPL's
   pow(lambda, q) != lambda on every scored posting.

Reference: lucene/core/src/java/org/apache/lucene/search/similarities/
(formula citations in search/simbase.py docstrings).
"""

import math
import re

import duckdb
import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.functions import smallfloat
from lucene_solr_spark.gate import PARTS, PARTS_SQL
from lucene_solr_spark.gate_sim import (
    _DFI_AX_MODELS, _DFR_IB_MODELS, _LM_MODELS, _MISC_MODELS, _TERMS)

SF = "/root/testdata/sf0.001"
GATES = ["fts_sim_lm", "fts_sim_dfr_ib", "fts_sim_dfi_ax", "fts_sim_misc"]
ALL_MODELS = _LM_MODELS + _DFR_IB_MODELS + _DFI_AX_MODELS + _MISC_MODELS
LOG2 = math.log(2)


@pytest.fixture(scope="module")
def corpus():
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    toks = {
        int(r.doc_id): re.findall(r"[a-z0-9]+", r.text.lower())
        for r in docs.itertuples()
    }
    toks = {d: t for d, t in toks.items() if t}
    dl = {d: len(t) for d, t in toks.items()}
    qdl_tab = smallfloat.byte4_to_int(np.arange(256)).astype(float)
    qdl = {
        d: float(qdl_tab[int(smallfloat.int_to_byte4(np.array([n]))[0])])
        for d, n in dl.items()
    }
    n_docs = len(dl)
    sum_ttf = sum(dl.values())
    stats = {}
    for term in _TERMS:
        freqs = {
            d: t.count(term) for d, t in toks.items() if term in t
        }
        stats[term] = (len(freqs), sum(freqs.values()), freqs)
    return qdl, float(n_docs), float(sum_ttf), stats


def _ref_score(tag, model, params, freq, dl, df, cf, n, t):
    """Independent reference: plain Python floats, Java float32
    intermediates via np.float32."""
    p = (cf + 1.0) / (t + 1.0)
    avg = t / n
    if model == "dirichlet":
        mu = params["mu"]
        return max(
            0.0, math.log(1 + freq / (mu * p)) + math.log(mu / (dl + mu))
        )
    if model == "jelinek_mercer":
        lam = float(np.float32(params["lam"]))
        om = float(np.float32(1.0) - np.float32(params["lam"]))
        return math.log(1 + (om * freq / dl) / (lam * p))
    if model == "dfi":
        e = (cf + 1.0) * dl / (t + 1.0)
        if freq <= e:
            return 0.0
        m = {
            "standardized": (freq - e) / math.sqrt(e),
            "saturated": (freq - e) / e,
            "chisquared": (freq - e) ** 2 / e,
        }[params["measure"]]
        return math.log(m + 1) / LOG2
    if model in ("dfr", "ib"):
        norm = params["normalization"]
        if norm == "h1":
            tfn = freq * float(np.float32(params.get("c", 1.0))) * (avg / dl)
        elif norm == "h2":
            tfn = freq * math.log(
                1 + float(np.float32(params.get("c", 1.0))) * avg / dl
            ) / LOG2
        elif norm == "h3":
            mu = float(np.float32(params.get("mu", 800.0)))
            ratio = np.float32(cf + 1.0) / np.float32(t + 1.0)
            tfn = (freq + float(np.float32(mu) * ratio)) / (dl + mu) * mu
        elif norm == "z":
            tfn = freq * (avg / dl) ** float(np.float32(params.get("z", 0.3)))
        else:
            tfn = freq
        if model == "ib":
            if params["lam"] == "df":
                lam = float(np.float32((df + 1.0) / (n + 1.0)))
            else:
                lam = float(np.float32((cf + 1.0) / (n + 1.0)))
            assert lam != 1.0, "declared-divergence guard reached"
            if params["distribution"] == "ll":
                return -math.log(lam / (tfn + lam))
            q = 1 - 1 / (tfn + 1)
            pw = lam ** q
            assert pw != lam, "declared-divergence guard reached"
            return -math.log((pw - lam) / (1 - lam))
        ae = 1.0 if params["after_effect"] == "l" else (cf + 2.0) / (df + 1.0)
        bm = params["basic_model"]
        if bm == "g":
            lam = (cf + 1.0) / (n + (cf + 1.0))
            a = math.log(lam + 1) / LOG2
            b = math.log((1 + lam) / lam) / LOG2
            return (b - (b - a) / (1 + tfn)) * ae
        if bm == "in":
            a = math.log((n + 1.0) / (df + 0.5)) / LOG2
        elif bm == "if":
            a = math.log(1 + (n + 1.0) / (cf + 0.5)) / LOG2
        else:  # ine
            ne = n * (1 - ((n - 1.0) / n) ** cf)
            a = math.log((n + 1.0) / (ne + 0.5)) / LOG2
        return a * ae * (1 - 1 / (1 + tfn))
    if model == "axiomatic":
        s = float(np.float32(0.25))
        k = float(np.float32(0.35))
        ql = 1.0
        v = params["variant"]
        tf_ = 1 + math.log(1 + math.log(freq + 1)) if v in (
            "f1exp", "f1log", "f3exp", "f3log") else 1.0
        ln_ = (avg + s) / (avg + dl * s) if v in ("f1exp", "f1log") else 1.0
        tfln = freq / (freq + s + s * dl / avg) if v in (
            "f2exp", "f2log") else 1.0
        idf = ((n + 1.0) / df) ** k if v.endswith("exp") else math.log(
            (n + 1.0) / df)
        gamma = (dl - ql) * s * ql / avg if v.startswith("f3") else 0.0
        return max(0.0, tf_ * ln_ * tfln * idf - gamma)
    if model == "sweetspot":
        ln_min, ln_max, steep = 3.0, 20.0, float(np.float32(0.5))
        lnorm = float(np.float32(1.0 / math.sqrt(float(np.float32(
            steep * (abs(dl - ln_min) + abs(dl - ln_max)
                     - (ln_max - ln_min)))) + 1.0)))
        if params["variant"] == "baseline":
            tb = float(np.float32(1.5))
            tm = float(np.float32(5.0))
            bb = float(np.float32(1.5) * np.float32(1.5))
            tf_ = tb if freq <= tm else float(
                np.float32(math.sqrt(freq + bb - tm)))
        else:
            x = freq - 10.0
            tanh = ((1.3 ** x - 1.3 ** -x) / (1.3 ** x + 1.3 ** -x))
            tf_ = float(np.float32(0.0 + 1.0 * (tanh + 1.0)))
        idf2 = (1.0 + math.log((n + 1.0) / (df + 1.0))) ** 2
        return idf2 * tf_ * lnorm
    if model == "legacy_bm25":
        # LegacyBM25Similarity.java:65-67 — BM25 with the boost scaled
        # by (1 + k1) in Java float32; body is the Lucene-9 formula
        k1, b = params["k1"], params["b"]
        kb = float(np.float32(1.0) + np.float32(k1))
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return kb * idf * (
            freq / (freq + k1 * (1 - b + b * dl / avg))
        )
    if model == "multi":
        return sum(
            _ref_score(tag, m, p, freq, dl, df, cf, n, t)
            for m, p in params["models"]
        )
    raise AssertionError(model)


@pytest.mark.parametrize("gate_name", GATES)
def test_duckdb_parity(spark, gate_name):
    sdf = (
        PARTS[gate_name](spark, SF)
        .toPandas()
        .sort_values(["model", "doc_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    odf = (
        con.execute(PARTS_SQL[gate_name])
        .df()
        .sort_values(["model", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        sdf.astype({"doc_id": "int64"}),
        odf.astype({"doc_id": "int64"}),
        check_dtype=False,
    )


@pytest.mark.parametrize("tag,model,params", ALL_MODELS)
def test_numpy_reference(spark, corpus, tag, model, params):
    qdl, n, t, stats = corpus
    expected = {}
    for term in _TERMS:
        df, cf, freqs = stats[term]
        for d, f in freqs.items():
            expected[d] = expected.get(d, 0.0) + _ref_score(
                tag, model, params, float(f), qdl[d], float(df),
                float(cf), n, t)
    exp = sorted(
        ((round(s, 4), d) for d, s in expected.items()),
        key=lambda x: (-x[0], x[1]),
    )[:20]
    from lucene_solr_spark.gate import docs_index
    from lucene_solr_spark.search.simbase import search_similarity

    got = (
        search_similarity(docs_index(spark, SF), _TERMS, model, k=None,
                          **params)
        .toPandas()
        .sort_values("doc_id")
    )
    got_map = dict(zip(got.doc_id.astype(int), got.score))
    assert len(got_map) == len(expected)
    for score4, d in exp:
        assert abs(round(got_map[d], 4) - score4) <= 1e-4, (tag, d)


def test_divergence_guards_unreachable(corpus):
    """LambdaDF/TTF == 1 and SPL pow == lambda never occur for the
    registered terms (the _ref_score asserts cover SPL per posting;
    this covers the lambda preconditions globally)."""
    qdl, n, t, stats = corpus
    for term in _TERMS:
        df, cf, _ = stats[term]
        assert float(np.float32((df + 1.0) / (n + 1.0))) != 1.0
        assert float(np.float32((cf + 1.0) / (n + 1.0))) != 1.0
