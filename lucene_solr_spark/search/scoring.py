"""Shared query-time scoring setup: per-term weights + norm cache.

Mirrors Lucene's Weight construction, which captures collection/term
stats once per query (reference: search/TermQuery.java:73 —
``similarity.scorer(boost, collectionStats, termStats)``). The float32
weight (boost * idf) and the 256-float32 norm cache are computed
driver-side in numpy (exact cast points, functions/bm25.py) and shipped
as broadcast-join tables — tiny, immutable, JVM-joinable.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from ..functions import bm25, smallfloat

__all__ = ["term_weights", "score_components", "double_norm_cache"]


def double_norm_cache(sum_ttf: int, doc_count: int, k1, b) -> np.ndarray:
    """256-entry DOUBLE-precision norm cache ``k1*(1-b+b*qdl/avgdl)``
    over SmallFloat-quantized lengths — the ANSI-SQL-reproducible twin
    of bm25.norm_cache (single definition: every double-path scorer
    indexes this array by norm byte)."""
    qdl = smallfloat.byte4_to_int(np.arange(256)).astype(np.float64)
    avgdl = np.float64(sum_ttf) / np.float64(max(doc_count, 1))
    return float(k1) * (1.0 - float(b) + float(b) * qdl / avgdl)


def term_weights(
    df_by_term: dict,
    doc_count: int,
    terms: Sequence[str],
    boost: float,
    k1,
    b,
    precision: str = "float32",
) -> list:
    """[(term, weight)] for terms present in the dictionary, in query
    order (duplicate clauses keep duplicate weights — BooleanQuery sums
    duplicate SHOULD clauses twice). precision="double" keeps the full
    double idf (SQL-oracle-reproducible); "float32" applies Lucene's
    float cast points. ``boost`` may be a single float or a per-term
    dict (BoostQuery per clause — reference search/BoostQuery.java)."""
    out = []
    for t in terms:
        df = df_by_term.get(t)
        if df:
            bst = boost.get(t, 1.0) if isinstance(boost, dict) else boost
            if precision == "double":
                w = float(bst) * float(
                    np.log(1.0 + (np.float64(doc_count) - df + 0.5) / (df + 0.5))
                )
                out.append((t, w))
            else:
                w = np.float32(bst) * bm25.idf(df, doc_count)
                out.append((t, float(np.float32(w))))
    return out


def score_components(
    spark: SparkSession,
    tables,
    terms: Sequence[str],
    boost: float,
    k1,
    b,
    precision: str = "float32",
    with_present: bool = False,
):
    """→ (weights_df(term, weight), cache_df(norm_byte, norm_val),
    n_present[, present_terms]). One tiny dictionary lookup job;
    everything else lazy. ``with_present=True`` appends the set of
    terms found in the dictionary (already collected — no extra job).

    precision="float32": Lucene-exact (float32 weight, float32 norm cache
    over quantized lengths). precision="double": same quantized lengths
    but full double math — ``k1 * (1 - b + b*qdl/avgdl)`` with
    ``avgdl = sum_ttf/doc_count`` in double, reproducible in ANSI SQL.
    """
    uniq = list(dict.fromkeys(terms))
    rows = (
        tables.dictionary.filter(tables.dictionary.term.isin(uniq))
        .select("term", "df")
        .collect()
    )
    df_by_term = {r["term"]: int(r["df"]) for r in rows}
    weights = term_weights(
        df_by_term, tables.doc_count, terms, boost, k1, b, precision
    )

    if precision == "double":
        cache = double_norm_cache(
            tables.sum_total_term_freq, tables.doc_count, k1, b
        )
        num_type = "double"
    else:
        avgdl32 = bm25.avgdl(tables.sum_total_term_freq, max(tables.doc_count, 1))
        cache = bm25.norm_cache(avgdl32, np.float32(k1), np.float32(b))
        num_type = "float"
    cache_rows = [(i, float(cache[i])) for i in range(256)]

    weights_df = spark.createDataFrame(weights, f"term string, weight {num_type}")
    cache_df = spark.createDataFrame(
        cache_rows, f"norm_byte int, norm_val {num_type}"
    )
    if with_present:
        return weights_df, cache_df, len(weights), {t for t, _ in weights}
    return weights_df, cache_df, len(weights)
