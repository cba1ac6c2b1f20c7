"""Exact BM25 scoring math, numpy-vectorized with the reference's float
cast points replicated (the contract in SURVEY.md §7.0; reference:
lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java).

Cast-point fidelity is what makes rank-identity attainable:

- ``idf``: double math, cast to float32
  (BM25Similarity.java:69-72 — ``log(1 + (docCount - df + 0.5)/(df + 0.5))``).
- ``avgdl = sumTotalTermFreq / (double) docCount`` cast to float32 (:79-82).
- norm cache per byte: ``k1 * ((1-b) + b * LENGTH_TABLE[i] / avgdl)``
  computed in float32 (:186-191).
- ``score = weight * (float)(freq / (freq + (double) cache[normByte]))``
  with ``weight = boost * idf`` in float32 (:219-226).
  NOTE: no (k1+1) numerator.
- Multi-clause sums accumulate per-clause float scores in double, then
  cast to float (DisjunctionSumScorer / ConjunctionScorer pattern;
  idfExplain for phrases sums the same way, :172-181).

``docCount`` is the number of documents WITH the field (>= 1 token), not
maxDoc (:139-156).
"""

from __future__ import annotations

import numpy as np

from .smallfloat import LENGTH_TABLE

__all__ = ["idf", "avgdl", "norm_cache", "score_term", "sum_scores", "K1", "B"]

K1 = np.float32(1.2)
B = np.float32(0.75)


def idf(df, doc_count) -> np.ndarray:
    """float32 idf from int doc freq / collection doc count (double math)."""
    df = np.asarray(df, dtype=np.float64)
    dc = np.float64(doc_count)
    return np.log(1.0 + (dc - df + 0.5) / (df + 0.5)).astype(np.float32)


def avgdl(sum_total_term_freq: int, doc_count: int) -> np.float32:
    """Average field length: sumTotalTermFreq / docCount, cast to float32."""
    return np.float32(np.float64(sum_total_term_freq) / np.float64(doc_count))


def norm_cache(avgdl_f32: np.float32, k1: np.float32 = K1, b: np.float32 = B) -> np.ndarray:
    """cache[i] = k1 * ((1-b) + b * LENGTH_TABLE[i] / avgdl), float32[256]."""
    k1 = np.float32(k1)
    b = np.float32(b)
    one = np.float32(1.0)
    # float32 op order mirrors the Java expression left-to-right
    return (k1 * ((one - b) + (b * LENGTH_TABLE) / np.float32(avgdl_f32))).astype(
        np.float32
    )


def score_term(freq, norm_bytes, weight_f32, cache_f32) -> np.ndarray:
    """Per-posting BM25 term score (float32 array).

    freq: int/float array (raw term frequency); norm_bytes: int array
    0..255; weight_f32: scalar float32 (boost * idf); cache_f32: the 256
    float32 norm cache. ``freq/(freq+norm)`` runs in double, is cast to
    float32, then multiplied by the float32 weight.
    """
    freq = np.asarray(freq, dtype=np.float64)
    norm = cache_f32[np.asarray(norm_bytes, dtype=np.int64) & 0xFF].astype(np.float64)
    tf = (freq / (freq + norm)).astype(np.float32)
    return (np.float32(weight_f32) * tf).astype(np.float32)


def sum_scores(per_clause_f32: np.ndarray, axis=0) -> np.ndarray:
    """Sum per-clause float32 scores in double, cast back to float32
    (DisjunctionSumScorer/ConjunctionScorer accumulation pattern)."""
    return per_clause_f32.astype(np.float64).sum(axis=axis).astype(np.float32)
