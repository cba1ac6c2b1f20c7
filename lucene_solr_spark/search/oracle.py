"""Pure-Python/pandas exhaustive BM25 oracle (no Spark, no pruning).

The CheckHits-style reference scorer (SURVEY.md §5: reference
test-framework/.../search/CheckHits.java:576-591 pattern): score every
document for every query with the exact float pipeline from
functions/bm25.py, take top-k with the HitQueue tie-break
(score desc, then doc_id asc — search/HitQueue.java:75-81).

Golden fixtures (tests/golden/golden_topk.json) are frozen from this
module; the Spark engine (brute-force path AND block-max WAND path) must
reproduce docIDs and float32 scores bit-for-bit.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from typing import Dict, List, Sequence

import numpy as np
import pandas as pd

from ..analysis.tokenizer import tokenize
from ..functions import bm25
from ..functions.smallfloat import int_to_byte4

__all__ = ["OracleIndex", "build_oracle_index", "oracle_topk"]


@dataclass
class OracleIndex:
    doc_count: int                      # docs with >= 1 token (field present)
    sum_total_term_freq: int
    postings: Dict[str, "np.ndarray"]   # term -> array[(doc_id, freq)] sorted
    norm_bytes: np.ndarray              # per doc_id, 0..255
    df: Dict[str, int] = field(default_factory=dict)


def build_oracle_index(texts: Sequence[str]) -> OracleIndex:
    """texts in canonical doc_id order → in-memory inverted index."""
    postings: Dict[str, list] = {}
    lengths = np.zeros(len(texts), dtype=np.int64)
    doc_count = 0
    for doc_id, text in enumerate(texts):
        toks = tokenize(text if text is not None else "")
        lengths[doc_id] = len(toks)
        if toks:
            doc_count += 1
        for term, freq in Counter(toks).items():
            postings.setdefault(term, []).append((doc_id, freq))
    arr_postings = {
        t: np.asarray(pl, dtype=np.int64) for t, pl in postings.items()
    }
    return OracleIndex(
        doc_count=doc_count,
        sum_total_term_freq=int(lengths.sum()),
        postings=arr_postings,
        norm_bytes=int_to_byte4(lengths),
        df={t: len(pl) for t, pl in arr_postings.items()},
    )


def oracle_topk(
    index: OracleIndex,
    terms: Sequence[str],
    mode: str = "disjunctive",
    k: int = 10,
    boost: float = 1.0,
    k1=bm25.K1,
    b=bm25.B,
) -> pd.DataFrame:
    """Exhaustive BM25 top-k → DataFrame(rank, doc_id, score:float32).

    disjunctive = pure SHOULD (docs matching any term, scores summed);
    conjunctive = all terms MUST match (posting intersection, scores
    summed). Absent terms contribute nothing (disjunctive) / empty result
    (conjunctive) — matching BooleanQuery semantics.
    """
    if index.doc_count == 0:
        return pd.DataFrame(columns=["rank", "doc_id", "score"])
    avgdl = bm25.avgdl(index.sum_total_term_freq, index.doc_count)
    cache = bm25.norm_cache(avgdl, np.float32(k1), np.float32(b))

    acc = np.zeros(len(index.norm_bytes), dtype=np.float64)  # double accumulator
    matched = np.zeros(len(index.norm_bytes), dtype=np.int64)
    n_present = 0
    for term in terms:
        pl = index.postings.get(term)
        if pl is None or len(pl) == 0:
            if mode == "conjunctive":
                return pd.DataFrame(columns=["rank", "doc_id", "score"])
            continue
        n_present += 1
        weight = (np.float32(boost) * bm25.idf(index.df[term], index.doc_count)).astype(
            np.float32
        )
        doc_ids, freqs = pl[:, 0], pl[:, 1]
        s = bm25.score_term(freqs, index.norm_bytes[doc_ids], weight, cache)
        acc[doc_ids] += s.astype(np.float64)
        matched[doc_ids] += 1
    if n_present == 0:
        return pd.DataFrame(columns=["rank", "doc_id", "score"])

    if mode == "conjunctive":
        hit = matched == n_present
    else:
        hit = matched > 0
    doc_ids = np.nonzero(hit)[0]
    scores = acc[doc_ids].astype(np.float32)  # (float) cast of the double sum
    # HitQueue tie-break: score desc, doc_id asc
    order = np.lexsort((doc_ids, -scores.astype(np.float64)))[:k]
    out = pd.DataFrame(
        {
            "rank": np.arange(len(order)),
            "doc_id": doc_ids[order].astype(np.int64),
            "score": scores[order],
        }
    )
    return out
