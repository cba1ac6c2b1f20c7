"""Freeze golden top-k fixtures (FIXTURES.md §3).

Runs the pure-Python exhaustive BM25 oracle over the deterministic tiny
corpus for every reference query and writes
tests/golden/golden_topk.json. Run once; committed output is the contract
both Spark scorer paths must reproduce bit-for-bit (float32 scores are
stored via np.float32 → float repr, which round-trips exactly).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_spark import fixtures
from lucene_solr_spark.search.oracle import build_oracle_index, oracle_topk


def main():
    corpus = fixtures.make_transcripts(n_convs=fixtures.SCALES["tiny"])
    queries = fixtures.make_queries()
    index = build_oracle_index(corpus["text"].tolist())
    golden = {}
    for q in queries.itertuples():
        res = oracle_topk(index, list(q.terms), q.mode, q.k)
        golden[q.query_id] = {
            "mode": q.mode,
            "terms": list(q.terms),
            "k": int(q.k),
            "hits": [
                {"rank": int(r.rank), "doc_id": int(r.doc_id), "score": float(r.score)}
                for r in res.itertuples()
            ],
        }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "golden",
        "golden_topk.json",
    )
    with open(out, "w") as f:
        json.dump(
            {
                "corpus": {"scale": "tiny", "n_convs": fixtures.SCALES["tiny"],
                           "seed": fixtures.SEED, "n_docs": len(corpus)},
                "bm25": {"k1": 1.2, "b": 0.75},
                "queries": golden,
            },
            f,
            indent=1,
        )
    n_hits = sum(len(v["hits"]) for v in golden.values())
    print(f"wrote {out}: {len(golden)} queries, {n_hits} hits")


if __name__ == "__main__":
    main()
