"""Freeze the MinHashFilter fixture for the driver gate.

Semantics pinned by the reference JUnit vectors
(tests/test_minhashfilter.py, bit-exact murmur3_x64_128 + rehash +
bucketed min-sets); this script replays four (hashCount, bucketCount,
hashSetSize, withRotation) configurations over deterministic shingle
streams and freezes (case, input_s, output_s) — output terms
hex-encoded per UTF-16 code unit because the fingerprint strings are
degenerate (lone surrogates) and cannot ride Arrow/parquet raw.

Usage: python scripts/make_minhash_fixture.py
"""

import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

FIX_DIR = os.path.join(HERE, "lucene_solr_spark", "fixtures_data")
SEP = "\x1f"


def main():
    from lucene_solr_spark.analysis.minhashfilter import (
        min_hash_filter,
    )
    from lucene_solr_spark.analysis.minhashfilter import CONFIGS

    rng = random.Random(20260819)
    words = ["woof", "puff", "alpha", "beta", "gamma", "delta", "data",
             "spark", "index", "query", "shard", "merge", "lucene"]
    streams = [
        ["woof woof woof woof woof"],
        ["woof woof woof woof woof", "woof woof woof woof puff"],
        [],
    ]
    for _ in range(220):
        n_words = rng.randrange(5, 30)
        ws = [rng.choice(words) for _ in range(n_words)]
        k = rng.choice((3, 5))
        shingles = [" ".join(ws[i:i + k])
                    for i in range(max(1, len(ws) - k + 1))]
        streams.append(shingles)

    rows = []
    for name, (hc, bc, hss, rot) in sorted(CONFIGS.items()):
        for st in streams:
            out = min_hash_filter(st, hc, bc, hss, rot)
            enc = SEP.join(
                "".join("%04x" % ord(c) for c in t) for t in out)
            rows.append((name, SEP.join(st), enc))
    df = pd.DataFrame(rows, columns=["case", "input_s", "output_s"])
    df = df.drop_duplicates(["case", "input_s"])
    out_pq = os.path.join(FIX_DIR, "minhash_cases.parquet")
    df.to_parquet(out_pq, index=False)
    print("froze %d minhash vectors -> %s" % (len(df), out_pq))


if __name__ == "__main__":
    main()
