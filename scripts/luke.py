#!/usr/bin/env python
"""Index inspector — the Luke analog (reference lucene/luke: a GUI that
shows segments, per-field stats, top terms, and doc values; here a CLI
over the engine's segmented index tables).

Usage:
    python scripts/luke.py <index_dir> [--top 20]

Prints: manifest/segment summary, collection stats, top terms by df,
posting payload-size stats, and the document-length (norm) histogram.
Everything is computed with the same DataFrame ops a query would use —
the inspector is also a smoke test that an at-rest index is readable.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def inspect(index_dir: str, top: int = 20) -> dict:
    from pyspark.sql import functions as F

    from lucene_solr_spark.index.segments import read_segmented_index
    from lucene_solr_spark.session import get_spark

    spark = get_spark("lss_luke", cores=8, shuffle_partitions=8)
    idx = read_segmented_index(spark, index_dir)

    import glob

    out: dict = {
        "doc_count": idx.doc_count,
        "sum_total_term_freq": idx.sum_total_term_freq,
        "n_terms": idx.dictionary.count(),
        "n_segments": len(
            glob.glob(os.path.join(index_dir, "segments", "*", "manifest.json"))
        ),
    }
    out["top_terms"] = [
        (r.term, int(r.df), int(r.cf))
        for r in idx.dictionary.orderBy(F.desc("df"), F.asc("term"))
        .limit(top)
        .collect()
    ]
    sizes = idx.blocks.select(
        (F.length("docs") + F.length("freqs") + F.length("norms")).alias("b")
    ).agg(
        F.count("*").alias("blocks"),
        F.sum("b").alias("payload_bytes"),
        F.round(F.avg("b"), 1).alias("avg_block_bytes"),
    ).collect()[0]
    out["blocks"] = int(sizes.blocks or 0)
    out["payload_bytes"] = int(sizes.payload_bytes or 0)
    out["avg_block_bytes"] = float(sizes.avg_block_bytes or 0.0)
    out["dl_histogram"] = [
        (int(r.bucket), int(r.cnt))
        for r in idx.norms.groupBy(
            (F.floor(F.col("dl") / 10) * 10).cast("int").alias("bucket")
        )
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
        .collect()
    ]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()
    info = inspect(args.index_dir, args.top)
    print(f"docs={info['doc_count']}  tokens={info['sum_total_term_freq']}  "
          f"terms={info['n_terms']}  segments={info['n_segments']}")
    print(f"blocks={info['blocks']}  payload={info['payload_bytes']} B  "
          f"avg_block={info['avg_block_bytes']} B")
    print(f"{'term':<20}{'df':>10}{'cf':>12}")
    for t, df, cf in info["top_terms"]:
        print(f"{t:<20}{df:>10}{cf:>12}")
    print("doc-length histogram (bucket=10):")
    for b, c in info["dl_histogram"]:
        print(f"  {b:>5}-{b + 9:<5} {c}")


if __name__ == "__main__":
    main()
