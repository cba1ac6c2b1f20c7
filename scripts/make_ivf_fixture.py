"""Generate the trained-IVF centroid fixture parquet.

Writes lucene_solr_spark/fixtures_data/ivf_centroids.parquet with one
row (n_vecs, key0, centroid_id, centroid, exact_norm) per trained
centroid per /root/testdata/sf*/embeddings.parquet corpus, where the
centroids are the PRODUCTION k-means output of
operators/similarity.train_ivf_centroids (spherical Lloyd over a
deterministic h60-ordered sample — the default `centroids="trained"`
source of build_ivf_index).

Freezing the trained centroids lets the DuckDB oracle join the SAME
at-rest centroid table the Spark gate builds its index from, so the
driver hash verifies the production coarse-quantizer path end-to-end
(assignment argmax, probe selection, partition-pruned rerank) instead
of the SQL-only `first_k` stand-in. The corpus key is
(n_vecs, key0 = floor(first component of vec_id 0 as double * 1e9)) —
distinct testdata corpora share row counts (sf0.001 and sf0.01 both
hold 500 vectors) but never the same leading component.

Same pattern as make_porter_fixture.py (fixture = independently
materialized statement of a trained/derived artifact's contract).

Usage: python scripts/make_ivf_fixture.py [testdata_root]
"""

import glob
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

N_CENTROIDS = 8

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark",
    "fixtures_data",
    "ivf_centroids.parquet",
)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata"
    paths = sorted(glob.glob(f"{root}/sf*/embeddings.parquet"))
    if not paths:
        raise SystemExit(f"no embeddings.parquet under {root}")

    from lucene_solr_spark.operators.similarity import train_ivf_centroids
    from lucene_solr_spark.session import get_spark

    spark = get_spark(
        cores=8,
        shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": "8g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    frames = []
    for p in paths:
        emb = spark.read.parquet(p)
        n_vecs = emb.count()
        v0 = emb.filter("vec_id = 0").select("embedding").first()[0]
        key0 = int(math.floor(float(v0[0]) * 1e9))
        cents = train_ivf_centroids(emb, n_centroids=N_CENTROIDS)
        frames.append(
            pd.DataFrame(
                {
                    "n_vecs": n_vecs,
                    "key0": key0,
                    "centroid_id": [c for c, _, _ in cents],
                    "centroid": [list(map(float, v)) for _, v, _ in cents],
                    "exact_norm": [n for _, _, n in cents],
                }
            )
        )
        print(f"{p}: n_vecs={n_vecs} key0={key0} -> {len(cents)} centroids")
    pdf = pd.concat(frames, ignore_index=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {len(pdf)} centroid rows from {len(paths)} corpora -> {OUT}")


if __name__ == "__main__":
    main()
