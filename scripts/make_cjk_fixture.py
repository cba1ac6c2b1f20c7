"""Generate the CJK segmentation golden fixture parquet.

Writes lucene_solr_spark/fixtures_data/cjk_segments.parquet with one
row (phrase_id, n_tokens, tokens_s) per pinned CJK_PHRASES entry,
segmented by the paper-contract Python implementation
(analysis/cjk.py segment_cjk — dictionary longest-match with per-char
fallback, the kuromoji/nori analog). The Spark gate segments LIVE via
the Arrow UDF while the DuckDB oracle joins this fixture — the Porter
fixture pattern: the driver hash verifies the distributed pipeline
against an independently materialized statement of the segmenter's
input→output contract.

Usage: python scripts/make_cjk_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from lucene_solr_spark.analysis.cjk import CJK_PHRASES, segment_cjk

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark",
    "fixtures_data",
    "cjk_segments.parquet",
)


def main():
    rows = []
    for i, phrase in enumerate(CJK_PHRASES):
        toks = segment_cjk(phrase)
        rows.append(
            {"phrase_id": i, "n_tokens": len(toks),
             "tokens_s": "|".join(toks)}
        )
    pd.DataFrame(rows).to_parquet(OUT, index=False)
    print(f"wrote {len(rows)} phrase segmentations -> {OUT}")


if __name__ == "__main__":
    main()
