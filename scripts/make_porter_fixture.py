"""Generate the Porter stem-map fixture parquet.

Writes lucene_solr_spark/fixtures_data/porter_stems.parquet with one row
(term, stem) for every distinct simple-analyzer token across all
/root/testdata/sf*/documents.parquet corpora, stemmed by the
paper-golden Python implementation (analysis/porter.py — golden-tested
against the examples in Porter 1980 by tests/test_porter.py).

Both engines then read the SAME at-rest map: the Spark gate still stems
live (porter_stem_filter pandas UDF), while the DuckDB oracle joins the
fixture — so the driver hash verifies the distributed pipeline
(tokenize → stem → explode → agg → top-k) against an independently
materialized statement of the stemmer's input→output contract.

Usage: python scripts/make_porter_fixture.py [testdata_root]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from lucene_solr_spark.analysis.porter import porter_stem

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark",
    "fixtures_data",
    "porter_stems.parquet",
)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata"
    paths = sorted(glob.glob(f"{root}/sf*/documents.parquet"))
    if not paths:
        raise SystemExit(f"no documents.parquet under {root}")
    con = duckdb.connect()
    terms = con.execute(
        "SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))"
        f" AS term FROM read_parquet({paths!r}) ORDER BY term"
    ).df()["term"].tolist()
    pdf = pd.DataFrame({"term": terms, "stem": [porter_stem(t) for t in terms]})
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {len(pdf)} (term, stem) rows from {len(paths)} corpora -> {OUT}")


if __name__ == "__main__":
    main()
