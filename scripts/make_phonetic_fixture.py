"""Generate the Soundex code-map fixture parquet.

Writes lucene_solr_spark/fixtures_data/soundex_codes.parquet with one
row (term, code) for every distinct ALPHABETIC simple-analyzer token
across all /root/testdata/sf*/documents.parquet corpora, encoded by
the pure-Python Soundex (analysis/phonetic.py — golden-tested against
the published examples and asserted equal to Spark's F.soundex over
this same vocabulary by tests/test_filters.py).

Both engines then read the SAME at-rest map: the Spark gate encodes
live with the JVM built-in, the DuckDB oracle joins the fixture — the
Porter-fixture pattern (the oracle engine has no soundex, and RE2
cannot express the duplicate-collapse rule).

Usage: python scripts/make_phonetic_fixture.py [testdata_root]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from lucene_solr_spark.analysis.phonetic import soundex

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark",
    "fixtures_data",
    "soundex_codes.parquet",
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
    terms = [t for t in terms if t.isalpha()]
    pdf = pd.DataFrame({"term": terms, "code": [soundex(t) for t in terms]})
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pdf.to_parquet(OUT, index=False)
    print(f"wrote {len(pdf)} (term, code) rows from {len(paths)} corpora -> {OUT}")


if __name__ == "__main__":
    main()
