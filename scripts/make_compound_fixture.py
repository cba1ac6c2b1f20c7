"""Freeze the compound-decompounding fixtures for the driver gate.

1. Parse the Danish TeX hyphenation pattern XML shipped with the
   reference tests (lucene/analysis/common/src/test/.../compound/
   da_UTF8.xml — Apache FOP/OFFO data) into
   fixtures_data/hyphenation_da.json (data, not code — the
   snowball_tables.json provenance class).
2. Replay every COMPOUND_CASES configuration over a deterministic
   vocabulary (the JUnit-vector words plus generated compounds over
   the case dictionaries) and freeze (case, input_s, output_s) to
   fixtures_data/compound_filters.parquet. The fts_decompound gate
   runs the LIVE decompounders over the frozen inputs on Spark and
   compares against these frozen outputs on DuckDB.

Usage: python scripts/make_compound_fixture.py
"""

import json
import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

REF_XML = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
           "lucene/analysis/compound/da_UTF8.xml")
FIX_DIR = os.path.join(HERE, "lucene_solr_spark", "fixtures_data")
SEP = "\x1f"


def main():
    from lucene_solr_spark.analysis.compound import (
        parse_hyphenation_xml,
    )

    with open(REF_XML, encoding="utf-8") as f:
        pats = parse_hyphenation_xml(f.read())
    out_json = os.path.join(FIX_DIR, "hyphenation_da.json")
    with open(out_json, "w", encoding="utf-8") as f:
        json.dump(pats, f, ensure_ascii=False, sort_keys=True)
    print(f"patterns: {len(pats['patterns'])} patterns, "
          f"{len(pats['classes'])} class chars -> {out_json}")

    # reload through the fixture path so the frozen table is what runs
    from lucene_solr_spark.analysis import compound as comp
    comp._DA_PATS[0] = None

    rng = random.Random(20260819)
    base_inputs = [
        ["min", "veninde", "som", "er", "lidt", "af", "en", "læsehest"],
        ["basketballkurv"],
        ["Bildörr", "Bilmotor", "Biltak", "Slagborr", "Hammarborr",
         "Pelarborr", "Glasögonfodral", "Basfiolsfodral",
         "Basfiolsfodralmakaregesäll", "Skomakare", "Vindrutetorkare",
         "Vindrutetorkarblad", "abba"],
        ["abcdef", "abcdefg"],
        ["læsehestkurv", "hestlæse", "kurvbasket"],
    ]
    # generated compounds over the dictionaries + random danish-ish text
    se_parts = ["bil", "dörr", "motor", "tak", "borr", "slag", "glas",
                "ögon", "fodral", "bas", "fiol", "makare", "sko", "vind",
                "rute", "blad", "xy", "zq"]
    da_parts = ["læse", "hest", "basket", "ball", "kurv", "bog", "hus",
                "vand", "mølle"]
    for _ in range(300):
        parts = rng.choice((se_parts, da_parts))
        n_words = rng.randrange(1, 4)
        words = []
        for _ in range(n_words):
            k = rng.randrange(1, 4)
            w = "".join(rng.choice(parts) for _ in range(k))
            if rng.random() < 0.3:
                w = w + "s"
            if rng.random() < 0.2:
                w = w.capitalize()
            words.append(w)
        base_inputs.append(words)

    from lucene_solr_spark.analysis.compound import COMPOUND_CASES
    rows = []
    for name, fn in sorted(COMPOUND_CASES.items()):
        for toks in base_inputs:
            rows.append((name, SEP.join(toks), SEP.join(fn(list(toks)))))
    df = pd.DataFrame(rows, columns=["case", "input_s", "output_s"])
    df = df.drop_duplicates(["case", "input_s"])
    out_pq = os.path.join(FIX_DIR, "compound_filters.parquet")
    df.to_parquet(out_pq, index=False)
    print(f"froze {len(df)} decompound vectors -> {out_pq}")


if __name__ == "__main__":
    main()
