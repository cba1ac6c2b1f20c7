"""Freeze the TokenFilter-family vocabulary fixture for the driver gate.

The filter semantics are pinned by the reference JUnit vectors in
tests/test_morefilters.py; this script freezes a deterministic
vocabulary's outputs (fixtures_data/more_filters.parquet) so the
driver gate verifies the DISTRIBUTED pipeline (Arrow dispatcher over
Spark) reproduces the pinned contract — the cjk/porter pattern.

Usage: python scripts/make_morefilters_fixture.py
"""

import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

OUT = os.path.join(HERE, "lucene_solr_spark", "fixtures_data",
                   "more_filters.parquet")
SEP = "\x1f"


def main():
    from lucene_solr_spark.analysis.morefilters import MORE_FILTERS

    rng = random.Random(20260819)
    base_inputs = [
        ["l'embrouille", "O'brian", "M'enfin", "d'accord"],
        ["Türkiye'de", "2003'te", "İSTANBUL", "İZMİR", "ISPARTA"],
        ["räksmörgås", "blåbærsyltetøj", "raeksmoergaas", "aeäaeeea"],
        ["Ｔｅｓｔ", "１２３４", "ｶﾀｶﾅ", "ｳﾞｨｯﾂ", "ﾊﾟﾅｿﾆｯｸ"],
        ["١٢٣٤", "৭০৬", "abc123", "０９"],
        ["kiTTEN", "McKinley", "Hello thEre my Name is Ryan"],
        ["B", "A", "B", "E"],
        ["ecologi-", "cal", "devel-", "op", "compre-", "hensive-hands-on"],
        ["abcdefg", "straße", "ß", "xyz"],
    ]
    # deterministic mixed samples
    pools = ["åäöæøÅÄÖÆØaeoAEO", "ｱｲｳｴｵｶｷｸﾞﾊﾟ", "０１２abcABC",
             "iİıI'’-", "١٢٣৭০中文"]
    for _ in range(400):
        pool = rng.choice(pools)
        n = rng.randrange(1, 4)
        base_inputs.append([
            "".join(rng.choice(pool) for _ in range(rng.randrange(1, 9)))
            for _ in range(n)
        ])

    rows = []
    for name, fn in sorted(MORE_FILTERS.items()):
        for toks in base_inputs:
            rows.append((name, SEP.join(toks), SEP.join(fn(list(toks)))))
    df = pd.DataFrame(rows, columns=["filter", "input_s", "output_s"])
    df = df.drop_duplicates(["filter", "input_s"])
    df.to_parquet(OUT, index=False)
    print(f"froze {len(df)} filter vectors -> {OUT}")


if __name__ == "__main__":
    main()
