"""Freeze the ICU utr30 gennorm2 source data + fold-vocabulary fixture.

1. Parse the reference's SHIPPED gennorm2 source files (lucene/
   analysis/icu/src/data/utr30/*.txt — the exact inputs its build
   compiles into utr30.nrm, in the build.xml gennorm2.src.files order)
   into fixtures_data/icu_utr30.parquet.

2. Sanity-gate the engine on every TestICUFoldingFilter JUnit vector
   (token-level expectations from the reference test suite).

3. Freeze a deterministic vocabulary of (word, folded) pairs as
   fixtures_data/icu_folds.parquet for the driver gate: Spark folds
   LIVE via the Arrow UDF, DuckDB joins the frozen outputs — verifying
   the distributed pipeline reproduces the pinned contract (the cjk/
   porter fixture pattern).

Usage: python scripts/make_icu_fixture.py
"""

import os
import random
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import pandas as pd

DATA = "/root/reference/lucene/analysis/icu/src/data/utr30"
# build.xml gennorm2.src.files order — later files override earlier
SRC_FILES = ["nfc.txt", "nfkc.txt", "nfkc_cf.txt", "BasicFoldings.txt",
             "DiacriticFolding.txt", "DingbatFolding.txt",
             "HanRadicalFolding.txt", "NativeDigitFolding.txt"]

FIX_DIR = os.path.join(HERE, "lucene_solr_spark", "fixtures_data")
TABLE_OUT = os.path.join(FIX_DIR, "icu_utr30.parquet")
FOLDS_OUT = os.path.join(FIX_DIR, "icu_folds.parquet")

# TestICUFoldingFilter.testDefaults — whitespace-tokenized, per-token
JUNIT_VECTORS = [
    ("This is a test", ["this", "is", "a", "test"]),
    ("Ruß", ["russ"]),
    ("ΜΆΪΟΣ", ["μαιοσ"]),
    ("Μάϊος", ["μαιοσ"]),
    ("𐐖", ["𐐾"]),
    ("ﴳﴺﰧ", ["طمطمطم"]),
    ("क्‍ष", ["कष"]),
    ("résumé", ["resume"]),
    ("résumé", ["resume"]),
    ("৭০৬", ["706"]),
    ("đis is cræzy", ["dis", "is", "craezy"]),
    ("ELİF", ["elif"]),
    ("eli̇f", ["elif"]),
]


def build_tables():
    from lucene_solr_spark.analysis.icunorm import parse_gennorm2_lines

    state = None
    for fn in SRC_FILES:
        with open(os.path.join(DATA, fn), encoding="utf-8") as f:
            state = parse_gennorm2_lines(f, state)
    ccc, mappings = state
    rows = []
    for cp, v in sorted(ccc.items()):
        rows.append((cp, "ccc", str(v), False))
    for cp, (seq, two) in sorted(mappings.items()):
        assert not (two and len(seq) != 2), (cp, seq)
        rows.append((cp, "map", " ".join("%04X" % c for c in seq), two))
    pd.DataFrame(rows, columns=["cp", "kind", "val", "twoway"]) \
        .to_parquet(TABLE_OUT, index=False)
    print(f"utr30 tables: {len(ccc)} ccc entries, {len(mappings)} mappings")


def verify_junit():
    from lucene_solr_spark.analysis.icunorm import icu_fold

    bad = 0
    for text, expect in JUNIT_VECTORS:
        got = [icu_fold(tok) for tok in text.split(" ")]
        if got != expect:
            bad += 1
            print("MISMATCH:", repr(text), "->", got, "expected", expect)
    print(f"JUnit vectors: {len(JUNIT_VECTORS)} checked, {bad} mismatches")
    return bad


def freeze_vocab():
    from lucene_solr_spark.analysis.icunorm import icu_fold, utr30_normalizer

    n = utr30_normalizer()
    rng = random.Random(20260819)
    vocab = set()
    # every JUnit token
    for text, _ in JUNIT_VECTORS:
        vocab.update(text.split(" "))
    # deterministic sample over mapped code points + combining stacks
    mapped = sorted(n.decomp)
    for cp in mapped[::7]:
        if 0xD800 <= cp <= 0xDFFF:
            continue
        vocab.add("x" + chr(cp) + "y")
    bases = list("aeozAEOZ") + ["م", "и", "α", "한", "か", "中"]
    marks = [chr(c) for c in sorted(n.ccc) if n.ccc[c] > 0][::11]
    for _ in range(1500):
        w = rng.choice(bases) + "".join(
            rng.choice(marks) for _ in range(rng.randrange(1, 4)))
        vocab.add(w)
    rows = [(w, icu_fold(w)) for w in sorted(vocab)]
    pd.DataFrame(rows, columns=["word", "folded"]).to_parquet(
        FOLDS_OUT, index=False)
    print(f"froze {len(rows)} fold pairs -> {FOLDS_OUT}")


def main():
    build_tables()
    if verify_junit():
        sys.exit("JUnit vector mismatches — NOT freezing fold fixture")
    freeze_vocab()


if __name__ == "__main__":
    main()
