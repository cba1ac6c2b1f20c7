"""ICU Normalizer2 engine + utr30 folding tests.

The engine (decompose → canonical reorder → compose, algorithmic
Hangul) is validated with ZERO Unicode-version skew by rebuilding
gennorm2-style NFC/NFKC tables from CPython's own unicodedata and
requiring equality with unicodedata.normalize over every code point
and randomized combining sequences. The utr30 instantiation is pinned
by the reference's TestICUFoldingFilter vectors and the frozen fold
fixture.
"""

import random
import unicodedata

import pandas as pd
import pytest

from lucene_solr_spark.analysis.icunorm import (
    Gennorm2, icu_fold, nfkc_cf_analog, utr30_normalizer,
)

_MAX_CP = 0x323B0  # past CJK Compat Ideographs Supplement


def _tables_from_unicodedata(compat: bool):
    ccc = {}
    mappings = {}
    for cp in range(0x110000):
        ch = chr(cp)
        c = unicodedata.combining(ch)
        if c:
            ccc[cp] = c
        d = unicodedata.decomposition(ch)
        if not d:
            continue
        if d.startswith("<"):
            if not compat:
                continue
            seq = tuple(int(t, 16) for t in d.split(">", 1)[1].split())
            mappings[cp] = (seq, False)
        else:
            seq = tuple(int(t, 16) for t in d.split())
            # composition-excluded (incl. singletons) iff NFC(NFD(ch)) != ch
            two = (len(seq) == 2 and unicodedata.normalize(
                "NFC", unicodedata.normalize("NFD", ch)) == ch)
            mappings[cp] = (seq, two)
    return ccc, mappings


@pytest.fixture(scope="module")
def nfc_engine():
    return Gennorm2(*_tables_from_unicodedata(compat=False))


@pytest.fixture(scope="module")
def nfkc_engine():
    return Gennorm2(*_tables_from_unicodedata(compat=True))


def test_engine_matches_nfc_every_codepoint(nfc_engine):
    bad = []
    for cp in range(_MAX_CP):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        s = chr(cp)
        if nfc_engine.normalize(s) != unicodedata.normalize("NFC", s):
            bad.append(hex(cp))
    assert not bad, bad[:20]


def test_engine_matches_nfkc_every_codepoint(nfkc_engine):
    bad = []
    for cp in range(_MAX_CP):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        s = chr(cp)
        if nfkc_engine.normalize(s) != unicodedata.normalize("NFKC", s):
            bad.append(hex(cp))
    assert not bad, bad[:20]


def test_engine_matches_nfc_random_sequences(nfc_engine, nfkc_engine):
    rng = random.Random(20260819)
    marks = [cp for cp in range(0x3000)
             if unicodedata.combining(chr(cp))]
    bases = [ord(c) for c in "aesonzAEOU"] + [0x3B1, 0x438, 0x5D0, 0x928,
                                              0x1100, 0x1161, 0xAC00]
    for _ in range(4000):
        cps = [rng.choice(bases)]
        for _ in range(rng.randrange(0, 5)):
            cps.append(rng.choice(marks) if rng.random() < 0.8
                       else rng.choice(bases))
        s = "".join(map(chr, cps))
        assert nfc_engine.normalize(s) == unicodedata.normalize("NFC", s)
        assert nfkc_engine.normalize(s) == unicodedata.normalize("NFKC", s)


def test_engine_hangul_roundtrip(nfc_engine):
    # decomposed jamo recompose algorithmically; LV + T composes
    assert nfc_engine.normalize("각") == "각"
    assert nfc_engine.normalize("각") == "각"
    assert nfc_engine.normalize("각") == "각"


# ----------------------------------------------------------- utr30 fold

JUNIT = [
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


@pytest.mark.parametrize("text,expect", JUNIT)
def test_junit_folding_vectors(text, expect):
    assert [icu_fold(t) for t in text.split(" ")] == expect


def test_fold_idempotent():
    rng = random.Random(99)
    for _ in range(2000):
        s = "".join(chr(rng.randrange(0x20, 0x3000)) for _ in range(8))
        once = icu_fold(s)
        assert icu_fold(once) == once


def test_fold_keeps_hangul_composed():
    assert icu_fold("한국어") == "한국어"


def test_frozen_fold_fixture_replays():
    import os
    fix = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "lucene_solr_spark",
        "fixtures_data", "icu_folds.parquet")
    df = pd.read_parquet(fix)
    assert len(df) > 3000
    for r in df.itertuples():
        assert icu_fold(r.word) == r.folded


def test_nfkc_cf_analog_basics():
    assert nfkc_cf_analog("ＡＢＣ Ruß") == "abc russ"


def test_fold_udf(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.icunorm import icu_fold_udf

    words = ["résumé", "ΜΆΪΟΣ", "৭০৬", "ELİF", "한국어"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    out = df.select("word", icu_fold_udf(F.col("word")).alias("f")).collect()
    for row in out:
        assert row.f == icu_fold(row.word)
