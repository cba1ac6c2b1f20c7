"""Generate the light-stemmer golden fixture parquet.

Writes lucene_solr_spark/fixtures_data/light_stems.parquet with rows
(lang, term, stem): a deterministic every-Nth sample of the reference
implementation's published test vocabularies (Savoy's UniNE/CLEF reference
data, shipped by the reference repo as
lucene/analysis/common/src/test/.../{de,es,fr,ru,it,sv,pt,hu,fi}/*lighttestdata.zip —
word<TAB>stem pairs produced by the ORIGINAL algorithm authors'
implementation), plus the English-minimal vectors from
TestEnglishMinimalStemFilter.java.

The repo's own stemmers (analysis/lightstem.py) were verified against
the FULL vocabularies (35,033 de + 28,377 es + 20,403 fr pairs, zero
mismatches) before sampling; tests/test_lightstem.py re-verifies the
sampled fixture on every run, and the driver gate stems the fixture's
terms LIVE in the Arrow UDF while the DuckDB oracle reads the frozen
stems — the Porter/CJK fixture pattern.

Usage: python scripts/make_lightstem_fixture.py
"""

import os
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

REF = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark",
    "fixtures_data",
    "light_stems.parquet",
)
STRIDE = 80  # every-Nth pair per language — deterministic sample

EN_MINIMAL = [  # TestEnglishMinimalStemFilter.java:54-62
    ("queries", "query"), ("phrases", "phrase"), ("corpus", "corpus"),
    ("stress", "stress"), ("kings", "king"), ("panels", "panel"),
    ("aerodynamics", "aerodynamic"), ("congress", "congress"),
    ("serious", "serious"),
]


def pairs(zpath: str, txt: str):
    with zipfile.ZipFile(zpath) as z:
        lines = z.read(txt).decode("utf-8").splitlines()
    for ln in lines:
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        parts = ln.split("\t") if "\t" in ln else ln.split()
        if len(parts) == 2:
            yield parts[0], parts[1]


def voc_output_pairs(zpath: str, prefix: str = ""):
    """porterTestData-style zips: parallel voc.txt / output.txt."""
    with zipfile.ZipFile(zpath) as z:
        voc = z.read(f"{prefix}voc.txt").decode("utf-8").splitlines()
        out = z.read(f"{prefix}output.txt").decode("utf-8").splitlines()
    for w, s in zip(voc, out):
        w, s = w.strip(), s.strip()
        if w:
            yield w, s


def _add_lang(rows, STEMMERS, lang, zpath, txt):
    all_pairs = list(pairs(zpath, txt))
    fn = STEMMERS[lang]
    bad = [(w, want, fn(w)) for w, want in all_pairs if fn(w) != want]
    assert not bad, f"{lang}: {len(bad)} mismatches, e.g. {bad[:3]}"
    sample = all_pairs[::STRIDE]
    rows.extend({"lang": lang, "term": w, "stem": s} for w, s in sample)
    print(f"{lang}: verified {len(all_pairs)} pairs, sampled {len(sample)}")


def main():
    from lucene_solr_spark.analysis.lightstem import STEMMERS

    rows = []
    for lang, zf, txt in (
        ("de", "de/delighttestdata.zip", "delight.txt"),
        ("es", "es/eslighttestdata.zip", "eslight.txt"),
        ("fr", "fr/frlighttestdata.zip", "frlight.txt"),
        ("ru", "ru/rulighttestdata.zip", "rulight.txt"),
        ("it", "it/itlighttestdata.zip", "itlight.txt"),
        ("sv", "sv/svlighttestdata.zip", "svlight.txt"),
        ("pt", "pt/ptlighttestdata.zip", "ptlight.txt"),
        ("hu", "hu/hulighttestdata.zip", "hulight.txt"),
        ("fi", "fi/filighttestdata.zip", "filight.txt"),
        ("de_minimal", "de/deminimaltestdata.zip", "deminimal.txt"),
        ("fr_minimal", "fr/frminimaltestdata.zip", "frminimal.txt"),
        ("pt_rslp", "pt/ptrslptestdata.zip", "ptrslp.txt"),
        ("pt_rslp_minimal", "pt/ptminimaltestdata.zip", "ptminimal.txt"),
        ("gl_rslp", "gl/gltestdata.zip", "gl.txt"),
        ("ckb", "ckb/ckbtestdata.zip", "testdata.txt"),
    ):
        _add_lang(rows, STEMMERS, lang, f"{REF}/{zf}", txt)
    # Porter: the reference's full published vocabulary ships as
    # parallel voc/output files (en/porterTestData.zip)
    from lucene_solr_spark.analysis.porter import porter_stem

    all_pairs = list(voc_output_pairs(f"{REF}/en/porterTestData.zip"))
    bad = [(w, want, porter_stem(w)) for w, want in all_pairs
           if porter_stem(w) != want]
    assert not bad, f"en_porter: {len(bad)} mismatches, e.g. {bad[:3]}"
    sample = all_pairs[::STRIDE]
    rows.extend(
        {"lang": "en_porter", "term": w, "stem": s} for w, s in sample
    )
    print(f"en_porter: verified {len(all_pairs)} pairs, "
          f"sampled {len(sample)}")
    # Snowball English (Porter2): TestSnowballVocabData.zip english/*
    from lucene_solr_spark.analysis.porter2 import porter2_stem

    sb = list(voc_output_pairs(
        f"{REF}/snowball/TestSnowballVocabData.zip", "english/"))
    bad = [(w, want, porter2_stem(w)) for w, want in sb
           if porter2_stem(w) != want]
    assert not bad, f"en_porter2: {len(bad)} mismatches, e.g. {bad[:3]}"
    sample = sb[::STRIDE]
    rows.extend(
        {"lang": "en_porter2", "term": w, "stem": s} for w, s in sample
    )
    print(f"en_porter2: verified {len(sb)} pairs, sampled {len(sample)}")
    for lang, sb_dir in (
        ("da_snowball", "danish"), ("no_snowball", "norwegian"),
        ("sv_snowball", "swedish"), ("de_snowball", "german"),
        ("ru_snowball", "russian"), ("es_snowball", "spanish"),
        ("it_snowball", "italian"), ("pt_snowball", "portuguese"),
        ("fr_snowball", "french"), ("nl_snowball", "dutch"),
        ("ro_snowball", "romanian"), ("hu_snowball", "hungarian"),
        ("de_snowball2", "german2"), ("fi_snowball", "finnish"), ("en_snowball_porter", "porter"), ("en_lovins", "lovins"),
        ("ar_snowball", "arabic"),
        ("tr_snowball", "turkish"),
        ("nl_kp", "kraaij_pohlmann"),
    ):
        sb = list(voc_output_pairs(
            f"{REF}/snowball/TestSnowballVocabData.zip", f"{sb_dir}/"))
        fn = STEMMERS[lang]
        bad = [(w, want, fn(w)) for w, want in sb if fn(w) != want]
        assert not bad, f"{lang}: {len(bad)} mismatches, e.g. {bad[:3]}"
        sample = sb[::STRIDE]
        rows.extend(
            {"lang": lang, "term": w, "stem": st} for w, st in sample
        )
        print(f"{lang}: verified {len(sb)} pairs, sampled {len(sample)}")
    # Norwegian light/minimal: plain-text pair files (no/*.txt)
    for lang, txt in (
        ("nb_light", "no/nb_light.txt"), ("nn_light", "no/nn_light.txt"),
        ("nb_minimal", "no/nb_minimal.txt"),
        ("nn_minimal", "no/nn_minimal.txt"),
    ):
        fn = STEMMERS[lang]
        all_pairs = []
        with open(f"{REF}/{txt}", encoding="utf-8") as f:
            for ln in f:
                ln = ln.strip()
                if ln and not ln.startswith("#"):
                    w, st = ln.split("\t")
                    all_pairs.append((w, st))
        bad = [(w, want, fn(w)) for w, want in all_pairs if fn(w) != want]
        assert not bad, f"{lang}: {len(bad)} mismatches, e.g. {bad[:3]}"
        rows.extend(
            {"lang": lang, "term": w, "stem": st} for w, st in all_pairs
        )
        print(f"{lang}: verified {len(all_pairs)} pairs, kept all")
    # Per-language stemmers/normalizers verified against the
    # reference's own JUnit pair sets (check/checkOneTerm/
    # assertAnalyzesTo single-token asserts, extracted mechanically)
    import re

    TEST = REF  # test tree root

    def junit_pairs(path, var=None):
        src = open(path, encoding="utf-8").read()
        pat = (r'(?:check|checkOneTerm)\(\s*(?:(\w+)\s*,\s*)?'
               r'"([^"]*)"\s*,\s*"([^"]*)"\s*\)'
               r'|assertAnalyzesTo\(\s*(\w+)\s*,\s*"([^"]*)"\s*,\s*'
               r'new String\[\]\s*\{\s*"([^"]*)"\s*\}\s*\)')
        out = []
        for m in re.finditer(pat, src):
            if m.group(2) is not None:
                v, w, st = m.group(1), m.group(2), m.group(3)
            else:
                v, w, st = m.group(4), m.group(5), m.group(6)
            if var is None or v == var:
                # decode Java \\uXXXX escapes; the reference test
                # tokenizes on whitespace first
                w = re.sub(r"\\u([0-9a-fA-F]{4})",
                           lambda m: chr(int(m.group(1), 16)), w)
                st = re.sub(r"\\u([0-9a-fA-F]{4})",
                            lambda m: chr(int(m.group(1), 16)), st)
                out.append((w.strip(), st.strip()))
        return out

    for lang, path, var in (
        # cs/bg pairs run through the full analyzer in the reference
        # test, which lowercases first — fold the input here
        ("cs", "cz/TestCzechStemmer.java", "LOWER"),
        ("bg", "bg/TestBulgarianStemmer.java", "LOWER"),
        ("lv", "lv/TestLatvianStemmer.java", None),
        ("hi", "hi/TestHindiStemmer.java", None),
        ("hi_norm", "hi/TestHindiNormalizer.java", None),
        ("bn", "bn/TestBengaliStemmer.java", None),
        ("bn_norm", "bn/TestBengaliNormalizer.java", None),
        ("ar_light", "ar/TestArabicStemFilter.java", None),
        ("ar_norm", "ar/TestArabicNormalizationFilter.java", None),
        ("fa_norm", "fa/TestPersianNormalizationFilter.java", None),
        ("sr_norm", "sr/TestSerbianNormalizationFilter.java", None),
        ("ga_lower", "ga/TestIrishLowerCaseFilter.java", None),
        ("id", "id/TestIndonesianStemmer.java", "a"),
        ("id_inflectional", "id/TestIndonesianStemmer.java", "b"),
        # el pairs run through GreekAnalyzer = GreekLowerCaseFilter +
        # GreekStemFilter; the registered "el" composes both
        ("el", "el/TestGreekStemmer.java", None),
    ):
        lower = var == "LOWER"
        all_pairs = junit_pairs(f"{TEST}/{path}", None if lower else var)
        if lower:
            all_pairs = [(w.lower(), st) for w, st in all_pairs]
        assert all_pairs, f"{lang}: no pairs extracted from {path}"
        fn = STEMMERS[lang]
        bad = [(w, want, fn(w)) for w, want in all_pairs if fn(w) != want]
        assert not bad, f"{lang}: {len(bad)} mismatches, e.g. {bad[:5]}"
        rows.extend(
            {"lang": lang, "term": w, "stem": st} for w, st in all_pairs
        )
        print(f"{lang}: verified {len(all_pairs)} junit pairs, kept all")
    # TestIrishLowerCaseFilter.testIrishLowerCaseFilter:36-40
    fn = STEMMERS["ga_lower"]
    for w, want in (("nAthair", "n-athair"), ("tUISCE", "t-uisce"),
                    ("hARD", "hard")):
        assert fn(w) == want, (w, want, fn(w))
        rows.append({"lang": "ga_lower", "term": w, "stem": want})
    fn = STEMMERS["en_minimal"]
    for w, want in EN_MINIMAL:
        assert fn(w) == want, (w, want, fn(w))
        rows.append({"lang": "en_minimal", "term": w, "stem": want})
    pd.DataFrame(rows).to_parquet(OUT, index=False)
    print(f"wrote {len(rows)} rows -> {OUT}")


if __name__ == "__main__":
    main()
