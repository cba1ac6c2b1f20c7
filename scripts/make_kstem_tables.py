"""Extract the KStem dictionary tables into a frozen JSON fixture.

KStem (Krovetz 1993, "Viewing morphology as an inference process") is a
dictionary-driven stemmer: the algorithm consults a ~30k-entry English
head-word list plus small exception/conflation tables.  The reference
ships those tables as Java string arrays
(lucene/analysis/common/src/java/org/apache/lucene/analysis/en/
KStemData1..8.java — "created from head_word_list.txt" — and the
exceptionWords/directConflations/countryNationality/supplementDict/
properNouns arrays in KStemmer.java:74-220).  They are DATA, not code —
the same provenance class as the frozen Snowball test vocabularies —
so we extract them mechanically here; the algorithm itself is
implemented fresh in lucene_solr_spark/analysis/kstem.py.

Writes lucene_solr_spark/fixtures_data/kstem_tables.json.gz:
  {"exception_words": [...],        # in-dict words that block -e stripping
   "conflations": {word: root, ...} # directConflations + countryNationality
   "head_words": [...]}             # KStemData1..8 + supplementDict + properNouns

Usage: python scripts/make_kstem_tables.py
"""

import gzip
import json
import os
import re

REF_EN = ("/root/reference/lucene/analysis/common/src/java/org/apache/"
          "lucene/analysis/en")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark", "fixtures_data", "kstem_tables.json.gz")

_STR = re.compile(r'"([^"]*)"')


def _strings(java_src: str) -> list[str]:
    # strip // comments first so commented-out entries are not extracted
    src = re.sub(r"//[^\n]*", "", java_src)
    return _STR.findall(src)


def _array_block(src: str, name: str) -> str:
    """The initializer text of `static ... name = { ... };`."""
    m = re.search(re.escape(name) + r"\s*=\s*\{", src)
    depth, i = 1, m.end()
    start = m.end()
    while depth:
        if src[i] == "{":
            depth += 1
        elif src[i] == "}":
            depth -= 1
        i += 1
    return src[start:i - 1]


def main() -> None:
    head_words: list[str] = []
    for n in range(1, 9):
        with open(f"{REF_EN}/KStemData{n}.java", encoding="utf-8") as f:
            words = _strings(_array_block(f.read(), "data"))
        assert words, f"KStemData{n}: no strings extracted"
        head_words.extend(words)

    with open(f"{REF_EN}/KStemmer.java", encoding="utf-8") as f:
        stemmer_src = f.read()

    exception_words = _strings(_array_block(stemmer_src, "exceptionWords"))

    conflations: dict[str, str] = {}
    for table in ("directConflations", "countryNationality"):
        flat = _strings(_array_block(stemmer_src, table))
        assert len(flat) % 2 == 0, table
        for w, root in zip(flat[::2], flat[1::2]):
            assert w not in conflations, (table, w)
            conflations[w] = root

    for table in ("supplementDict", "properNouns"):
        head_words.extend(_strings(_array_block(stemmer_src, table)))

    out = {
        "exception_words": exception_words,
        "conflations": conflations,
        "head_words": head_words,
    }
    with gzip.open(OUT, "wt", encoding="utf-8") as f:
        json.dump(out, f, separators=(",", ":"))
    print(f"exception_words={len(exception_words)} "
          f"conflations={len(conflations)} head_words={len(head_words)} "
          f"-> {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
