"""Phonetic encoding — the lucene/analysis/phonetic module analog.

Reference: lucene/analysis/phonetic/src/java/org/apache/lucene/
analysis/phonetic/PhoneticFilter.java wrapping commons-codec encoders
(Soundex and friends); terms are replaced (or augmented) by their
phonetic code so spelling variants collide.

Spark surface: American Soundex — engine-side it is the built-in
``F.soundex`` (JVM codegen, commons-codec semantics: h/w transparent
to the duplicate rule, vowels reset it, the first letter's code
suppresses an equal following code). This module carries the
independent pure-Python implementation used to materialize the
vocabulary→code fixture the DuckDB oracle joins (the Porter-fixture
pattern — the oracle engine has no soundex), golden-tested against
the published examples AND asserted equal to ``F.soundex`` over the
whole corpus vocabulary in tests/test_filters.py."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["soundex", "soundex_col"]

_MAP = {
    **{c: "1" for c in "bfpv"},
    **{c: "2" for c in "cgjkqsxz"},
    **{c: "3" for c in "dt"},
    "l": "4",
    **{c: "5" for c in "mn"},
    "r": "6",
}


def soundex(term: str) -> str:
    """American Soundex, commons-codec variant (matches F.soundex):
    Robert→R163, Ashcraft→A261, Tymczak→T522, Pfister→P236,
    Honeyman→H555. Non-alphabetic-initial input passes through."""
    t = term.strip()
    if not t or not t[0].isalpha():
        return t
    out = t[0].upper()
    last = _MAP.get(t[0].lower(), "")
    for ch in t[1:].lower():
        if ch in "hw":
            continue
        code = _MAP.get(ch)
        if code:
            if code != last:
                out += code
            last = code
        else:
            last = ""
        if len(out) == 4:
            break
    return (out + "000")[:4]


def soundex_col(col) -> Column:
    """Engine-side encoder: the JVM built-in."""
    return F.soundex(col if isinstance(col, Column) else F.col(col))
