"""Sorani Kurdish (ckb) normalization + stemming.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
ckb/SoraniNormalizer.java (orthography unification: Arabic yeh/kaf →
Farsi forms, final heh / teh marbuta → ae, heh+ZWNJ → ae, leading reh →
rreh, harakat/tatweel/format-char removal) and SoraniStemmer.java
(postposition → possessive-pronoun strip, then the first matching
ezafe/definite/indefinite/demonstrative suffix). Both are pure str→str
functions run Arrow-batched via ``light_stem_filter`` — shuffle-free.
The chain lowercase → normalize → stem is verified mismatch-free
against the reference's full published vocabulary
(TestSoraniStemFilter.testVocabulary, ckbtestdata.zip).
"""

from __future__ import annotations

import unicodedata

__all__ = ["sorani_normalize", "sorani_stem", "sorani_normalize_stem"]

_YEH, _DOTLESS_YEH, _FARSI_YEH = "ي", "ى", "ی"
_KAF, _KEHEH = "ك", "ک"
_HEH, _AE, _ZWNJ = "ه", "ە", "‌"
_HEH_DOACHASHMEE, _TEH_MARBUTA = "ھ", "ة"
_REH, _RREH, _RREH_ABOVE = "ر", "ڕ", "ڒ"
_DROP = set("ـًٌٍَُِّْ")


def sorani_normalize(word: str) -> str:
    """SoraniNormalizer.normalize (SoraniNormalizer.java:66-127) — a
    direct simulation of the in-place scan: the HEH→AE rule fires only
    when HEH is the last char of the LIVE buffer at the moment the
    scan reaches it (later deletions don't retroactively expose a
    final HEH — the reference's exact left-to-right semantics)."""
    s = list(word)
    i = 0
    while i < len(s):
        ch = s[i]
        if ch in (_YEH, _DOTLESS_YEH):
            s[i] = _FARSI_YEH
        elif ch == _KAF:
            s[i] = _KEHEH
        elif ch == _ZWNJ:
            if i > 0 and s[i - 1] == _HEH:
                s[i - 1] = _AE
            del s[i]
            continue
        elif ch == _HEH:
            if i == len(s) - 1:
                s[i] = _AE
        elif ch == _TEH_MARBUTA:
            s[i] = _AE
        elif ch == _HEH_DOACHASHMEE:
            s[i] = _HEH
        elif ch == _REH:
            if i == 0:
                s[i] = _RREH
        elif ch == _RREH_ABOVE:
            s[i] = _RREH
        elif ch in _DROP or unicodedata.category(ch) == "Cf":
            del s[i]
            continue
        i += 1
    return "".join(s)


def sorani_stem(word: str) -> str:
    """SoraniStemmer.stem (SoraniStemmer.java:34-101): postposition and
    possessive strips cascade; the suffix chain fires once."""
    s = word
    n = len(s)
    # postposition
    if n > 5 and s.endswith("دا"):
        n -= 2
    elif n > 4 and s.endswith("نا"):
        n -= 1
    elif n > 6 and s.endswith("ەوە"):
        n -= 3
    s = s[:n]
    # possessive pronoun
    if n > 6 and s.endswith(("مان", "یان", "تان")):
        n -= 3
        s = s[:n]
    # suffix chain: first match returns
    for suf, guard in (
        ("ێکی", 6), ("یەکی", 7),
        ("ێک", 5), ("یەک", 6),
        ("ەکە", 6), ("کە", 5),
        ("ەکان", 7), ("کان", 6),
        ("یانی", 7), ("انی", 6),
        ("یان", 6), ("ان", 5),
        ("یانە", 7), ("انە", 6),
    ):
        if n > guard and s.endswith(suf):
            return s[: n - len(suf)]
    if n > 5 and (s.endswith("ایە") or s.endswith("ەیە")):
        return s[: n - 2]
    if n > 4 and s.endswith("ە"):
        return s[: n - 1]
    if n > 4 and s.endswith("ی"):
        return s[: n - 1]
    return s


def sorani_normalize_stem(word: str) -> str:
    """The vocabulary-verified chain: lowercase → normalize → stem
    (TestSoraniStemFilter.testVocabulary)."""
    return sorani_stem(sorani_normalize(word.lower()))
