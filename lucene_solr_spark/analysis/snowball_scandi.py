"""Snowball Danish / Norwegian / Swedish stemmers.

Reference: the generated org/tartarus/snowball/ext/{Danish,Norwegian,
Swedish}Stemmer.java in the reference repo (used by
SnowballPorterFilterFactory); the algorithms are the published
Snowball Scandinavian stemmers (snowballstem.org). Shared shape:

    R1 = after the first vowel-followed-by-non-vowel, but never
         before position 3 (the generated r_mark_regions "hop 3");
    main_suffix: longest listed suffix lying inside R1 → delete
         (the 's' entry needs a valid s-ending character before it;
         Norwegian alternatively allows 'k' preceded by a non-vowel);
    consonant_pair: listed pair inside R1 → drop ONE letter;
    other_suffix: listed suffix inside R1 → delete/replace
         (Danish additionally strips a bare unconditioned "igst"→"ig"
         and re-runs consonant_pair after a deletion; Danish also
         UNDOUBLEs a repeated final consonant inside R1).

Every stemmer is verified mismatch-free against the reference's full
Snowball vocabulary (TestSnowballVocabData.zip) at fixture build.
Pure str→str functions — Arrow-batched, shuffle-free.
"""

from __future__ import annotations

__all__ = ["danish_stem", "norwegian_stem", "swedish_stem"]

_V_DA = set("aeiouyåæø")
_V_NO = set("aeiouyåæø")
_V_SV = set("aeiouyåäö")


def _r1(word: str, vowels: set) -> int:
    """Standard R1, floored at 3 (mark_regions with x = 3)."""
    n = len(word)
    p1 = n
    for i in range(1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            p1 = i + 1
            break
    return max(p1, 3) if p1 < n else p1


def _longest(word: str, p1: int, suffixes) -> str | None:
    """find_among_b: the longest suffix matching AND inside [p1:]."""
    for suf in suffixes:
        if word.endswith(suf) and len(word) - len(suf) >= p1:
            return suf
    return None


def _bylen(sufs) -> tuple:
    return tuple(sorted(sufs, key=len, reverse=True))


# -------------------------------------------------------------- Danish

_DA_MAIN = _bylen([
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
    "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
    "hedens", "erens", "ers", "ets", "erets", "et", "eret",
])
_DA_S_END = set("abcdfghjklmnoprtvyzå")
_DA_PAIRS = ("gd", "dt", "gt", "kt")
_DA_OTHER = _bylen(["ig", "lig", "elig", "els"])


def _da_consonant_pair(s: str, p1: int) -> str:
    if len(s) >= 2 and s[-2:] in _DA_PAIRS and len(s) - 2 >= p1:
        return s[:-1]
    return s


def danish_stem(word: str) -> str:
    """DanishStemmer.stem (generated ext/DanishStemmer.java)."""
    s = word
    p1 = _r1(s, _V_DA)
    # main_suffix
    suf = _longest(s, p1, _DA_MAIN)
    if suf:
        s = s[: -len(suf)]
    elif s.endswith("s") and len(s) - 1 >= p1 and len(s) >= 2 \
            and s[-2] in _DA_S_END:
        s = s[:-1]
    # consonant_pair
    s = _da_consonant_pair(s, p1)
    # other_suffix: unconditioned igst → ig, then R1 suffixes
    if s.endswith("igst"):
        s = s[:-2]
    if s.endswith("løst") and len(s) - 4 >= p1:
        s = s[:-1]
    else:
        suf = _longest(s, p1, _DA_OTHER)
        if suf:
            s = s[: -len(suf)]
            s = _da_consonant_pair(s, p1)
    # undouble: repeated final consonant inside R1
    if (
        len(s) >= 2
        and len(s) - 1 >= p1
        and s[-1] not in _V_DA
        and s[-1] == s[-2]
    ):
        s = s[:-1]
    return s


# ------------------------------------------------------------ Norwegian

_NO_MAIN = _bylen([
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
    "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast",
])
_NO_ERT = ("erte", "ert")  # → "er"
_NO_S_END = set("bcdfghjlmnoprtvyz")
_NO_PAIRS = ("dt", "vt")
_NO_OTHER = _bylen([
    "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
    "slov", "hetslov",
])


def norwegian_stem(word: str) -> str:
    """NorwegianStemmer.stem (generated ext/NorwegianStemmer.java).
    The 's' main suffix needs an s-ending char before it, or 'k'
    preceded by a non-vowel."""
    s = word
    p1 = _r1(s, _V_NO)
    # main_suffix: longest among ALL entries (incl. s/ert variants)
    best = None
    for suf in _bylen(list(_NO_MAIN) + list(_NO_ERT) + ["s"]):
        if s.endswith(suf) and len(s) - len(suf) >= p1:
            best = suf
            break
    if best in _NO_ERT:
        s = s[: -len(best)] + "er"
    elif best == "s":
        prev = s[-2] if len(s) >= 2 else ""
        prev2 = s[-3] if len(s) >= 3 else ""
        if prev in _NO_S_END or (prev == "k" and prev2 not in _V_NO
                                 and len(s) >= 3):
            s = s[:-1]
    elif best:
        s = s[: -len(best)]
    # consonant_pair
    if len(s) >= 2 and s[-2:] in _NO_PAIRS and len(s) - 2 >= p1:
        s = s[:-1]
    # other_suffix
    suf = _longest(s, p1, _NO_OTHER)
    if suf:
        s = s[: -len(suf)]
    return s


# -------------------------------------------------------------- Swedish

_SV_MAIN = _bylen([
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern",
    "ar", "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es",
    "ades", "andes", "ens", "arens", "hetens", "erns", "at", "andet",
    "het", "ast",
])
_SV_S_END = set("bcdfghjklmnoprtvy")
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_OTHER = _bylen(["ig", "lig", "els"])


def swedish_stem(word: str) -> str:
    """SwedishStemmer.stem (generated ext/SwedishStemmer.java)."""
    s = word
    p1 = _r1(s, _V_SV)
    best = None
    for suf in _bylen(list(_SV_MAIN) + ["s"]):
        if s.endswith(suf) and len(s) - len(suf) >= p1:
            best = suf
            break
    if best == "s":
        if len(s) >= 2 and s[-2] in _SV_S_END:
            s = s[:-1]
    elif best:
        s = s[: -len(best)]
    if len(s) >= 2 and s[-2:] in _SV_PAIRS and len(s) - 2 >= p1:
        s = s[:-1]
    if s.endswith("fullt") and len(s) - 5 >= p1:
        s = s[:-1]
    elif s.endswith("löst") and len(s) - 4 >= p1:
        s = s[:-1]
    else:
        suf = _longest(s, p1, _SV_OTHER)
        if suf:
            s = s[: -len(suf)]
    return s
