"""Snowball Finnish stemmer.

Reference: the generated org/tartarus/snowball/ext/FinnishStemmer.java
in the reference repo; algorithm = the published Snowball Finnish
stemmer (snowballstem.org/algorithms/finnish/stemmer.html). Steps
(suffix matches R1/R2-bounded via the setlimit pattern):

  1 particle:    kO/hAn/pA/kin/kAAn after a particle-ending char;
                 sti in R2;
  2 possessive:  si (not after k), ni (kse→ksi restore), nsA/mme/nne,
                 An/än/en after their case endings;
  3 case ending: hAn-series after their harmonizing vowel, tta/ttä
                 after e, a/ä after consonant+vowel, n (plus one more
                 char of a preceding long vowel or ie) — marks the
                 word;
  4 other:       mpi/mmA-comparatives (not after po) in R2;
  5 plural:      i/j (R1) when step 3 fired, else t after a vowel
                 (R1) with a following mmA/immA cleanup in R2;
  6 tidy:        trailing long vowel loses a char (R1), aei/ä after a
                 consonant dropped, oj/jo/ju pairs reduced, and the
                 final non-vowel undoubled (kk→k) keeping trailing
                 vowels.

Suffix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py); verified mismatch-free against the
reference's full Snowball Finnish vocabulary. Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["finnish_snowball_stem"]

_V1 = set("aeiouyäö")
_V2 = set("aeiouäö")
_AEI = set("aeiä")
_PARTICLE_END = _V1 | {"n", "t"}
_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["finnish"]


def _bylen(table):
    return tuple(sorted(table, key=lambda e: len(e[0]), reverse=True))


_PARTICLES = _bylen(_T["a_0"])
_CASE_A = tuple(e[0] for e in _bylen(_T["a_1"]))   # lla/na/ssa/...
_CASE_AE = tuple(e[0] for e in _bylen(_T["a_2"]))  # llä/nä/ssä/...
_CASE_E = tuple(e[0] for e in _bylen(_T["a_3"]))   # lle/ine
_POSSESSIVES = _bylen(_T["a_4"])
_CASES = _bylen(_T["a_6"])
_OTHER = _bylen(_T["a_7"])
_T9 = _bylen(_T["a_9"])


def _regions(s: str) -> tuple:
    n = len(s)
    p1 = n
    for i in range(1, n):
        if s[i] not in _V1 and s[i - 1] in _V1:
            p1 = i + 1
            break
    p2 = n
    for i in range(p1 + 1, n):
        if s[i] not in _V1 and s[i - 1] in _V1:
            p2 = i + 1
            break
    return p1, p2


def _find(s: str, table, limit: int):
    """setlimit-style among: longest suffix lying inside [limit:]."""
    for suf, action in table:
        if s.endswith(suf) and len(s) - len(suf) >= limit:
            return suf, action
    return None


def finnish_snowball_stem(word: str) -> str:  # noqa: C901
    s = word
    p1, p2 = _regions(s)

    # step 1: particle etc.
    m = _find(s, _PARTICLES, p1)
    if m:
        suf, act = m
        k = len(s) - len(suf)
        if act == 1:
            if k >= 1 and s[k - 1] in _PARTICLE_END:
                s = s[:k]
        elif act == 2 and k >= p2:
            s = s[:k]

    # step 2: possessive
    m = _find(s, _POSSESSIVES, p1)
    if m:
        suf, act = m
        k = len(s) - len(suf)
        if act == 1:  # si, not after k
            if not (k >= 1 and s[k - 1] == "k"):
                s = s[:k]
        elif act == 2:  # ni; kse → ksi
            s = s[:k]
            if s.endswith("kse"):
                s = s[:-1] + "i"
        elif act == 3:
            s = s[:k]
        elif act == 4:  # an after a_1
            if s[:k].endswith(_CASE_A):
                s = s[:k]
        elif act == 5:  # än after a_2
            if s[:k].endswith(_CASE_AE):
                s = s[:k]
        elif act == 6:  # en after a_3
            if s[:k].endswith(_CASE_E):
                s = s[:k]

    # step 3: case ending
    ending_removed = False
    m = _find(s, _CASES, p1)
    # den/tten/siin need a V2-preceded i before them (r_VI), seen a
    # long vowel (r_LONG) — all read inside the R1 limit; on failure
    # the among falls back to the parent entry 'n'
    if m and m[0] in ("den", "tten", "siin", "seen"):
        suf = m[0]
        k = len(s) - len(suf)
        if suf == "seen":
            cond = k - 2 >= p1 and s[k - 2:k] in _LONG
        else:
            cond = (
                k - 2 >= p1 and s[k - 1] == "i" and s[k - 2] in _V2
            )
        if not cond:
            m = ("n", 7) if (s.endswith("n")
                             and len(s) - 1 >= p1) else None
    if m:
        suf, act = m
        k = len(s) - len(suf)
        ok = False
        if act == -1:
            ok = True
        elif act in (1, 2, 3, 4, 5, 6):
            prev = {1: "a", 2: "e", 3: "i", 4: "o", 5: "ä", 6: "ö"}[act]
            ok = k >= 1 and s[k - 1] == prev
        elif act == 7:  # n — maybe eat one more char of LONG / ie
            ok = True
            head = s[:k]
            if head.endswith(_LONG) or head.endswith("ie"):
                if len(head) >= 1:
                    k -= 1
        elif act == 8:  # a/ä after consonant+vowel
            ok = (
                k >= 2 and s[k - 1] in _V1 and s[k - 2] not in _V1
            )
        elif act == 9:  # tta/ttä after e
            ok = k >= 1 and s[k - 1] == "e"
        if ok:
            s = s[:k]
            ending_removed = True

    # step 4: other endings (R2)
    m = _find(s, _OTHER, p2)
    if m:
        suf, act = m
        k = len(s) - len(suf)
        if act == -1 or not s[:k].endswith("po"):
            s = s[:k]

    # step 5: plurals
    if ending_removed:
        if (s.endswith("i") or s.endswith("j")) and len(s) - 1 >= p1:
            s = s[:-1]
    else:
        if (
            s.endswith("t") and len(s) - 1 >= p1
            and len(s) >= 2 and s[-2] in _V1
        ):
            s = s[:-1]
            m = _find(s, _T9, p2)
            if m:
                suf, act = m
                k = len(s) - len(suf)
                if act == -1 or not s[:k].endswith("po"):
                    s = s[:k]

    # step 6: tidy
    if s.endswith(_LONG) and len(s) - 2 >= p1:
        s = s[:-1]
    if (
        len(s) >= 2 and s[-1] in _AEI and len(s) - 1 >= p1
        and s[-2] not in _V1 and len(s) - 2 >= p1
    ):
        s = s[:-1]
    if s.endswith(("oj", "uj")) and len(s) - 2 >= p1:
        s = s[:-1]
    if s.endswith("jo") and len(s) - 2 >= p1:
        s = s[:-1]
    # final undouble: last non-vowel doubled → drop one, keep the
    # trailing vowels
    i = len(s) - 1
    while i >= 0 and s[i] in _V1:
        i -= 1
    if i >= 1 and s[i - 1] == s[i]:
        s = s[:i] + s[i + 1:]
    return s
