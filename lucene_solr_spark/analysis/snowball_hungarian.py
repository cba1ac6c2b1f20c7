"""Snowball Hungarian stemmer.

Reference: the generated org/tartarus/snowball/ext/HungarianStemmer
.java in the reference repo; algorithm = the published Snowball
Hungarian stemmer (snowballstem.org/algorithms/hungarian/stemmer
.html). R1 starts after the first consonant (or consonant DIGRAPH —
cs/dzs/gy/ly/ny/sz/ty/zs) when the word begins with a vowel, else
after the first vowel. Nine suffix families run in order (instrument,
case, special/other cases, factive, owned, singular/plural owner,
plural), each R1-gated; the instrument/factive families additionally
require a doubled consonant before the ending and undouble it; most
families normalize a trailing á/é to a/e.

Suffix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py); verified mismatch-free against the
reference's full Snowball Hungarian vocabulary. Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["hungarian_snowball_stem"]

_V = set("aeiouáéíóöõúüû")
_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["hungarian"]


def _bylen(table):
    return tuple(sorted(table, key=lambda e: len(e[0]), reverse=True))


_DOUBLES = _bylen(_T["a_2"])
_INSTRUM = _bylen(_T["a_3"])
_CASE = _bylen(_T["a_4"])
_CASE_SPECIAL = _bylen(_T["a_5"])
_CASE_OTHER = _bylen(_T["a_6"])
_FACTIVE = _bylen(_T["a_7"])
_PLURAL = _bylen(_T["a_8"])
_OWNED = _bylen(_T["a_9"])
_SING_OWNER = _bylen(_T["a_10"])
_PLUR_OWNER = _bylen(_T["a_11"])

# action → replacement ('' = delete) per the generated case switches
_A = ""  # marker for delete
_CASE_SPECIAL_R = {1: "e", 2: "a", 3: "a"}
_CASE_OTHER_R = {1: "", 2: "", 3: "a", 4: "e"}
_PLURAL_R = {1: "a", 2: "e", 3: "", 4: "", 5: "", 6: "", 7: ""}
_OWNED_R = {1: "", 2: "e", 3: "a", 4: "", 5: "e", 6: "a", 7: "",
            8: "e", 9: ""}
_SING_OWNER_R = {
    1: "", 2: "a", 3: "e", 4: "", 5: "a", 6: "e", 7: "", 8: "", 9: "",
    10: "a", 11: "e", 12: "", 13: "", 14: "a", 15: "e", 16: "", 17: "",
    18: "", 19: "a", 20: "e",
}
_PLUR_OWNER_R = {
    1: "", 2: "a", 3: "e", 4: "", 5: "", 6: "", 7: "a", 8: "e", 9: "",
    10: "", 11: "", 12: "a", 13: "e", 14: "", 15: "", 16: "", 17: "",
    18: "a", 19: "e", 20: "", 21: "", 22: "a", 23: "e", 24: "", 25: "",
    26: "", 27: "a", 28: "e", 29: "",
}


def _r1(s: str) -> int:
    n = len(s)
    if not s:
        return 0
    if s[0] in _V:
        for i in range(1, n):
            if s[i] not in _V:
                for d in _DIGRAPHS:
                    if s.startswith(d, i):
                        return i + len(d)
                return i + 1
        return n
    for i in range(1, n):
        if s[i] in _V:
            return i + 1
    return n


def _find(s: str, table, r1: int):
    """Longest-match-decides with a POST r1 check: the generated code
    runs find_among_b unbounded then r_R1 — a longest match outside R1
    aborts the family, it does NOT fall back to a shorter suffix."""
    for suf, action in table:
        if s.endswith(suf):
            if len(s) - len(suf) >= r1:
                return suf, action
            return None
    return None


def _ends_double(s: str) -> bool:
    return any(s.endswith(d) for d, _ in _DOUBLES)


def _undouble(s: str) -> str:
    """Drop the second-to-last char (bb→b, ssz→sz, ccs→cs)."""
    if len(s) >= 2:
        return s[:-2] + s[-1]
    return s


def _v_ending(s: str, r1: int) -> str:
    if s.endswith("á") and len(s) - 1 >= r1:
        return s[:-1] + "a"
    if s.endswith("é") and len(s) - 1 >= r1:
        return s[:-1] + "e"
    return s


def hungarian_snowball_stem(word: str) -> str:  # noqa: C901
    s = word
    r1 = _r1(s)

    # instrument (al/el after a double, undoubled)
    m = _find(s, _INSTRUM, r1)
    if m:
        head = s[: len(s) - len(m[0])]
        if _ends_double(head):
            s = _undouble(head)

    # case endings, then á/é normalization
    m = _find(s, _CASE, r1)
    if m:
        s = _v_ending(s[: len(s) - len(m[0])], r1)

    # special case endings (én→e, án/ánként→a)
    m = _find(s, _CASE_SPECIAL, r1)
    if m:
        s = s[: len(s) - len(m[0])] + _CASE_SPECIAL_R[m[1]]

    # other cases (astul/estül deleted, ástul→a, éstül→e)
    m = _find(s, _CASE_OTHER, r1)
    if m:
        s = s[: len(s) - len(m[0])] + _CASE_OTHER_R[m[1]]

    # factive (á/é after a double, undoubled)
    m = _find(s, _FACTIVE, r1)
    if m:
        head = s[: len(s) - len(m[0])]
        if _ends_double(head):
            s = _undouble(head)

    # owned
    m = _find(s, _OWNED, r1)
    if m:
        s = s[: len(s) - len(m[0])] + _OWNED_R[m[1]]

    # singular owner
    m = _find(s, _SING_OWNER, r1)
    if m:
        s = s[: len(s) - len(m[0])] + _SING_OWNER_R[m[1]]

    # plural owner
    m = _find(s, _PLUR_OWNER, r1)
    if m:
        s = s[: len(s) - len(m[0])] + _PLUR_OWNER_R[m[1]]

    # plural
    m = _find(s, _PLURAL, r1)
    if m:
        s = s[: len(s) - len(m[0])] + _PLURAL_R[m[1]]

    return s
