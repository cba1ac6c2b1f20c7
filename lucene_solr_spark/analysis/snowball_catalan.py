"""Snowball Catalan stemmer.

Reference: the generated org/tartarus/snowball/ext/CatalanStemmer
.java in the reference repo; algorithm = the published Snowball
Catalan stemmer (snowballstem.org).

  mark p1/p2 (standard, vowel group aeiou àá èé íï òó úü);
  attached_pronoun (a_1): R1-gated delete;
  then standard_suffix (a_2: R1/R2 deletes, R2→log, R2→ic, R1→c)
       OR ELSE verb_suffix (a_3: R1/R2 deletes);
  residual_suffix (a_4: R1 delete, R1 iqu→ic);
  cleaning: per-char de-accenting (àá→a, èé→e, íì→i? — í→i, ì→i,
       ï→i, òó→o, úü→u, ·→.).

Post region gates abort the step on failure — the longest match
decides, no fallback; a standard_suffix whose gate fails does NOT
fall back to verb_suffix (r_standard_suffix returned true/false from
find_among_b first: a failed GATE returns false too, so the verb
branch DOES run then — mirrored exactly below).

Suffix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py); verified mismatch-free against the
reference's own generated stemmer compiled as a JVM oracle
(scripts/make_snowball5_fixture.py). Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["catalan_snowball_stem"]

_V = set("aeiouàáèéíïòóúü")

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["catalan"]


def _bylen(table):
    return tuple(sorted(table, key=lambda e: len(e[0]), reverse=True))


_PRONOUN = _bylen(_T["a_1"])
_STANDARD = _bylen(_T["a_2"])
_VERB = _bylen(_T["a_3"])
_RESIDUAL = _bylen(_T["a_4"])

_CLEAN = str.maketrans({
    "à": "a", "á": "a", "è": "e", "é": "e", "ì": "i", "í": "i",
    "ï": "i", "ò": "o", "ó": "o", "ú": "u", "ü": "u", "·": ".",
})


def _regions(s: str) -> tuple:
    n = len(s)
    p1 = p2 = n
    i = 0
    while i < n and s[i] not in _V:
        i += 1
    if i < n:
        i += 1
        while i < n and s[i] in _V:
            i += 1
        if i < n:
            p1 = i + 1
            i += 1
            while i < n and s[i] not in _V:
                i += 1
            if i < n:
                i += 1
                while i < n and s[i] in _V:
                    i += 1
                if i < n:
                    p2 = i + 1
    return p1, p2


def _find(s: str, table):
    for suf, act in table:
        if s.endswith(suf):
            return suf, act
    return None


def catalan_snowball_stem(word: str) -> str:
    s = word
    p1, p2 = _regions(s)

    # attached pronoun: R1 delete
    m = _find(s, _PRONOUN)
    if m and len(s) - len(m[0]) >= p1:
        s = s[: len(s) - len(m[0])]

    # standard_suffix, else verb_suffix (a failed gate falls through)
    done = False
    m = _find(s, _STANDARD)
    if m:
        suf, act = m
        k = len(s) - len(suf)
        if act == 1 and k >= p1:
            s, done = s[:k], True
        elif act == 2 and k >= p2:
            s, done = s[:k], True
        elif act == 3 and k >= p2:
            s, done = s[:k] + "log", True
        elif act == 4 and k >= p2:
            s, done = s[:k] + "ic", True
        elif act == 5 and k >= p1:
            s, done = s[:k] + "c", True
    if not done:
        m = _find(s, _VERB)
        if m:
            suf, act = m
            k = len(s) - len(suf)
            if (act == 1 and k >= p1) or (act == 2 and k >= p2):
                s = s[:k]

    # residual
    m = _find(s, _RESIDUAL)
    if m:
        suf, act = m
        k = len(s) - len(suf)
        if k >= p1:
            s = s[:k] + ("ic" if act == 2 else "")

    return s.translate(_CLEAN)
