"""Snowball Irish stemmer.

Reference: the generated org/tartarus/snowball/ext/IrishStemmer.java
in the reference repo; algorithm = the published Snowball Irish
stemmer (snowballstem.org).

  initial_morph: longest PREFIX from a_0 — eclipsis/lenition and
          pre-vowel mutations stripped or de-mutated (bhf→f, mb→b,
          gc→c, …, bh/ch/dh/… lenition → base consonant, h-/t-/n-
          and apostrophe forms dropped);
  mark pV (after first vowel), p1/p2 (standard) on the RESULT;
  noun_sfx (a_1): longest match, post-gate R1 (action 1) or R2
          (action 2), delete;
  deriv   (a_2): post-gate R2 delete (action 1) or unconditional
          respell (arc/gin/graf/paite/óid);
  verb_sfx(a_3): post-gate RV (action 1) or R1 (action 2), delete.

Post region gates abort the step on failure — the longest match
decides, no fallback.

Suffix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py); verified mismatch-free against the
reference's own generated stemmer compiled as a JVM oracle
(scripts/make_snowball5_fixture.py). Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["irish_snowball_stem"]

_V = set("aeiouáéíóú")

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["irish"]


def _bylen(table):
    return tuple(sorted(table, key=lambda e: len(e[0]), reverse=True))


_INITIAL = _bylen(_T["a_0"])
_NOUN = _bylen(_T["a_1"])
_DERIV = _bylen(_T["a_2"])
_VERB = _bylen(_T["a_3"])

# action id -> replacement for the initial-morph de-mutations
_INITIAL_REPL = {
    1: "", 2: "", 4: "",
    3: "f", 5: "s", 6: "b", 7: "c", 8: "d", 9: "f", 10: "g",
    11: "p", 12: "s", 13: "t", 14: "b", 15: "c", 16: "d", 17: "f",
    18: "g", 19: "m", 20: "p", 21: "t",
}

_DERIV_REPL = {2: "arc", 3: "gin", 4: "graf", 5: "paite", 6: "óid"}


def _regions(s: str) -> tuple:
    n = len(s)
    pv = p1 = p2 = n
    i = 0
    while i < n and s[i] not in _V:
        i += 1
    if i < n:
        pv = i + 1
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
    return pv, p1, p2


def _find(s: str, table):
    for suf, act in table:
        if s.endswith(suf):
            return suf, act
    return None


def irish_snowball_stem(word: str) -> str:
    s = word
    for pre, act in _INITIAL:
        if s.startswith(pre):
            s = _INITIAL_REPL[act] + s[len(pre):]
            break
    pv, p1, p2 = _regions(s)

    # noun_sfx: act 1 → R1 delete, act 2 → R2 delete
    m = _find(s, _NOUN)
    if m:
        suf, act = m
        k = len(s) - len(suf)
        if (act == 1 and k >= p1) or (act == 2 and k >= p2):
            s = s[:k]

    # deriv: act 1 → R2 delete, else respell unconditionally
    m = _find(s, _DERIV)
    if m:
        suf, act = m
        k = len(s) - len(suf)
        if act == 1:
            if k >= p2:
                s = s[:k]
        else:
            s = s[:k] + _DERIV_REPL[act]

    # verb_sfx: act 1 → RV delete, act 2 → R1 delete
    m = _find(s, _VERB)
    if m:
        suf, act = m
        k = len(s) - len(suf)
        if (act == 1 and k >= pv) or (act == 2 and k >= p1):
            s = s[:k]
    return s
