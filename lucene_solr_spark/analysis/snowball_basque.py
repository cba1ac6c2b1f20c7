"""Snowball Basque stemmer.

Reference: the generated org/tartarus/snowball/ext/BasqueStemmer.java
in the reference repo; algorithm = the published Snowball Basque
stemmer (snowballstem.org).

  mark RV (Spanish-style: vowel+consonant start → after the next
          vowel; vowel+vowel → after the next consonant; consonant+
          consonant → after the next vowel; consonant+vowel → after
          the third char), p1/p2 standard;
  aditzak (a_0, REPEATED): verb endings — RV-gated delete (1),
          R2-gated delete (2), or respell (atseden/arabera/baditu);
  izenak  (a_1, REPEATED): noun endings — RV/R2/R1-gated deletes and
          respellings (jok/tra/minutu/zehar/geldi/igaro/aurka);
  adjetiboak (a_2, once): RV-gated delete or ->"z".

CURSOR-CARRY semantics (the part that differs from the simpler
Snowball stemmers): inside a repeat loop the cursor is NOT reset —
after a successful delete/respell the cursor sits at the match
START, and the next iteration matches suffixes ending THERE; the
identity respells (atseden→atseden …) are protective barriers that
move the cursor past a form that must not be stripped. The cursor
also persists from the aditzak loop into izenak and adjetiboak
(Java restores it to the failing iteration's start, which is where
the last success left it). Region marks are fixed ints computed on
the original word and NOT remapped after slices — exactly the
reference behavior.

Post region gates abort the pass on failure — the longest match
decides, no fallback (a failed gate inside a REPEATED pass ends the
loop).

Suffix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py); verified mismatch-free against the
reference's own generated stemmer compiled as a JVM oracle
(scripts/make_snowball5_fixture.py). Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["basque_snowball_stem"]

_V = set("aeiou")

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["basque"]


def _bylen(table):
    return tuple(sorted(table, key=lambda e: len(e[0]), reverse=True))


_ADITZAK = _bylen(_T["a_0"])
_IZENAK = _bylen(_T["a_1"])
_ADJETIBOAK = _bylen(_T["a_2"])

_ADITZAK_REPL = {3: "atseden", 4: "arabera", 5: "baditu"}
_IZENAK_REPL = {3: "jok", 5: "tra", 6: "minutu", 7: "zehar",
                8: "geldi", 9: "igaro", 10: "aurka"}


def _regions(s: str) -> tuple:
    n = len(s)
    rv = p1 = p2 = n
    if n >= 2:
        if s[0] in _V:
            if s[1] not in _V:
                i = 2
                while i < n and s[i] not in _V:
                    i += 1
                if i < n:
                    rv = i + 1
            else:
                i = 2
                while i < n and s[i] in _V:
                    i += 1
                if i < n:
                    rv = i + 1
        else:
            if s[1] not in _V:
                i = 2
                while i < n and s[i] not in _V:
                    i += 1
                if i < n:
                    rv = i + 1
            else:
                rv = 3 if n > 2 else n
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
    return rv, p1, p2


def _find_at(s: str, c: int, table):
    """Longest table suffix of s ending exactly at position c."""
    head = s[:c]
    for suf, act in table:
        if head.endswith(suf):
            return suf, act
    return None


def basque_snowball_stem(word: str) -> str:
    s = word
    rv, p1, p2 = _regions(s)
    c = len(s)  # cursor: matches end here; carried across steps

    # aditzak: repeat; a failed region gate ends the loop
    while True:
        m = _find_at(s, c, _ADITZAK)
        if not m:
            break
        suf, act = m
        k = c - len(suf)
        if act == 1:
            if k < rv:
                break
            s, c = s[:k] + s[c:], k
        elif act == 2:
            if k < p2:
                break
            s, c = s[:k] + s[c:], k
        else:
            s, c = s[:k] + _ADITZAK_REPL[act] + s[c:], k

    # izenak: repeat (cursor carried in from aditzak)
    while True:
        m = _find_at(s, c, _IZENAK)
        if not m:
            break
        suf, act = m
        k = c - len(suf)
        if act == 1:
            if k < rv:
                break
            s, c = s[:k] + s[c:], k
        elif act == 2:
            if k < p2:
                break
            s, c = s[:k] + s[c:], k
        elif act == 4:
            if k < p1:
                break
            s, c = s[:k] + s[c:], k
        else:
            s, c = s[:k] + _IZENAK_REPL[act] + s[c:], k

    # adjetiboak: once, at the carried cursor
    m = _find_at(s, c, _ADJETIBOAK)
    if m:
        suf, act = m
        k = c - len(suf)
        if act == 1:
            if k >= rv:
                s = s[:k] + s[c:]
        else:
            s = s[:k] + "z" + s[c:]
    return s
