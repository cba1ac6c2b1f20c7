"""Snowball Lithuanian stemmer.

Reference: the generated org/tartarus/snowball/ext/LithuanianStemmer
.java in the reference repo; algorithm = the published Snowball
Lithuanian stemmer (snowballstem.org).

  mark p1: if the word starts with 'a' AND has more than 6 chars the
          region scan starts from the second char; p1 = after the
          first vowel-run + non-vowel, p2 after the next;
  fix_conflicts (a_2): whole-suffix respellings (aite/aitės→aitė …);
  step1 (a_0, setlimit p1): longest noun/adjective ending that FITS
          at/after p1 deleted (the trie cannot read before p1, so it
          falls back to shorter fitting suffixes);
  fix_chdz (a_3): final č→t, dž→d;
  step2 (a_1, setlimit p1, REPEATED): shorter endings deleted until
          no more match;
  fix_chdz again; fix_gd (a_4): final gd→g.

Suffix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py); verified mismatch-free against the
reference's own generated stemmer compiled as a JVM oracle
(scripts/make_snowball5_fixture.py). Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["lithuanian_snowball_stem"]

_V = set("aeiouyąęėįūų")

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["lithuanian"]


def _bylen(table):
    return tuple(sorted(table, key=lambda e: len(e[0]), reverse=True))


_STEP1 = tuple(e[0] for e in _bylen(_T["a_0"]))
_STEP2 = tuple(e[0] for e in _bylen(_T["a_1"]))
_CONFLICTS = _bylen(_T["a_2"])

_CONFLICT_REPL = {
    1: "aitė", 2: "aitė", 3: "uotė", 4: "uotė", 5: "ėjimas",
    6: "esys", 7: "asys", 8: "avimas", 9: "ojimas",
    10: "okatė", 11: "okatė",
}


def _p1(s: str) -> int:
    n = len(s)
    i = 1 if (s[:1] == "a" and n > 6) else 0
    while i < n and s[i] not in _V:
        i += 1
    if i >= n:
        return n
    i += 1
    while i < n and s[i] in _V:
        i += 1
    if i >= n:
        return n
    return i + 1


def _longest(s: str, sufs, limit: int):
    for suf in sufs:
        if s.endswith(suf) and len(s) - len(suf) >= limit:
            return suf
    return None


def lithuanian_snowball_stem(word: str) -> str:
    s = word
    p1 = _p1(s)

    # fix_conflicts: longest match, unconditional respell
    for suf, act in _CONFLICTS:
        if s.endswith(suf):
            s = s[: len(s) - len(suf)] + _CONFLICT_REPL[act]
            break

    # step1: one longest ending fitting at/after p1
    m = _longest(s, _STEP1, p1)
    if m:
        s = s[: len(s) - len(m)]

    if s.endswith("dž"):
        s = s[:-2] + "d"
    elif s.endswith("č"):
        s = s[:-1] + "t"

    # step2: repeat until no ending fits
    while True:
        m = _longest(s, _STEP2, p1)
        if not m:
            break
        s = s[: len(s) - len(m)]

    if s.endswith("dž"):
        s = s[:-2] + "d"
    elif s.endswith("č"):
        s = s[:-1] + "t"
    if s.endswith("gd"):
        s = s[:-2] + "g"
    return s
