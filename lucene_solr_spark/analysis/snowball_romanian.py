"""Snowball Romanian stemmer.

Reference: the generated org/tartarus/snowball/ext/RomanianStemmer
.java in the reference repo; algorithm = the published Snowball
Romanian stemmer (snowballstem.org/algorithms/romanian/stemmer.html).

  prelude: u/i between vowels uppercased;
  step 0 (R1): plural/article endings with replacements (ul/ului
          dropped, aua→a, ea/ele/elor→e, ii/iua/iei/ile*/ilor→i —
          ile kept after ab — atei→at, aţia/aţie→aţi);
  step 1 (combo, repeated): *abilitate→abil, *ibilitate→ibil,
          *ivitate→iv, ic*→ic, at*→at, it*→it in R1 — each removal
          marks the word;
  step 2 (R2): standard suffixes deleted, ţ+iune/iuni→t,
          ism/ist forms→ist — marks the word;
  step 3: verb suffixes inside RV only when steps 1/2 removed
          nothing (first group needs u or a non-vowel before, inside
          RV);
  step 4: final a/e/ie/i/ă in RV;
  postlude: I→i, U→u.

Suffix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py); verified mismatch-free against the
reference's full Snowball Romanian vocabulary. Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["romanian_snowball_stem"]

_V = set("aeiouâîă")

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["romanian"]


def _bylen(table):
    return tuple(sorted(table, key=lambda e: len(e[0]), reverse=True))


_STEP0 = _bylen(_T["a_1"])
_COMBO = _bylen(_T["a_2"])
_STANDARD = _bylen(_T["a_3"])
_VERB = _bylen(_T["a_4"])
_VOWEL = _bylen(_T["a_5"])

_STEP0_REPL = {2: "a", 3: "e", 4: "i", 5: "i", 6: "at", 7: "aţi"}
_COMBO_REPL = {1: "abil", 2: "ibil", 3: "iv", 4: "ic", 5: "at", 6: "it"}


def _prelude(word: str) -> str:
    s = list(word)
    for i in range(1, len(s) - 1):
        if s[i] in "ui" and s[i - 1] in _V and s[i + 1] in _V:
            s[i] = s[i].upper()
    return "".join(s)


def _regions(s: str) -> tuple:
    n = len(s)
    rv = n
    if n >= 2:
        if s[1] not in _V:
            for i in range(2, n):
                if s[i] in _V:
                    rv = i + 1
                    break
        elif s[0] in _V:
            for i in range(2, n):
                if s[i] not in _V:
                    rv = i + 1
                    break
        else:
            rv = 3 if n > 3 else n
    r1 = n
    for i in range(1, n):
        if s[i] not in _V and s[i - 1] in _V:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if s[i] not in _V and s[i - 1] in _V:
            r2 = i + 1
            break
    return rv, r1, r2


def _find(s: str, table, limit: int = 0):
    for suf, action in table:
        if s.endswith(suf) and len(s) - len(suf) >= limit:
            return suf, action
    return None


def romanian_snowball_stem(word: str) -> str:  # noqa: C901
    s = _prelude(word)
    rv, r1, r2 = _regions(s)

    # step 0
    m = _find(s, _STEP0)
    if m:
        suf, act = m
        k = len(s) - len(suf)
        if k >= r1:
            if act == 1:
                s = s[:k]
            elif act == 5:
                if not s[:k].endswith("ab"):
                    s = s[:k] + "i"
            elif act in _STEP0_REPL:
                s = s[:k] + _STEP0_REPL[act]

    # step 1 (combo, repeated) + step 2 (standard)
    removed = False
    while True:
        m = _find(s, _COMBO)
        if not m or len(s) - len(m[0]) < r1:
            break
        suf, act = m
        s = s[: len(s) - len(suf)] + _COMBO_REPL[act]
        removed = True
    m = _find(s, _STANDARD)
    if m and len(s) - len(m[0]) >= r2:
        suf, act = m
        k = len(s) - len(suf)
        if act == 1:
            s = s[:k]
            removed = True
        elif act == 2:
            if s[:k].endswith("ţ"):
                s = s[: k - 1] + "t"
                removed = True
        elif act == 3:
            s = s[:k] + "ist"
            removed = True

    # step 3: verb suffixes
    if not removed:
        m = _find(s, _VERB, limit=rv)
        if m:
            suf, act = m
            k = len(s) - len(suf)
            if act == 1:
                if k - 1 >= rv and (s[k - 1] == "u"
                                    or s[k - 1] not in _V):
                    s = s[:k]
            elif act == 2:
                s = s[:k]

    # step 4: vowel suffix — longest match decides, RV gates it
    m = _find(s, _VOWEL)
    if m and len(s) - len(m[0]) >= rv:
        s = s[: len(s) - len(m[0])]

    return s.replace("I", "i").replace("U", "u")
