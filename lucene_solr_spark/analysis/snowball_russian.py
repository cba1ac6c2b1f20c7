"""Snowball Russian stemmer.

Reference: the generated org/tartarus/snowball/ext/RussianStemmer.java
in the reference repo; algorithm = the published Snowball Russian
stemmer (snowballstem.org/algorithms/russian/stemmer.html). Everything
operates inside RV (after the first vowel); region positions are fixed
on the original word:

  step 1: perfective gerund (group-1 endings need а/я immediately
          before, itself inside RV; the а/я is kept) — else reflexive
          (сь/ся) then ONE of adjectival (adjective, then optional
          participle with the same а/я rule) / verb (same а/я rule
          split) / noun;
  step 2: final и removed;
  step 3: derivational ост/ость inside R2;
  step 4: tidy — ейш(е) removed then a double н single-ized, or a
          bare double н single-ized, or a final ь removed.

Suffix tables are the published algorithm data, frozen from the
generated Among arrays by scripts/make_snowball_tables.py
(fixtures_data/snowball_tables.json); this module implements the
control flow. Verified mismatch-free against the reference's full
Snowball Russian vocabulary at fixture build. Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["russian_snowball_stem"]

_V = set("аеиоуыэюя")

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["russian"]


def _bylen(table):
    return tuple(sorted(table, key=lambda e: len(e[0]), reverse=True))


_PERF_GERUND = _bylen(_T["a_0"])
_ADJECTIVE = _bylen(_T["a_1"])
_PARTICIPLE = _bylen(_T["a_2"])
_REFLEXIVE = _bylen(_T["a_3"])
_VERB = _bylen(_T["a_4"])
_NOUN = _bylen(_T["a_5"])
_DERIVATIONAL = _bylen(_T["a_6"])
_TIDY = _bylen(_T["a_7"])


def _regions(word: str) -> tuple:
    n = len(word)
    pv = p2 = n
    i = 0
    while i < n and word[i] not in _V:
        i += 1
    if i < n:
        pv = i + 1
        # p1: next non-vowel after pv's vowel run
        j = pv
        while j < n and word[j] in _V:
            j += 1
        while j < n and word[j] not in _V:
            j += 1
        p1 = j  # position after first v..nv sequence
        # refine: standard gopast v; gopast non-v
        j = pv
        while j < n and word[j] in _V:
            j += 1
        if j < n:
            p1 = j + 1
            k = p1
            while k < n and word[k] not in _V:
                k += 1
            # p2 within p1
            m = k
            while m < n and word[m] in _V:
                m += 1
            if m < n:
                p2 = m + 1
    return pv, p2


def _match(s: str, pv: int, table, aya_group: int | None = None):
    """find_among_b inside RV: longest suffix with start >= pv; for
    action == aya_group the char before must be а/я and inside RV.
    Returns the matched (suffix, action) honoring among semantics (the
    longest match decides; a failed condition does NOT fall back)."""
    for suf, action in table:
        if s.endswith(suf) and len(s) - len(suf) >= pv:
            if aya_group is not None and action == aya_group:
                k = len(s) - len(suf) - 1
                if k < pv or s[k] not in "ая":
                    return None
            return suf, action
    return None


def russian_snowball_stem(word: str) -> str:
    s = word
    pv, p2 = _regions(s)
    if pv >= len(s):
        return s
    # step 1
    m = _match(s, pv, _PERF_GERUND, aya_group=1)
    if m:
        s = s[: -len(m[0])]
    else:
        m = _match(s, pv, _REFLEXIVE)
        if m:
            s = s[: -len(m[0])]
        adj = _match(s, pv, _ADJECTIVE)
        if adj:
            s = s[: -len(adj[0])]
            part = _match(s, pv, _PARTICIPLE, aya_group=1)
            if part:
                s = s[: -len(part[0])]
        else:
            vb = _match(s, pv, _VERB, aya_group=1)
            if vb:
                s = s[: -len(vb[0])]
            else:
                nn = _match(s, pv, _NOUN)
                if nn:
                    s = s[: -len(nn[0])]
    # step 2: final и
    if s.endswith("и") and len(s) - 1 >= pv:
        s = s[:-1]
    # step 3: derivational in R2
    m = _match(s, pv, _DERIVATIONAL)
    if m and len(s) - len(m[0]) >= p2:
        s = s[: -len(m[0])]
    # step 4: tidy
    m = _match(s, pv, _TIDY)
    if m:
        suf, action = m
        if action == 1:  # ейш(е): delete, then нн → н
            s = s[: -len(suf)]
            if s.endswith("нн") and len(s) - 1 >= pv:
                s = s[:-1]
        elif action == 2:  # н preceded by н
            if s.endswith("нн") and len(s) - len(suf) - 1 >= pv:
                s = s[:-1]
        elif action == 3:  # ь
            s = s[:-1]
    return s
