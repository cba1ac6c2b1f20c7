"""Snowball Armenian stemmer.

Reference: the generated org/tartarus/snowball/ext/ArmenianStemmer
.java in the reference repo; algorithm = the published Snowball
Armenian stemmer (snowballstem.org).

Structure: mark pV (after the first vowel) and p2 (after the
vowel–non-vowel sequence that follows), then — each step optional,
each starting again from the word end, matching restricted by
``setlimit`` to the region at/after pV —

  ending    (a_3, additionally gated by R2): delete;
  verb      (a_1): delete;
  adjective (a_0): delete;
  noun      (a_2): delete.

Under the setlimit the longest table suffix THAT FITS the region
wins (the trie walk cannot read before pV, so it falls back to
shorter suffixes that fit); the ending step's R2 gate is a POST
check on that winner — a failure aborts the step with no fallback.

Suffix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py); verified mismatch-free against the
reference's own generated stemmer compiled as a JVM oracle
(scripts/make_snowball5_fixture.py). Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["armenian_snowball_stem"]

# ա ե է ը ի ո ւ օ (bits 209,4,128,0,18 over U+0561..U+0585)
_V = set("աեէըիուօ")

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["armenian"]


def _bylen(table):
    return tuple(sorted((e[0] for e in table), key=len, reverse=True))


_ADJECTIVE = _bylen(_T["a_0"])
_VERB = _bylen(_T["a_1"])
_NOUN = _bylen(_T["a_2"])
_ENDING = _bylen(_T["a_3"])


def _regions(s: str) -> tuple:
    n = len(s)
    pv = p2 = n
    i = 0
    while i < n and s[i] not in _V:
        i += 1
    if i < n:
        pv = i + 1
        i += 1
        while i < n and s[i] in _V:
            i += 1
        if i < n:
            i += 1  # consumed the non-vowel
            while i < n and s[i] not in _V:
                i += 1
            if i < n:
                i += 1  # second vowel
                while i < n and s[i] in _V:
                    i += 1
                if i < n:
                    p2 = i + 1
    return pv, p2


def _longest(s: str, table, limit: int):
    """Longest table suffix of ``s`` whose start lies at/after
    ``limit`` (the setlimit fallback-inside-the-walk semantics)."""
    for suf in table:
        if s.endswith(suf) and len(s) - len(suf) >= limit:
            return suf
    return None


def armenian_snowball_stem(word: str) -> str:
    s = word
    pv, p2 = _regions(s)

    # ending: R2 post-check on the setlimit winner
    m = _longest(s, _ENDING, pv)
    if m and len(s) - len(m) >= p2:
        s = s[: len(s) - len(m)]
    # verb / adjective / noun: delete within pV
    for table in (_VERB, _ADJECTIVE, _NOUN):
        m = _longest(s, table, pv)
        if m:
            s = s[: len(s) - len(m)]
    return s
