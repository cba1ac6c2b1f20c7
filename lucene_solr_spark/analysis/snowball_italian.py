"""Snowball Italian stemmer.

Reference: the generated org/tartarus/snowball/ext/ItalianStemmer.java
in the reference repo; algorithm = the published Snowball Italian
stemmer (snowballstem.org/algorithms/italian/stemmer.html).

  prelude: acute→grave accents (á→à …), qu→qU, u/i between vowels
           uppercased (protected);
  step 0:  attached pronoun after ando/endo (dropped) or ar/er/ir
           (pronoun → e), marker inside RV;
  step 1:  standard suffixes (R2/R1/RV conditions; logia→log,
           uzione→u, enza→ente, amente R1 with ic/abil/os/iv(+at)
           follow-ups, ità with ic/abil/iv follow-ups, ivo/iva with
           at(+ic) follow-ups);
  step 2:  verb suffixes inside RV (plain delete) when step 1 did
           nothing;
  step 3:  final vowel a/e/i/o/à/è/ì/ò in RV (then a now-final i in
           RV), and a final h after c/g in RV;
  postlude: U→u, I→i.

Suffix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py); verified mismatch-free against the
reference's full Snowball Italian vocabulary. Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["italian_snowball_stem"]

_V = set("aeiouàèìòù")
_AEIO = set("aeioàèìò")

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["italian"]


def _bylen(table):
    return tuple(sorted(table, key=lambda e: len(e[0]), reverse=True))


_PRONOUNS = _bylen(_T["a_2"])
_MARKERS = _bylen(_T["a_3"])      # ando/endo → 1, ar/er/ir → 2
_AFTER_AMENTE = _bylen(_T["a_4"])  # ic, abil, os, iv(→at)
_AFTER_ITA = _bylen(_T["a_5"])     # ic, abil, iv
_STANDARD = _bylen(_T["a_6"])
_VERB = _bylen(_T["a_7"])

_ACUTE = {"á": "à", "é": "è", "í": "ì", "ó": "ò", "ú": "ù"}


def _prelude(word: str) -> str:
    out = []
    i = 0
    while i < len(word):
        ch = word[i]
        if ch in _ACUTE:
            out.append(_ACUTE[ch])
        elif ch == "q" and i + 1 < len(word) and word[i + 1] == "u":
            out.append("q")
            out.append("U")
            i += 2
            continue
        else:
            out.append(ch)
        i += 1
    for i in range(1, len(out) - 1):
        if out[i] in "ui" and out[i - 1] in _V and out[i + 1] in _V:
            out[i] = out[i].upper()
    return "".join(out)


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


def italian_snowball_stem(word: str) -> str:  # noqa: C901
    s = _prelude(word)
    rv, r1, r2 = _regions(s)

    # step 0: attached pronoun
    m = _find(s, _PRONOUNS)
    if m:
        head = s[: len(s) - len(m[0])]
        m2 = _find(head, _MARKERS)
        if m2 and len(head) - len(m2[0]) >= rv:
            if m2[1] == 1:
                s = head
            elif m2[1] == 2:
                s = head + "e"

    # step 1: standard suffixes
    changed = False
    m = _find(s, _STANDARD)
    if m:
        suf, act = m
        k = len(s) - len(suf)
        if act == 1 and k >= r2:
            s = s[:k]
            changed = True
        elif act == 2 and k >= r2:
            s = s[:k]
            changed = True
            if s.endswith("ic") and len(s) - 2 >= r2:
                s = s[:-2]
        elif act == 3 and k >= r2:
            s = s[:k] + "log"
            changed = True
        elif act == 4 and k >= r2:
            s = s[:k] + "u"
            changed = True
        elif act == 5 and k >= r2:
            s = s[:k] + "ente"
            changed = True
        elif act == 6 and k >= rv:
            s = s[:k]
            changed = True
        elif act == 7 and k >= r1:  # amente
            s = s[:k]
            changed = True
            m2 = _find(s, _AFTER_AMENTE)
            if m2 and len(s) - len(m2[0]) >= r2:
                s = s[: len(s) - len(m2[0])]
                if m2[1] == 1 and s.endswith("at") \
                        and len(s) - 2 >= r2:
                    s = s[:-2]
        elif act == 8 and k >= r2:  # ità
            s = s[:k]
            changed = True
            m2 = _find(s, _AFTER_ITA)
            if m2 and len(s) - len(m2[0]) >= r2:
                s = s[: len(s) - len(m2[0])]
        elif act == 9 and k >= r2:  # ivo/iva(+s)
            s = s[:k]
            changed = True
            if s.endswith("at") and len(s) - 2 >= r2:
                s = s[:-2]
                if s.endswith("ic") and len(s) - 2 >= r2:
                    s = s[:-2]

    # step 2: verb suffixes
    if not changed:
        m = _find(s, _VERB, limit=rv)
        if m:
            s = s[: len(s) - len(m[0])]

    # step 3: vowel suffix
    if s and s[-1] in _AEIO and len(s) - 1 >= rv:
        s = s[:-1]
        if s.endswith("i") and len(s) - 1 >= rv:
            s = s[:-1]
    if (
        s.endswith("h") and len(s) >= 2 and s[-2] in "cg"
        and len(s) - 2 >= rv
    ):
        s = s[:-1]

    return s.replace("U", "u").replace("I", "i")
