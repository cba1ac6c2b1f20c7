"""Snowball Portuguese stemmer.

Reference: the generated org/tartarus/snowball/ext/PortugueseStemmer
.java in the reference repo; algorithm = the published Snowball
Portuguese stemmer (snowballstem.org/algorithms/portuguese/stemmer
.html).

  prelude: ã→a~, õ→o~ (nasal markers; '~' is a consonant);
  step 1:  standard suffixes (R2/R1 conditions; logía→log, ución→u,
           ência→ente, amente R1 + ic/ad/os/iv(+at), mente R2 +
           ante/avel/ível, idade(s) R2 + ic/abil/iv, iva/ivo(s) R2
           + at, ira(s)→ir when in RV and preceded by e);
  step 2:  verb suffixes inside RV when step 1 did nothing;
  cleanup: a final i after c (c inside RV) dropped when step 1/2 did
           something; else residual a/i/o/os/á/í/ó in RV;
  residual form: e/é/ê in RV dropped, a preceding gu/ci's u/i (in RV)
           dropped too; ç→c;
  postlude: a~→ã, o~→õ.

Suffix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py); verified mismatch-free against the
reference's full Snowball Portuguese vocabulary. Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["portuguese_snowball_stem"]

_V = set("aeiouáâéêíóôú")

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["portuguese"]


def _bylen(table):
    return tuple(sorted(table, key=lambda e: len(e[0]), reverse=True))


_AFTER_AMENTE = _bylen(_T["a_2"])   # ic, ad, os, iv(→at)
_AFTER_MENTE = _bylen(_T["a_3"])    # ante, avel, ível
_AFTER_IDADE = _bylen(_T["a_4"])    # ic, abil, iv
_STANDARD = _bylen(_T["a_5"])
_VERB = _bylen(_T["a_6"])
_RESIDUAL = _bylen(_T["a_7"])
_RES_FORM = _bylen(_T["a_8"])


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


def portuguese_snowball_stem(word: str) -> str:  # noqa: C901
    s = word.replace("ã", "a~").replace("õ", "o~")
    rv, r1, r2 = _regions(s)

    changed = False
    # step 1: standard suffixes
    m = _find(s, _STANDARD)
    if m:
        suf, act = m
        k = len(s) - len(suf)
        if act == 1 and k >= r2:
            s = s[:k]
            changed = True
        elif act == 2 and k >= r2:
            s = s[:k] + "log"
            changed = True
        elif act == 3 and k >= r2:
            s = s[:k] + "u"
            changed = True
        elif act == 4 and k >= r2:
            s = s[:k] + "ente"
            changed = True
        elif act == 5 and k >= r1:  # amente
            s = s[:k]
            changed = True
            m2 = _find(s, _AFTER_AMENTE)
            if m2 and len(s) - len(m2[0]) >= r2:
                s = s[: len(s) - len(m2[0])]
                if m2[1] == 1 and s.endswith("at") \
                        and len(s) - 2 >= r2:
                    s = s[:-2]
        elif act == 6 and k >= r2:  # mente
            s = s[:k]
            changed = True
            m2 = _find(s, _AFTER_MENTE)
            if m2 and len(s) - len(m2[0]) >= r2:
                s = s[: len(s) - len(m2[0])]
        elif act == 7 and k >= r2:  # idade(s)
            s = s[:k]
            changed = True
            m2 = _find(s, _AFTER_IDADE)
            if m2 and len(s) - len(m2[0]) >= r2:
                s = s[: len(s) - len(m2[0])]
        elif act == 8 and k >= r2:  # iva/ivo(s)
            s = s[:k]
            changed = True
            if s.endswith("at") and len(s) - 2 >= r2:
                s = s[:-2]
        elif act == 9 and k >= rv:  # ira(s) → ir after e
            if s[:k].endswith("e"):
                s = s[:k] + "ir"
                changed = True

    # step 2: verb suffixes
    if not changed:
        m = _find(s, _VERB, limit=rv)
        if m:
            s = s[: len(s) - len(m[0])]
            changed = True

    if changed:
        # cleanup: final i (in RV) after c
        if s.endswith("ci") and len(s) - 1 >= rv:
            s = s[:-1]
    else:
        # residual suffix
        m = _find(s, _RESIDUAL)
        if m and len(s) - len(m[0]) >= rv:
            s = s[: len(s) - len(m[0])]

    # residual form
    m = _find(s, _RES_FORM)
    if m:
        suf, act = m
        if act == 1 and len(s) - len(suf) >= rv:
            s = s[: len(s) - len(suf)]
            if (s.endswith("gu") or s.endswith("ci")) \
                    and len(s) - 1 >= rv:
                s = s[:-1]
        elif act == 2:
            s = s[: len(s) - len(suf)] + "c"

    return s.replace("a~", "ã").replace("o~", "õ")
