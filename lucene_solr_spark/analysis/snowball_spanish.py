"""Snowball Spanish stemmer.

Reference: the generated org/tartarus/snowball/ext/SpanishStemmer.java
in the reference repo; algorithm = the published Snowball Spanish
stemmer (snowballstem.org/algorithms/spanish/stemmer.html). Steps:

  step 0: attached pronoun — a clitic (me/se/la/le/lo/las/les/los/
          nos/sela(s)/selo(s)) preceded by a gerund/infinitive marker
          inside RV: accented markers are unaccented (iéndo→iendo,
          ándo→ando, ár/ér/ír→ar/er/ir) with the pronoun dropped;
          unaccented markers (and u+yendo) just drop the pronoun;
  step 1: standard suffixes with R1/R2 conditions and follow-up
          strips (ic / at / able|ible|ante / ic|abil|iv), including
          logía→log, ución→u, amente (R1) vs mente (R2), iva/ivo(+at);
  step 2: if step 1 changed nothing — y-verb forms preceded by u,
          else the big verb-suffix table (en/es/éis/emos extend the
          deletion over a preceding gu's u);
  step 3: residual a/o/á/í/ó (RV) and e/é (RV, with a gu's u in RV
          dropped);
  postlude: unaccent á é í ó ú.

Suffix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py → fixtures_data/snowball_tables
.json); verified mismatch-free against the reference's full Snowball
Spanish vocabulary at fixture build. Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["spanish_snowball_stem"]

_V = set("aeiouáéíóúü")

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["spanish"]


def _bylen(table):
    return tuple(sorted(table, key=lambda e: len(e[0]), reverse=True))


_PRONOUNS = _bylen(_T["a_1"])
_PRON_PRE = _bylen(_T["a_2"])
_AFTER_IV = _bylen(_T["a_3"])      # ic, ad, os, iv(→at follow-up)
_AFTER_MENTE = _bylen(_T["a_4"])   # able, ible, ante
_AFTER_IDAD = _bylen(_T["a_5"])    # ic, abil, iv
_STANDARD = _bylen(_T["a_6"])
_Y_VERB = _bylen(_T["a_7"])
_VERB = _bylen(_T["a_8"])
_RESIDUAL = _bylen(_T["a_9"])

_UNACCENT = str.maketrans("áéíóú", "aeiou")
_PRON_REPL = {1: "iendo", 2: "ando", 3: "ar", 4: "er", 5: "ir"}


def _regions(s: str) -> tuple:
    """Romance RV + standard R1/R2 (SpanishStemmer r_mark_regions)."""
    n = len(s)
    rv = n
    if n >= 2:
        if s[1] not in _V:
            # consonant in 2nd place: after the next vowel
            for i in range(2, n):
                if s[i] in _V:
                    rv = i + 1
                    break
        elif s[0] in _V:
            # two initial vowels: after the next consonant
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


def spanish_snowball_stem(word: str) -> str:  # noqa: C901
    s = word
    rv, r1, r2 = _regions(s)

    # step 0: attached pronoun
    m = _find(s, _PRONOUNS)
    if m:
        pron = m[0]
        head = s[: len(s) - len(pron)]
        m2 = _find(head, _PRON_PRE)
        if m2 and len(head) - len(m2[0]) >= rv:
            suf2, act = m2
            if act in _PRON_REPL:
                s = head[: len(head) - len(suf2)] + _PRON_REPL[act]
            elif act == 6:
                s = head
            elif act == 7 and head[: -len(suf2)].endswith("u"):
                s = head

    # step 1: standard suffix
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
        elif act == 6 and k >= r1:  # amente
            s = s[:k]
            changed = True
            m2 = _find(s, _AFTER_IV)
            if m2 and len(s) - len(m2[0]) >= r2:
                s = s[: len(s) - len(m2[0])]
                if m2[1] == 1:  # iv → optional preceding at in R2
                    if s.endswith("at") and len(s) - 2 >= r2:
                        s = s[:-2]
        elif act == 7 and k >= r2:  # mente
            s = s[:k]
            changed = True
            m2 = _find(s, _AFTER_MENTE)
            if m2 and len(s) - len(m2[0]) >= r2:
                s = s[: len(s) - len(m2[0])]
        elif act == 8 and k >= r2:  # idad(es)
            s = s[:k]
            changed = True
            m2 = _find(s, _AFTER_IDAD)
            if m2 and len(s) - len(m2[0]) >= r2:
                s = s[: len(s) - len(m2[0])]
        elif act == 9 and k >= r2:  # iva/ivo(s)
            s = s[:k]
            changed = True
            if s.endswith("at") and len(s) - 2 >= r2:
                s = s[:-2]

    # step 2: verb suffixes (only if step 1 removed nothing)
    if not changed:
        m = _find(s, _Y_VERB, limit=rv)
        if m and s[: len(s) - len(m[0])].endswith("u"):
            s = s[: len(s) - len(m[0])]
        else:
            m = _find(s, _VERB, limit=rv)
            if m:
                suf, act = m
                k = len(s) - len(suf)
                if act == 1 and s[:k].endswith("gu"):
                    s = s[: k - 1]  # the u goes too
                else:
                    s = s[:k]

    # step 3: residual
    m = _find(s, _RESIDUAL)
    if m:
        suf, act = m
        k = len(s) - len(suf)
        if act == 1 and k >= rv:
            s = s[:k]
        elif act == 2 and k >= rv:
            s = s[:k]
            # a trailing gu whose u lies in RV drops the u
            if s.endswith("gu") and len(s) - 1 >= rv:
                s = s[:-1]

    return s.translate(_UNACCENT)
