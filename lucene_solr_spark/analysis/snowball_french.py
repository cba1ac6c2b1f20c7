"""Snowball French stemmer.

Reference: the generated org/tartarus/snowball/ext/FrenchStemmer.java
in the reference repo; algorithm = the published Snowball French
stemmer (snowballstem.org/algorithms/french/stemmer.html).

  prelude: u/i between vowels and u-after-q uppercased; y next to a
           vowel uppercased;
  RV:      two initial vowels (or col/par/tap prefix) → after 3rd
           letter, else after the first vowel past position 0;
  step 1 (standard): R2/R1/RV-conditioned suffixes with the iqU/eux/
           abl/at follow-up chains; amment→ant, emment→ent, and
           vowel-preceded ment(s) deletions FALL THROUGH to the verb
           steps (the reference returns false after mutating);
  step 2a: i-verb suffixes inside RV preceded by a non-vowel in RV;
  step 2b: verb suffixes (ions in R2; é-group; a-group plus an
           RV-contained preceding e);
  cleanup: a trailing Y→i / ç→c after a successful step 1/2;
  residual: s dropped unless kept by {a,i,o,u,è,s}; ion (R2, after
           s/t), ier/ière→i, e, gu-preceded ë — inside RV;
  un_double: ell/eill/enn/onn/ett lose a letter;
  un_accent: é/è before a trailing non-vowel run → e;
  postlude: I/U/Y lowered.

Suffix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py); verified mismatch-free against the
reference's full Snowball French vocabulary. Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["french_snowball_stem"]

_V = set("aeiouyàâèéêëîïôùû")
_KEEP_S = set("aiouès")

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["french"]


def _bylen(table):
    return tuple(sorted(table, key=lambda e: len(e[0]), reverse=True))


_AFTER_EMENT = _bylen(_T["a_2"])   # iv/eus/abl/iqU/ièr/Ièr
_AFTER_ITE = _bylen(_T["a_3"])     # abil/ic/iv
_STANDARD = _bylen(_T["a_4"])
_I_VERB = _bylen(_T["a_5"])
_VERB = _bylen(_T["a_6"])
_RESIDUAL = _bylen(_T["a_7"])
_DOUBLES = ("eill", "ell", "enn", "onn", "ett")


def _prelude(word: str) -> str:
    s = list(word)
    n = len(s)
    i = 0
    while i < n:
        c = s[i]
        if c in _V and i + 1 < n:
            nxt = s[i + 1]
            if nxt == "u" and i + 2 < n and s[i + 2] in _V:
                s[i + 1] = "U"
                i += 2
                continue
            if nxt == "i" and i + 2 < n and s[i + 2] in _V:
                s[i + 1] = "I"
                i += 2
                continue
            if nxt == "y":
                s[i + 1] = "Y"
                i += 2
                continue
        if c == "y" and i + 1 < n and s[i + 1] in _V:
            s[i] = "Y"
            i += 1
            continue
        if c == "q" and i + 1 < n and s[i + 1] == "u":
            s[i + 1] = "U"
            i += 2
            continue
        i += 1
    return "".join(s)


def _regions(s: str) -> tuple:
    n = len(s)
    rv = n
    if n >= 3 and s[0] in _V and s[1] in _V:
        rv = 3
    elif s.startswith(("col", "par", "tap")):
        rv = 3
    else:
        for i in range(1, n):
            if s[i] in _V:
                rv = i + 1
                break
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


def french_snowball_stem(word: str) -> str:  # noqa: C901
    s = _prelude(word)
    rv, r1, r2 = _regions(s)

    done = False      # a suffix routine SUCCEEDED (Y/ç cleanup applies)
    keep_going = True  # whether the verb steps may still run

    # ---- step 1: standard suffix
    m = _find(s, _STANDARD)
    if m:
        suf, act = m
        k = len(s) - len(suf)
        if act == 1 and k >= r2:
            s = s[:k]
            done = True
        elif act == 2 and k >= r2:
            s = s[:k]
            done = True
            if s.endswith("ic"):
                if len(s) - 2 >= r2:
                    s = s[:-2]
                else:
                    s = s[:-2] + "iqU"
        elif act == 3 and k >= r2:
            s = s[:k] + "log"
            done = True
        elif act == 4 and k >= r2:
            s = s[:k] + "u"
            done = True
        elif act == 5 and k >= r2:
            s = s[:k] + "ent"
            done = True
        elif act == 6 and k >= rv:  # ement(s)
            s = s[:k]
            done = True
            m2 = _find(s, _AFTER_EMENT)
            if m2:
                suf2, act2 = m2
                k2 = len(s) - len(suf2)
                if act2 == 1 and k2 >= r2:  # iv
                    s = s[:k2]
                    if s.endswith("at") and len(s) - 2 >= r2:
                        s = s[:-2]
                elif act2 == 2:  # eus
                    if k2 >= r2:
                        s = s[:k2]
                    elif k2 >= r1:
                        s = s[:k2] + "eux"
                elif act2 == 3 and k2 >= r2:  # abl / iqU
                    s = s[:k2]
                elif act2 == 4 and k2 >= rv:  # ièr / Ièr
                    s = s[:k2] + "i"
        elif act == 7 and k >= r2:  # ité(s)
            s = s[:k]
            done = True
            m2 = _find(s, _AFTER_ITE)
            if m2:
                suf2, act2 = m2
                k2 = len(s) - len(suf2)
                if act2 == 1:  # abil
                    if k2 >= r2:
                        s = s[:k2]
                    else:
                        s = s[:k2] + "abl"
                elif act2 == 2:  # ic
                    if k2 >= r2:
                        s = s[:k2]
                    else:
                        s = s[:k2] + "iqU"
                elif act2 == 3 and k2 >= r2:  # iv
                    s = s[:k2]
        elif act == 8 and k >= r2:  # ive/if(s)
            s = s[:k]
            done = True
            if s.endswith("at") and len(s) - 2 >= r2:
                s = s[:-2]
                if s.endswith("ic"):
                    if len(s) - 2 >= r2:
                        s = s[:-2]
                    else:
                        s = s[:-2] + "iqU"
        elif act == 9:  # eaux
            s = s[:k] + "eau"
            done = True
        elif act == 10 and k >= r1:  # aux
            s = s[:k] + "al"
            done = True
        elif act == 11:  # euse(s)
            if k >= r2:
                s = s[:k]
                done = True
            elif k >= r1:
                s = s[:k] + "eux"
                done = True
        elif act == 12 and k >= r1 and k >= 1 and s[k - 1] not in _V:
            s = s[:k]
            done = True
        elif act == 13 and k >= rv:  # amment → ant, keep going
            s = s[:k] + "ant"
        elif act == 14 and k >= rv:  # emment → ent, keep going
            s = s[:k] + "ent"
        elif act == 15:  # ment(s) after an RV vowel, keep going
            if k >= 1 and s[k - 1] in _V and k - 1 >= rv:
                s = s[:k]

    # ---- step 2: verb suffixes (only when step 1 didn't succeed)
    if not done and keep_going:
        m = _find(s, _I_VERB, limit=rv)
        if m:
            k = len(s) - len(m[0])
            if k - 1 >= rv and s[k - 1] not in _V:
                s = s[:k]
                done = True
        if not done:
            m = _find(s, _VERB, limit=rv)
            if m:
                suf, act = m
                k = len(s) - len(suf)
                if act == 1 and k >= r2:
                    s = s[:k]
                    done = True
                elif act == 2:
                    s = s[:k]
                    done = True
                elif act == 3:
                    s = s[:k]
                    done = True
                    if s.endswith("e") and len(s) - 1 >= rv:
                        s = s[:-1]

    if done:
        # trailing Y → i, ç → c
        if s.endswith("Y"):
            s = s[:-1] + "i"
        elif s.endswith("ç"):
            s = s[:-1] + "c"
    else:
        # ---- residual suffix
        if (
            len(s) >= 2 and s.endswith("s")
            and s[-2] not in _KEEP_S
        ):
            s = s[:-1]
        m = _find(s, _RESIDUAL, limit=rv)
        if m:
            suf, act = m
            k = len(s) - len(suf)
            if act == 1 and k >= r2 and k - 1 >= rv \
                    and k >= 1 and s[k - 1] in "st":
                s = s[:k]
            elif act == 2:
                s = s[:k] + "i"
            elif act == 3:
                s = s[:k]
            elif act == 4 and s[:k].endswith("gu") and k - 2 >= rv:
                s = s[:k]

    # ---- un_double
    if s.endswith(_DOUBLES):
        s = s[:-1]

    # ---- un_accent
    j = len(s) - 1
    while j >= 0 and s[j] not in _V:
        j -= 1
    if 0 <= j < len(s) - 1 and s[j] in "éè":
        s = s[:j] + "e" + s[j + 1:]

    return s.replace("I", "i").replace("U", "u").replace("Y", "y")
