"""Lovins stemmer (Snowball rendering).

Reference: the generated org/tartarus/snowball/ext/LovinsStemmer.java
in the reference repo (SnowballPorterFilterFactory language="Lovins");
algorithm = J.B. Lovins, "Development of a Stemming Algorithm" (1968),
as published at snowballstem.org/algorithms/lovins/stemmer.html:

  1. remove the LONGEST of 294 endings whose contextual condition
     (A..CC — minimum stem lengths and letter contexts) holds; a
     failed condition falls back to the next shorter matching ending
     (the backward-trie parent chain — every shorter matching entry
     is an ancestor of the longer one);
  2. undouble a final bb/dd/gg/ll/mm/nn/pp/rr/ss/tt;
  3. apply one of 34 respell rules (iev→ief, uct→uc, …), a few with
     their own not-after contexts.

The 294-ending table (with per-ending condition tags) is the published
algorithm's data, frozen by scripts/make_snowball_tables.py; the
condition predicates and respell actions are implemented here from the
generated routines. Verified mismatch-free against the reference's
full Snowball lovins vocabulary at fixture build. Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["lovins_stem"]

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["lovins"]

_ENDINGS = tuple(
    sorted(
        ((e[0], e[2]) for e in _T["a_1"]),
        key=lambda p: len(p[0]),
        reverse=True,
    )
)
_DOUBLES = tuple(e[0] for e in _T["a_2"])
_RESPELL = tuple(
    sorted(_T["a_3"], key=lambda e: len(e[0]), reverse=True)
)
_AA_SET = tuple(e[0] for e in _T["a_0"])  # d f ph th l er or es t

_RESPELL_TO = {
    1: "ief", 2: "uc", 3: "um", 4: "rb", 5: "ur", 6: "ister",
    7: "meter", 8: "olut", 9: "l", 10: "bic", 11: "dic", 12: "pic",
    13: "tic", 14: "ac", 15: "ec", 16: "ic", 17: "luc", 18: "uas",
    19: "vas", 20: "cis", 21: "lis", 22: "eris", 23: "pans",
    24: "ens", 25: "ons", 26: "lus", 27: "rus", 28: "hes", 29: "mis",
    30: "ens", 31: "ers", 32: "es", 33: "ys", 34: "ys",
}
# respell rules with a not-after context on the remaining stem
_RESPELL_NOT_AFTER = {9: "aio", 24: "s", 28: "pt", 30: "m", 32: "n"}


def _cond(name: str, stem: str) -> bool:  # noqa: C901
    n = len(stem)
    last = stem[-1] if n else ""
    if name == "r_A":
        return n >= 2
    if name == "r_B":
        return n >= 3
    if name == "r_C":
        return n >= 4
    if name == "r_D":
        return n >= 5
    if name == "r_E":
        return n >= 2 and last != "e"
    if name == "r_F":
        return n >= 3 and last != "e"
    if name == "r_G":
        return n >= 3 and last == "f"
    if name == "r_H":
        return n >= 2 and (last == "t" or stem.endswith("ll"))
    if name == "r_I":
        return n >= 2 and last not in "oe"
    if name == "r_J":
        return n >= 2 and last not in "ae"
    if name == "r_K":
        return n >= 3 and (
            last in "li" or (last == "e" and stem[-3] == "u")
        )
    if name == "r_L":
        if n < 2 or last in "ux":
            return False
        if last == "s" and not (n >= 2 and stem[-2] == "o"):
            return False
        return True
    if name == "r_M":
        return n >= 2 and last not in "acem"
    if name == "r_N":
        return n >= 3 and (stem[-3] != "s" or n >= 4)
    if name == "r_O":
        return n >= 2 and last in "li"
    if name == "r_P":
        return n >= 2 and last != "c"
    if name == "r_Q":
        return n >= 3 and last not in "ln"
    if name == "r_R":
        return n >= 2 and last in "nr"
    if name == "r_S":
        return n >= 2 and (
            stem.endswith("dr")
            or (last == "t" and not stem.endswith("tt"))
        )
    if name == "r_T":
        return n >= 2 and (
            last == "s" or (last == "t" and stem[-2] != "o")
        )
    if name == "r_U":
        return n >= 2 and last in "lmnr"
    if name == "r_V":
        return n >= 2 and last == "c"
    if name == "r_W":
        return n >= 2 and last not in "su"
    if name == "r_X":
        return n >= 2 and (
            last in "li"
            or (last == "e" and n >= 3 and stem[-3] == "u")
        )
    if name == "r_Y":
        return n >= 2 and stem.endswith("in")
    if name == "r_Z":
        return n >= 2 and last != "f"
    if name == "r_AA":
        return n >= 2 and stem.endswith(_AA_SET)
    if name == "r_BB":
        return n >= 3 and not stem.endswith("met") \
            and not stem.endswith("ryst")
    if name == "r_CC":
        return n >= 2 and last == "l"
    raise ValueError(name)


def lovins_stem(word: str) -> str:
    s = word
    # 1: longest ending whose condition holds (shorter fallback)
    for suf, cond in _ENDINGS:
        if s.endswith(suf) and _cond(cond, s[: len(s) - len(suf)]):
            s = s[: len(s) - len(suf)]
            break
    # 2: undouble
    if s.endswith(_DOUBLES):
        s = s[:-1]
    # 3: respell (longest match; a failed context means no respell)
    for entry in _RESPELL:
        suf, act = entry[0], entry[1]
        if s.endswith(suf):
            head = s[: len(s) - len(suf)]
            guard = _RESPELL_NOT_AFTER.get(act)
            if guard and head and head[-1] in guard:
                break
            s = head + _RESPELL_TO[act]
            break
    return s
