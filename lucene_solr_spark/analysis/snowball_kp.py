"""Snowball Kraaij-Pohlmann Dutch stemmer.

Reference: the generated org/tartarus/snowball/ext/KpStemmer.java in
the reference repo; algorithm = the published Snowball
Kraaij-Pohlmann stemmer (snowballstem.org/algorithms/kraaij_pohlmann/
stemmer.html), the heavier of the two Dutch algorithms.

Flow:

  y-marking  — initial y, and every y after a vowel, become Y
               (consonant) for the duration; undone at the end.
  measure    — p1/p2 from [C*] V+ C boundaries, where the digraph
               'ij' counts as one vowel unit inside a V+ cluster.
  Step 1..4  — plural / e-suffix / noun-forming / adjective-forming
               suffix families (each an among with per-case R1/R2 and
               V/VX/C side conditions, several of which restore a
               *lengthened* vowel or a replacement consonant).
  Lose ge-   — prefix and infix 'ge' removal (forward passes; each
               requires 3+ chars and a vowel-then-consonant after the
               'ge', and re-runs measure); a following Step_1c strips
               a d/t the 'ge' participle exposed (unless preceded by
               an R1 n/h).
  Step 7/6   — consonant-cluster repair (kt→k ft→f pt→p) and final
               undoubling (bb→b … v→f z→s), the latter only if some
               earlier step fired.

Faithfulness notes: V()/C() treat the 'ij' digraph as a vowel (C
fails on a preceding "ij" even though j alone is a consonant);
lengthen_V doubles a/o/u (and conditionally e) before a final
consonant outside {w,x}; conditions are evaluated at the suffix
start; a failed branch falls through to the next literal alternative
exactly as the generated or-chains do.

Suffix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py); verified mismatch-free against the
reference's full Kraaij-Pohlmann vocabulary. Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["kp_stem"]

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["kp"]


def _bylen(key):
    return tuple(sorted(
        ((e[0], e[1]) for e in _T[key]),
        key=lambda e: len(e[0]), reverse=True))


_A0 = _bylen("a_0")
_A1 = _bylen("a_1")
_A2 = _bylen("a_2")
_A3 = _bylen("a_3")
_A4 = _bylen("a_4")
_A5 = _bylen("a_5")
_A6 = _bylen("a_6")

_V = set("aeiouy")
_V_WX = set("aeiouywx")
_S6_REP = ("b c d f g h j k l m n p q r s t vv w x zz f s").split()


def _match(s, table):
    n = len(s)
    for suf, case in table:
        if s.endswith(suf):
            return n - len(suf), case
    return None, 0


def _is_V(s, c):
    """V: vowel (or the 'ij' digraph) just before position c."""
    if c >= 1 and s[c - 1] in _V:
        return True
    return c >= 2 and s[c - 2] == "i" and s[c - 1] == "j"


def _is_VX(s, c):
    return c >= 1 and _is_V(s, c - 1)


def _is_C(s, c):
    """C: a true consonant just before c ('ij' does not count)."""
    if c >= 2 and s[c - 2] == "i" and s[c - 1] == "j":
        return False
    return c >= 1 and s[c - 1] not in _V


def _lengthen_v(s):
    """Double the vowel of a fresh stem ending consonant-after-short-
    vowel: …C a/o/u C → …C aa/oo/uu C, and e likewise unless the e
    heads an earlier AIOU pattern. Runs at end-of-string."""
    c = len(s)
    if c < 2 or s[c - 1] in _V_WX:
        return s
    ch = s[c - 2]
    b = c - 2
    if ch in "aou":
        if b == 0 or s[b - 1] not in _V:
            return s[:b] + ch + s[b:]
        return s
    if ch == "e":
        if b == 0:
            return s[:b] + ch + s[b:]
        if s[b - 1] in _V:
            return s
        j = b - 1
        if j >= 1 and s[j - 1] in "aiou":
            return s
        if j >= 3 and s[j - 2] in "aiou" and s[j - 3] not in _V:
            return s
        return s[:b] + ch + s[b:]
    return s


def _measure(s):
    n = len(s)
    i = 0
    while i < n and s[i] not in _V:
        i += 1
    cnt = 0
    while i < n:
        if s[i] == "i" and i + 1 < n and s[i + 1] == "j":
            i += 2
        elif s[i] in _V:
            i += 1
        else:
            break
        cnt += 1
    if cnt < 1 or i >= n:
        return n, n
    i += 1
    p1 = i
    while i < n and s[i] not in _V:
        i += 1
    cnt = 0
    while i < n:
        if s[i] == "i" and i + 1 < n and s[i + 1] == "j":
            i += 2
        elif s[i] in _V:
            i += 1
        else:
            break
        cnt += 1
    if cnt < 1 or i >= n:
        return p1, n
    return p1, i + 1


# ---- suffix steps: return the new string, or None when no rule
# fired (among miss or every side condition failed).

def _step1(s, p1, p2):
    c, case = _match(s, _A0)
    if case == 1:                                   # 's
        return s[:c]
    if case == 2:                                   # s
        if c < p1:
            return None
        if c >= 1 and s[c - 1] == "t" and c - 1 >= p1:
            return None
        if not _is_C(s, c):
            return None
        return s[:c]
    if case == 3:                                   # ies
        return s[:c] + "ie" if c >= p1 else None
    if case == 4:                                   # es
        if s.endswith("ar", 0, c) and c - 2 >= p1 and _is_C(s, c - 2):
            return _lengthen_v(s[:c - 2])
        if s.endswith("er", 0, c) and c - 2 >= p1 and _is_C(s, c - 2):
            return s[:c - 2]
        if c >= p1 and _is_C(s, c):
            return s[:c] + "e"
        return None
    if case == 5:                                   # aus
        if c >= p1 and _is_V(s, c):
            return s[:c] + "au"
        return None
    if case == 6:                                   # en
        if s.endswith("hed", 0, c) and c - 3 >= p1:
            return s[:c - 3] + "heid"
        if s.endswith("nd", 0, c):     # lookbehind only: keep the nd
            return s[:c]
        if s.endswith("d", 0, c) and c - 1 >= p1 and _is_C(s, c - 1):
            return s[:c - 1]
        if (s.endswith("i", 0, c) or s.endswith("j", 0, c)) \
                and _is_V(s, c - 1):
            return s[:c]
        if c >= p1 and _is_C(s, c):
            return _lengthen_v(s[:c])
        return None
    if case == 7:                                   # nde
        return s[:c] + "nd"
    return None


def _step2(s, p1, p2):
    c, case = _match(s, _A1)
    if case == 1:                                   # je
        if s.endswith("'t", 0, c):
            return s[:c - 2]
        if s.endswith("et", 0, c) and c - 2 >= p1 and _is_C(s, c - 2):
            return s[:c - 2]
        if s.endswith("rnt", 0, c):
            return s[:c - 3] + "rn"
        if s.endswith("t", 0, c) and c - 1 >= p1 and _is_VX(s, c - 1):
            return s[:c - 1]
        if s.endswith("ink", 0, c):
            return s[:c - 3] + "ing"
        if s.endswith("mp", 0, c):
            return s[:c - 2] + "m"
        if s.endswith("'", 0, c) and c - 1 >= p1:
            return s[:c - 1]
        if c >= p1 and _is_C(s, c):
            return s[:c]
        return None
    if case == 2:                                   # ge
        return s[:c] + "g" if c >= p1 else None
    if case == 3:                                   # lijke
        return s[:c] + "lijk" if c >= p1 else None
    if case == 4:                                   # ische
        return s[:c] + "isch" if c >= p1 else None
    if case == 5:                                   # de
        if c >= p1 and _is_C(s, c):
            return s[:c]
        return None
    if case == 6:                                   # te
        return s[:c] + "t" if c >= p1 else None
    if case == 7:                                   # se
        return s[:c] + "s" if c >= p1 else None
    if case == 8:                                   # re
        return s[:c] + "r" if c >= p1 else None
    if case == 9:                                   # le
        return _lengthen_v(s[:c] + "l") if c >= p1 else None
    if case == 10:                                  # ene
        if c >= p1 and _is_C(s, c):
            return _lengthen_v(s[:c] + "en")
        return None
    if case == 11:                                  # ieve
        if c >= p1 and _is_C(s, c):
            return s[:c] + "ief"
        return None
    return None


def _step3(s, p1, p2):
    c, case = _match(s, _A2)
    if case == 1:                                   # atie
        return s[:c] + "eer" if c >= p1 else None
    if case == 2:                                   # iteit
        return _lengthen_v(s[:c]) if c >= p1 else None
    if case == 3:                                   # heid sel ster
        return s[:c] if c >= p1 else None
    if case == 4:                                   # rder
        return s[:c] + "r"
    if case == 5:                                   # ing isme erij
        return _lengthen_v(s[:c]) if c >= p1 else None
    if case == 6:                                   # arij
        if c >= p1 and _is_C(s, c):
            return s[:c] + "aar"
        return None
    if case == 7:                                   # fie
        return _lengthen_v(s[:c] + "f") if c >= p2 else None
    if case == 8:                                   # gie
        return _lengthen_v(s[:c] + "g") if c >= p2 else None
    if case == 9:                                   # tst
        if c >= p1 and _is_C(s, c):
            return s[:c] + "t"
        return None
    if case == 10:                                  # dst
        if c >= p1 and _is_C(s, c):
            return s[:c] + "d"
        return None
    return None


def _step4(s, p1, p2):
    c, case = _match(s, _A3)
    if case:
        r = None
        if case == 1 and c >= p1:                   # ioneel
            r = s[:c] + "ie"
        elif case == 2 and c >= p1:                 # atief
            r = s[:c] + "eer"
        elif case == 3 and c >= p1:                 # baar
            r = s[:c]
        elif case == 4 and c >= p1 and _is_V(s, c):  # naar
            r = s[:c] + "n"
        elif case == 5 and c >= p1 and _is_V(s, c):  # laar
            r = s[:c] + "l"
        elif case == 6 and c >= p1 and _is_V(s, c):  # raar
            r = s[:c] + "r"
        elif case == 7 and c >= p1:                 # tant
            r = s[:c] + "teer"
        elif case == 8 and c >= p1:                 # lijker lijkst
            r = s[:c] + "lijk"
        elif case == 9 and c >= p1:                 # achtig(er|st)
            r = s[:c]
        elif case == 10 and c >= p1 and _is_C(s, c):  # end erig(er|st)
            r = _lengthen_v(s[:c])
        if r is not None:
            return r
    c, case = _match(s, _A4)                        # ig iger igst
    if case == 1 and c >= p1 and _is_C(s, c):
        return _lengthen_v(s[:c])
    return None


def _step1c(s, p1):
    """Strip a d/t exposed by ge-removal (not after an R1 n/h)."""
    if s.endswith("d"):
        c = len(s) - 1
        if c >= p1 and _is_C(s, c):
            if c >= 1 and s[c - 1] == "n" and c - 1 >= p1:
                return None
            return s[:c]
        return None
    if s.endswith("t"):
        c = len(s) - 1
        if c >= p1 and _is_C(s, c):
            if c >= 1 and s[c - 1] == "h" and c - 1 >= p1:
                return None
            return s[:c]
        return None
    return None


def _step7(s):
    c, case = _match(s, _A5)
    if case:
        return s[:c] + "kfp"[case - 1]
    return None


def _step6(s):
    c, case = _match(s, _A6)
    if case:
        return s[:c] + _S6_REP[case - 1]
    return None


def _lose_prefix(s):
    if not s.startswith("ge") or len(s) < 5:
        return s, False
    n = len(s)
    i = 2
    while i < n and s[i] not in _V:
        i += 1
    if i >= n:
        return s, False
    while i < n and s[i] in _V:
        i += 1
    if i >= n:
        return s, False
    return s[2:], True


def _lose_infix(s):
    idx = s.find("ge", 1)
    if idx < 0:
        return s, False
    n = len(s)
    k = idx + 2
    if k + 3 > n:
        return s, False
    i = k
    while i < n and s[i] not in _V:
        i += 1
    if i >= n:
        return s, False
    while i < n and s[i] in _V:
        i += 1
    if i >= n:
        return s, False
    return s[:idx] + s[k:], True


def kp_stem(word: str) -> str:
    s = word
    y_found = False
    stemmed = False
    if s.startswith("y"):
        s = "Y" + s[1:]
        y_found = True
    if "y" in s:
        out = list(s)
        for i in range(1, len(out)):
            if out[i] == "y" and out[i - 1] in _V:
                out[i] = "Y"
                y_found = True
        s = "".join(out)
    p1, p2 = _measure(s)
    for step in (_step1, _step2, _step3, _step4):
        s2 = step(s, p1, p2)
        if s2 is not None:
            s = s2
            stemmed = True
    s2, ge_removed = _lose_prefix(s)
    if ge_removed:
        s = s2
        p1, p2 = _measure(s)
        s2 = _step1c(s, p1)
        if s2 is not None:
            s = s2
    s2, ge_removed = _lose_infix(s)
    if ge_removed:
        s = s2
        p1, p2 = _measure(s)
        s2 = _step1c(s, p1)
        if s2 is not None:
            s = s2
    s2 = _step7(s)
    if s2 is not None:
        s = s2
        stemmed = True
    if stemmed or ge_removed:
        s2 = _step6(s)
        if s2 is not None:
            s = s2
    if y_found:
        s = s.replace("Y", "y")
    return s
