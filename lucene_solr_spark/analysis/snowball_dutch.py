"""Snowball Dutch stemmer.

Reference: the generated org/tartarus/snowball/ext/DutchStemmer.java
in the reference repo; algorithm = the published Snowball Dutch
stemmer (snowballstem.org/algorithms/dutch/stemmer.html).

  prelude: umlauts/acutes folded; initial y → Y; after a vowel an
           i-before-vowel → I and any y → Y (protected);
  regions: R1 (floored at 3) / R2;
  step 1:  heden→heid (R1); en(e) with en_ending (R1, non-vowel
           before, not after gem, then kk/dd/tt undoubled); s(e)
           after a non-vowel-non-j (R1);
  step 2:  final e (R1) after a non-vowel → delete + undouble,
           remembering e_found;
  step 3a: heid (R2, not after c) → delete, then en via en_ending;
  step 3b: end/ing (R2) with a non-e-preceded ig (R2) else undouble;
           ig (R2, not after e); lijk (R2) then step-2 e-ending;
           baar (R2); bar (R2, only if e_found);
  step 4:  CVD undouble — final non-vowel-non-I after aa/ee/oo/uu
           after a non-vowel loses one vowel;
  postlude: I→i, Y→y.

Verified mismatch-free against the reference's full Snowball Dutch
vocabulary at fixture build. Pure str→str.
"""

from __future__ import annotations

__all__ = ["dutch_snowball_stem"]

_V = set("aeiouyè")
_V_J = _V | {"j"}
_V_I = _V | {"I"}
_FOLD = str.maketrans("áäéëíïóöúü", "aaeeiioouu")


def _prelude(word: str) -> str:
    s = list(word.translate(_FOLD))
    if s and s[0] == "y":
        s[0] = "Y"
    for i in range(1, len(s)):
        if s[i - 1] in _V:
            if s[i] == "i" and i + 1 < len(s) and s[i + 1] in _V:
                s[i] = "I"
            elif s[i] == "y":
                s[i] = "Y"
    return "".join(s)


def _regions(s: str) -> tuple:
    n = len(s)
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
    # the floor adjusts R1 only, AFTER R2 was scanned from raw R1
    if r1 < n:
        r1 = max(r1, 3)
    return r1, r2


def _undouble(s: str) -> str:
    if s.endswith(("kk", "dd", "tt")):
        return s[:-1]
    return s


def dutch_snowball_stem(word: str) -> str:  # noqa: C901
    s = _prelude(word)
    r1, r2 = _regions(s)

    def en_ending(t: str, nsuf: int):
        k = len(t) - nsuf
        if (
            k >= r1 and k >= 1 and t[k - 1] not in _V
            and not t[:k].endswith("gem")
        ):
            return _undouble(t[:k])
        return None

    # step 1
    for suf in ("heden", "ene", "en", "se", "s"):
        if not s.endswith(suf):
            continue
        k = len(s) - len(suf)
        if suf == "heden":
            if k >= r1:
                s = s[:k] + "heid"
        elif suf in ("ene", "en"):
            t = en_ending(s, len(suf))
            if t is not None:
                s = t
        else:  # se / s
            if k >= r1 and k >= 1 and s[k - 1] not in _V_J:
                s = s[:k]
        break

    # step 2
    e_found = False
    if s.endswith("e") and len(s) - 1 >= r1 and len(s) >= 2 \
            and s[-2] not in _V:
        s = _undouble(s[:-1])
        e_found = True

    # step 3a: heid
    if s.endswith("heid") and len(s) - 4 >= r2 and not (
        len(s) >= 5 and s[-5] == "c"
    ):
        s = s[:-4]
        if s.endswith("en"):
            t = en_ending(s, 2)
            if t is not None:
                s = t

    # step 3b: d-suffixes
    for suf in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if not s.endswith(suf):
            continue
        k = len(s) - len(suf)
        if suf in ("end", "ing"):
            if k >= r2:
                s = s[:k]
                if s.endswith("ig") and len(s) - 2 >= r2 and not (
                    len(s) >= 3 and s[-3] == "e"
                ):
                    s = s[:-2]
                else:
                    s = _undouble(s)
        elif suf == "ig":
            if k >= r2 and not (k >= 1 and s[k - 1] == "e"):
                s = s[:k]
        elif suf == "lijk":
            if k >= r2:
                s = s[:k]
                if s.endswith("e") and len(s) - 1 >= r1 \
                        and len(s) >= 2 and s[-2] not in _V:
                    s = _undouble(s[:-1])
        elif suf == "baar":
            if k >= r2:
                s = s[:k]
        elif suf == "bar":
            if k >= r2 and e_found:
                s = s[:k]
        break

    # step 4: CVD undouble
    if (
        len(s) >= 4
        and s[-1] not in _V_I
        and s[-3:-1] in ("aa", "ee", "oo", "uu")
        and s[-4] not in _V
    ):
        s = s[:-2] + s[-1]

    return s.replace("I", "i").replace("Y", "y")
