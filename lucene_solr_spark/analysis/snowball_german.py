"""Snowball German stemmer.

Reference: the generated org/tartarus/snowball/ext/GermanStemmer.java
in the reference repo; algorithm = the published Snowball German
stemmer (snowballstem.org/algorithms/german/stemmer.html). Pipeline:

  prelude:   ß→ss; u/y BETWEEN vowels uppercased to U/Y (protected
             from being treated as vowels);
  regions:   standard R1/R2 over vowels {a,e,i,o,u,y,ä,ö,ü}, R1
             floored at 3;
  step 1:    {e,em,en,ern,er,es} delete in R1; s deleted in R1 when
             preceded by a valid s-ending {b,d,f,g,h,k,l,m,n,r,t};
  step 2:    {en,er,est} delete in R1; st deleted in R1 when preceded
             by a valid st-ending {b,d,f,g,h,k,l,m,n,t} itself
             preceded by ≥3 letters;
  step 3 (d-suffixes, R2): end/ung (then a non-e-preceded ig in R2);
             ig/ik/isch when not preceded by e; lich/heit (then er/en
             in R1); keit (then ig/lich in R2);
  postlude:  U/Y unprotected, umlauts folded a/o/u.

Verified mismatch-free against the reference's full Snowball German
vocabulary at fixture build. Pure str→str, Arrow-batched, shuffle-free.
"""

from __future__ import annotations

__all__ = ["german_snowball_stem"]

_V = set("aeiouyäöü")
_S_END = set("bdfghklmnrt")
_ST_END = set("bdfghklmnt")


def _prelude(word: str) -> str:
    s = word.replace("ß", "ss")
    out = list(s)
    for i in range(1, len(out) - 1):
        if out[i] == "u" and out[i - 1] in _V and out[i + 1] in _V:
            out[i] = "U"
        elif out[i] == "y" and out[i - 1] in _V and out[i + 1] in _V:
            out[i] = "Y"
    return "".join(out)


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
    if r1 < n:
        r1 = max(r1, 3)
    return r1, r2


def _postlude(s: str) -> str:
    return (
        s.replace("U", "u").replace("Y", "y")
        .replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )


def german_snowball_stem(word: str) -> str:
    return _core(_prelude(word))


def _core(s: str) -> str:
    """The shared suffix machinery (steps 1-3 + postlude) over an
    already-preluded string — German2 reuses it with its own prelude
    (ae/oe/ue folding, snowball_german2.py)."""
    r1, r2 = _regions(s)

    def in_r1(k):
        return len(s) - k >= r1

    def in_r2(k):
        return len(s) - k >= r2

    # step 1
    for suf in ("ern", "em", "en", "er", "es", "e"):
        if s.endswith(suf):
            if in_r1(len(suf)):
                s = s[: -len(suf)]
            break
    else:
        if s.endswith("s") and in_r1(1) and len(s) >= 2 \
                and s[-2] in _S_END:
            s = s[:-1]
    # step 2
    for suf in ("est", "en", "er"):
        if s.endswith(suf):
            if in_r1(len(suf)):
                s = s[: -len(suf)]
            break
    else:
        # the st-ending char must itself be preceded by >=3 letters
        # (generated hop-3 runs AFTER in_grouping_b moved the cursor)
        if (
            s.endswith("st") and in_r1(2) and len(s) >= 6
            and s[-3] in _ST_END
        ):
            s = s[:-2]
    # step 3 (d-suffixes) — longest of the among set
    for suf in ("lich", "heit", "keit", "isch", "end", "ung", "ig", "ik"):
        if not s.endswith(suf):
            continue
        if suf in ("end", "ung"):
            if in_r2(len(suf)):
                s = s[: -len(suf)]
                if (
                    s.endswith("ig") and in_r2(2) and len(s) >= 3
                    and s[-3] != "e"
                ):
                    s = s[:-2]
        elif suf in ("ig", "ik", "isch"):
            if len(s) > len(suf) and s[-len(suf) - 1] == "e":
                pass
            elif in_r2(len(suf)):
                s = s[: -len(suf)]
        elif suf in ("lich", "heit"):
            if in_r2(len(suf)):
                s = s[: -len(suf)]
                for suf2 in ("er", "en"):
                    if s.endswith(suf2) and in_r1_after(s, r1, 2):
                        s = s[:-2]
                        break
        elif suf == "keit":
            if in_r2(4):
                s = s[:-4]
                for suf2 in ("lich", "ig"):
                    if s.endswith(suf2) and len(s) - len(suf2) >= r2:
                        s = s[: -len(suf2)]
                        break
        break
    return _postlude(s)


def in_r1_after(s: str, r1: int, k: int) -> bool:
    return len(s) - k >= r1
