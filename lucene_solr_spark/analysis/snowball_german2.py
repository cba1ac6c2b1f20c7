"""Snowball German2 stemmer variant.

Reference: the generated org/tartarus/snowball/ext/German2Stemmer.java
in the reference repo; algorithm = the published Snowball "german2"
variant (snowballstem.org German stemmer variant): identical suffix
machinery to German, but the prelude additionally folds the
typewriter umlauts ae→ä, oe→ö, ue→ü (a "qu" is skipped so the u of
qu never folds), with the u/y-between-vowels protection applied
BEFORE the folding. The postlude (shared with German) then unfolds
ä/ö/ü to a/o/u, so german2 conflates "ae" and "ä" spellings.

Verified mismatch-free against the reference's full Snowball german2
vocabulary at fixture build. Pure str→str.
"""

from __future__ import annotations

from .snowball_german import _V, _core

__all__ = ["german2_snowball_stem"]


def _prelude2(word: str) -> str:
    # pass 1: protect u/y between vowels (original text, ä/ö/ü vowels)
    s = list(word)
    for i in range(1, len(s) - 1):
        if s[i] == "u" and s[i - 1] in _V and s[i + 1] in _V:
            s[i] = "U"
        elif s[i] == "y" and s[i - 1] in _V and s[i + 1] in _V:
            s[i] = "Y"
    # pass 2: ß→ss, ae→ä, oe→ö, ue→ü, with qu skipped
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "ß":
            out.append("ss")
            i += 1
        elif c == "q" and i + 1 < n and s[i + 1] == "u":
            # "qu" plus the TWO following chars pass through unfolded
            # (the generated case-5 hop lands after them)
            out.extend(s[i: i + 4])
            i += 4
        elif c == "a" and i + 1 < n and s[i + 1] == "e":
            out.append("ä")
            i += 2
        elif c == "o" and i + 1 < n and s[i + 1] == "e":
            out.append("ö")
            i += 2
        elif c == "u" and i + 1 < n and s[i + 1] == "e":
            out.append("ü")
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def german2_snowball_stem(word: str) -> str:
    return _core(_prelude2(word))
