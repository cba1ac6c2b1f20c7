"""Snowball "porter" variant — the original Porter algorithm as the
published Snowball program.

Reference: the generated org/tartarus/snowball/ext/PorterStemmer.java
in the reference repo (reachable via SnowballPorterFilterFactory
language="Porter"); algorithm = snowballstem.org's Snowball rendering
of the 1980 algorithm. It differs from Lucene's own
en/PorterStemmer.java (analysis/porter.py, also vocabulary-exact) in
three pinned ways: step 1a deletes a bare s unconditionally
("as"→"a"), step 1c turns y→i whenever ANY vowel precedes it
("ay"→"ai"), and there is no logi→log shortcut. Y-protection marks a
leading y and any y after a vowel.

Verified mismatch-free against the reference's full Snowball porter
vocabulary at fixture build. Pure str→str.
"""

from __future__ import annotations

__all__ = ["snowball_porter_stem"]

_V = set("aeiouy")  # Y (marked) is a consonant

_STEP2 = (
    ("ational", "ate"), ("ization", "ize"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("ousli", "ous"), ("entli", "ent"),
    ("aliti", "al"), ("iviti", "ive"), ("alism", "al"),
    ("ation", "ate"), ("anci", "ance"), ("enci", "ence"),
    ("abli", "able"), ("alli", "al"), ("izer", "ize"),
    ("ator", "ate"), ("eli", "e"),
)
_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic", "ou",
)


def _is_v(s, i):
    return s[i] in _V


def _regions(s: str) -> tuple:
    """Standard R1/R2: after the first (resp. second) vowel-run
    followed by a non-vowel."""
    n = len(s)

    def region_after(start):
        j = start
        while j < n and not _is_v(s, j):
            j += 1
        while j < n and _is_v(s, j):
            j += 1
        return j + 1 if j < n else n

    r1 = region_after(0)
    r2 = region_after(r1) if r1 < n else n
    return r1, r2


def _short_v(s: str) -> bool:
    """ends consonant-vowel-consonant, last not w/x/Y."""
    n = len(s)
    if n < 3:
        return False
    return (
        not _is_v(s, n - 1) and s[n - 1] not in "wxY"
        and _is_v(s, n - 2)
        and not _is_v(s, n - 3)
    )


def snowball_porter_stem(word: str) -> str:  # noqa: C901
    s = list(word)
    y_found = False
    if s and s[0] == "y":
        s[0] = "Y"
        y_found = True
    for i in range(1, len(s)):
        if s[i] == "y" and s[i - 1] in _V:
            s[i] = "Y"
            y_found = True
    s = "".join(s)
    r1, r2 = _regions(s)

    def contains_vowel(t):
        return any(c in _V for c in t)

    # step 1a
    if s.endswith("sses"):
        s = s[:-2]
    elif s.endswith("ies"):
        s = s[:-2]
    elif s.endswith("ss"):
        pass
    elif s.endswith("s"):
        s = s[:-1]
    # step 1b
    if s.endswith("eed"):
        if len(s) - 3 >= r1:
            s = s[:-1]
    else:
        for suf in ("ed", "ing"):
            if s.endswith(suf):
                stem = s[: -len(suf)]
                if contains_vowel(stem):
                    s = stem
                    if s.endswith(("at", "bl", "iz")):
                        s += "e"
                    elif s.endswith(("bb", "dd", "ff", "gg", "mm",
                                     "nn", "pp", "rr", "tt")):
                        s = s[:-1]
                    elif len(s) == r1 and _short_v(s):
                        s += "e"
                break
    # step 1c
    if s and s[-1] in "yY" and contains_vowel(s[:-1]):
        s = s[:-1] + "i"
    # step 2 (R1)
    for suf, repl in _STEP2:
        if s.endswith(suf):
            if len(s) - len(suf) >= r1:
                s = s[: -len(suf)] + repl
            break
    # step 3 (R1)
    for suf, repl in _STEP3:
        if s.endswith(suf):
            if len(s) - len(suf) >= r1:
                s = s[: -len(suf)] + repl
            break
    # step 4 (R2)
    for suf in _STEP4:
        if s.endswith(suf):
            if len(s) - len(suf) >= r2:
                s = s[: -len(suf)]
            break
    else:
        if s.endswith("ion") and len(s) - 3 >= r2 and len(s) >= 4 \
                and s[-4] in "st":
            s = s[:-3]
    # step 5a
    if s.endswith("e"):
        if len(s) - 1 >= r2:
            s = s[:-1]
        elif len(s) - 1 >= r1 and not _short_v(s[:-1]):
            s = s[:-1]
    # step 5b
    if s.endswith("ll") and len(s) - 1 >= r2:
        s = s[:-1]
    if y_found:
        s = s.replace("Y", "y")
    return s
