"""Snowball English stemmer ("Porter2").

Reference: the reference repo ships the generated
lucene/analysis/common/src/java/org/tartarus/snowball/ext/
EnglishStemmer.java used by SnowballPorterFilterFactory; the algorithm
itself is the published Snowball English stemmer (M.F. Porter,
snowballstem.org/algorithms/english/stemmer.html). This is a
from-scratch Python implementation of that published specification —
verified mismatch-free against the reference's full Snowball English
test vocabulary (TestSnowballVocabData.zip english/voc.txt↔output.txt)
at fixture build and by tests/test_lightstem.py.

Like every analysis stage it is a pure str→str function run
Arrow-batched via analysis/lightstem.py's chain machinery.
"""

from __future__ import annotations

__all__ = ["porter2_stem"]

_VOWELS = set("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = set("cdeghkmnrt")

_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

_EXCEPTION2 = {
    "inning", "outing", "canning", "herring", "earring", "proceed",
    "exceed", "succeed",
}


def _is_vowel(s: str, i: int) -> bool:
    return s[i] in _VOWELS


def _regions(s: str) -> tuple:
    """R1/R2 start offsets; special R1 for gener-/commun-/arsen-."""
    n = len(s)
    r1 = n
    if s.startswith(("gener", "commun", "arsen")):
        r1 = 6 if s.startswith("commun") else 5
    else:
        for i in range(1, n):
            if not _is_vowel(s, i) and _is_vowel(s, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(s, i) and _is_vowel(s, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _is_short_syllable(s: str, i: int) -> bool:
    """(a) vowel at i preceded by non-vowel and followed by a non-vowel
    other than w/x/Y; or (b) a vowel at 0 followed by a non-vowel."""
    if i == 0:
        return (
            len(s) >= 2 and _is_vowel(s, 0) and not _is_vowel(s, 1)
        )
    return (
        0 < i < len(s) - 1
        and _is_vowel(s, i)
        and not _is_vowel(s, i - 1)
        and s[i + 1] not in _VOWELS
        and s[i + 1] not in "wxY"
    )


def _is_short_word(s: str, r1: int) -> bool:
    """Ends in a short syllable and R1 is null."""
    return r1 >= len(s) and _is_short_syllable(s, len(s) - 2)


def _contains_vowel(s: str) -> bool:
    return any(c in _VOWELS for c in s)


def porter2_stem(word: str) -> str:  # noqa: C901 (spec transliteration)
    s = word
    if len(s) <= 2:
        return s
    # strip leading apostrophe, mark consonant-role ys
    if s.startswith("'"):
        s = s[1:]
    if s in _EXCEPTION1:
        return _EXCEPTION1[s]
    if s.startswith("y"):
        s = "Y" + s[1:]
    s = "".join(
        "Y" if c == "y" and i > 0 and _is_vowel(s, i - 1) else c
        for i, c in enumerate(s)
    )
    r1, r2 = _regions(s)

    # Step 0
    for suf in ("'s'", "'s", "'"):
        if s.endswith(suf):
            s = s[: -len(suf)]
            break
    # Step 1a
    if s.endswith("sses"):
        s = s[:-2]
    elif s.endswith(("ied", "ies")):
        s = s[:-2] if len(s) > 4 else s[:-1]
    elif s.endswith(("us", "ss")):
        pass
    elif s.endswith("s"):
        if _contains_vowel(s[:-2]):
            s = s[:-1]
    if s in _EXCEPTION2:
        return s.lower()
    # Step 1b
    if s.endswith(("eed", "eedly")):
        suf = "eedly" if s.endswith("eedly") else "eed"
        if len(s) - len(suf) >= r1:
            s = s[: len(s) - len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if s.endswith(suf):
                stem = s[: -len(suf)]
                if _contains_vowel(stem):
                    s = stem
                    if s.endswith(("at", "bl", "iz")):
                        s += "e"
                    elif s.endswith(_DOUBLES):
                        s = s[:-1]
                    elif _is_short_word(s, r1):
                        s += "e"
                break
    # Step 1c
    if (
        len(s) > 2
        and s[-1] in "yY"
        and s[-2] not in _VOWELS
    ):
        s = s[:-1] + "i"
    # Step 2 (suffix must lie in R1)
    step2 = (
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"),
    )
    for suf, repl in step2:
        if s.endswith(suf):
            if len(s) - len(suf) >= r1:
                s = s[: -len(suf)] + repl
            break
    else:
        if s.endswith("ogi"):
            if len(s) - 3 >= r1 and len(s) > 3 and s[-4] == "l":
                s = s[:-1]
        elif s.endswith("li"):
            if len(s) - 2 >= r1 and len(s) > 2 and s[-3] in _LI_ENDING:
                s = s[:-2]
    # Step 3
    step3 = (
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
        ("ful", ""), ("ness", ""),
    )
    for suf, repl in step3:
        if s.endswith(suf):
            if len(s) - len(suf) >= r1:
                s = s[: -len(suf)] + repl
            break
    else:
        if s.endswith("ative") and len(s) - 5 >= r2:
            s = s[:-5]
    # Step 4 (R2)
    step4 = (
        "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
        "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic",
    )
    for suf in step4:
        if s.endswith(suf):
            if len(s) - len(suf) >= r2:
                s = s[: -len(suf)]
            break
    else:
        if s.endswith("ion") and len(s) - 3 >= r2 and len(s) > 3 \
                and s[-4] in "st":
            s = s[:-3]
    # Step 5
    if s.endswith("e"):
        if len(s) - 1 >= r2 or (
            len(s) - 1 >= r1 and not _is_short_syllable(s, len(s) - 3)
        ):
            s = s[:-1]
    elif s.endswith("l") and len(s) - 1 >= r2 and len(s) > 1 \
            and s[-2] == "l":
        s = s[:-1]
    return s.lower()
