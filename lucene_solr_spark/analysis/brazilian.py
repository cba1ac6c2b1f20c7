"""Legacy per-language heavy stemmers — BrazilianStemmer and the
classic GermanStemmer (the two reference stemmers outside the
Snowball/light/minimal/RSLP families).

* ``brazilian_stem`` — br/BrazilianStemmer.java: accent-folded CT,
  R1/R2/RV regions, step1 standard suffixes (CT+R1/R2 conditions,
  the e-preceded ira/iras rules, and the reference's discarded
  ``logias`` replacement preserved as a no-op), step2 verb suffixes
  in RV, steps 3-5 residuals. The step1/step2 rule tables are frozen
  as data from the reference source
  (fixtures_data/brazilian_rules.json,
  scripts/make_brazilian_tables.py). The filter contract
  (BrazilianStemFilter.java) keeps the original token when stem()
  returns null (non-indexable length / non-letters).
* ``german_classic_stem`` — de/GermanStemmer.java: umlaut/ß and
  digraph masking substitution, recursive nd/em/er/e/s/n/t stripping
  with substitution-count length guards, erin*/z optimization,
  resubstitution, and the gege-particle removal.

Both verified word-for-word against the reference stemmers compiled
as a JVM oracle (scripts/make_brazilian_fixture.py) and replayed via
the ``fts_light_stemmers`` driver gate fixture.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

__all__ = ["brazilian_stem", "brazilian_stem_raw",
           "german_classic_stem"]

_FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures_data")

with open(os.path.join(_FIXTURE_DIR, "brazilian_rules.json"),
          encoding="utf-8") as _f:
    _RULES = json.load(_f)

_VOWELS = "aeiou"


def _is_vowel(c: str) -> bool:
    return c in _VOWELS


def _get_r1(value: Optional[str]) -> Optional[str]:
    """getR1 (BrazilianStemmer.java:127): after the first non-vowel
    following a vowel — note the reference scans only to length-2."""
    if value is None:
        return None
    i = len(value) - 1
    j = 0
    while j < i and not _is_vowel(value[j]):
        j += 1
    if not j < i:
        return None
    while j < i and _is_vowel(value[j]):
        j += 1
    if not j < i:
        return None
    return value[j + 1:]


def _get_rv(value: Optional[str]) -> Optional[str]:
    """getRV (BrazilianStemmer.java:179)."""
    if value is None:
        return None
    i = len(value) - 1
    if i > 0 and not _is_vowel(value[1]):
        j = 2
        while j < i and not _is_vowel(value[j]):
            j += 1
        if j < i:
            return value[j + 1:]
    if i > 1 and _is_vowel(value[0]) and _is_vowel(value[1]):
        j = 2
        while j < i and _is_vowel(value[j]):
            j += 1
        if j < i:
            return value[j + 1:]
    if i > 2:
        return value[3:]
    return None


_CHANGE = {
    "á": "a", "â": "a", "ã": "a", "é": "e", "ê": "e", "í": "i",
    "ó": "o", "ô": "o", "õ": "o", "ú": "u", "ü": "u", "ç": "c",
    "ñ": "n",
}


def _change_term(value: str) -> str:
    return "".join(_CHANGE.get(c, c) for c in value.lower())


def _suffix(value: Optional[str], suf: str) -> bool:
    return value is not None and value.endswith(suf)


def _remove_suffix(value: str, suf: str) -> str:
    return value[:-len(suf)] if _suffix(value, suf) else value


def _create_ct(term: str) -> str:
    ct = _change_term(term)
    if len(ct) < 2:
        return ct
    if ct[0] in "\"'-,;.?!":
        ct = ct[1:]
    if len(ct) < 2:
        return ct
    if ct[-1] in "-,;.?!'\"":
        ct = ct[:-1]
    return ct


def brazilian_stem_raw(term: str) -> Optional[str]:
    """BrazilianStemmer.stem: returns None for non-indexable terms
    (the filter then keeps the original token)."""
    ct = _create_ct(term)
    if not (2 < len(ct) < 30):
        return None
    if not all(c.isalpha() for c in ct):
        return ct

    r1 = _get_r1(ct)
    r2 = _get_r1(r1)
    rv = _get_rv(ct)

    regions = {"R1": r1, "R2": r2, "RV": rv, "CT": ct}

    altered = False
    for rule in _RULES["step1"]:
        suf = rule["suffix"]
        if rule["guard"] and len(ct) < rule["guard"]:
            continue
        if not _suffix(ct, suf):
            continue
        if rule["region2"] and not _suffix(regions[rule["region2"]], suf):
            continue
        if rule["preceded"] is not None and not _suffix(
                _remove_suffix(ct, suf), rule["preceded"]):
            continue
        if rule["action"] == "remove":
            ct = _remove_suffix(ct, suf)
        elif rule["action"] == "replace":
            ct = _remove_suffix(ct, suf) + rule["replace"]
        # "noop": the reference discards the replacement (logias)
        altered = True
        break

    if not altered:
        for rule in _RULES["step2"]:
            suf = rule["suffix"]
            if rv is None or len(rv) < rule["guard"]:
                continue
            if _suffix(rv, suf):
                # rule["remove"] differs from the matched suffix only
                # for the reference's preserved first-"ira" bug, which
                # removes "ava" (a no-op) yet reports altered
                ct = _remove_suffix(ct, rule["remove"])
                altered = True
                break

    if altered:
        # step3: i preceded by c, in RV
        if rv is not None and _suffix(rv, "i") \
                and _suffix(_remove_suffix(rv, "i"), "c"):
            ct = _remove_suffix(ct, "i")
    else:
        # step4: residual suffix
        if rv is not None:
            for suf in ("os", "a", "i", "o"):
                if _suffix(rv, suf):
                    ct = _remove_suffix(ct, suf)
                    break

    # step5
    if rv is not None and _suffix(rv, "e"):
        if _suffix(_remove_suffix(rv, "e"), "gu"):
            ct = _remove_suffix(ct, "e")
            ct = _remove_suffix(ct, "u")
        elif _suffix(_remove_suffix(rv, "e"), "ci"):
            ct = _remove_suffix(ct, "e")
            ct = _remove_suffix(ct, "i")
        else:
            ct = _remove_suffix(ct, "e")
    return ct


def brazilian_stem(term: str) -> str:
    """BrazilianStemFilter contract: original kept when stem is None."""
    s = brazilian_stem_raw(term)
    return term if s is None else s


# --------------------------------------------------- classic GermanStemmer

def _de_substitute(buf: List[str]) -> int:
    subst = 0
    c = 0
    while c < len(buf):
        if c > 0 and buf[c] == buf[c - 1]:
            buf[c] = "*"
        elif buf[c] == "ä":
            buf[c] = "a"
        elif buf[c] == "ö":
            buf[c] = "o"
        elif buf[c] == "ü":
            buf[c] = "u"
        elif buf[c] == "ß":
            buf[c] = "s"
            buf.insert(c + 1, "s")
            subst += 1
        if c < len(buf) - 1:
            if c < len(buf) - 2 and buf[c] == "s" and buf[c + 1] == "c" \
                    and buf[c + 2] == "h":
                buf[c] = "$"
                del buf[c + 1:c + 3]
                subst += 2
            elif buf[c] == "c" and buf[c + 1] == "h":
                buf[c] = "§"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "e" and buf[c + 1] == "i":
                buf[c] = "%"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "i" and buf[c + 1] == "e":
                buf[c] = "&"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "i" and buf[c + 1] == "g":
                buf[c] = "#"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "s" and buf[c + 1] == "t":
                buf[c] = "!"
                del buf[c + 1]
                subst += 1
        c += 1
    return subst


def _de_strip(buf: List[str], subst: int) -> None:
    do_more = True
    while do_more and len(buf) > 3:
        if len(buf) + subst > 5 and "".join(buf[-2:]) == "nd":
            del buf[-2:]
        elif len(buf) + subst > 4 and "".join(buf[-2:]) == "em":
            del buf[-2:]
        elif len(buf) + subst > 4 and "".join(buf[-2:]) == "er":
            del buf[-2:]
        elif buf[-1] == "e":
            del buf[-1]
        elif buf[-1] == "s":
            del buf[-1]
        elif buf[-1] == "n":
            del buf[-1]
        elif buf[-1] == "t":
            del buf[-1]
        else:
            do_more = False


def _de_resubstitute(buf: List[str]) -> None:
    c = 0
    while c < len(buf):
        if buf[c] == "*":
            buf[c] = buf[c - 1]
        elif buf[c] == "$":
            buf[c] = "s"
            buf[c + 1:c + 1] = ["c", "h"]
        elif buf[c] == "§":
            buf[c] = "c"
            buf.insert(c + 1, "h")
        elif buf[c] == "%":
            buf[c] = "e"
            buf.insert(c + 1, "i")
        elif buf[c] == "&":
            buf[c] = "i"
            buf.insert(c + 1, "e")
        elif buf[c] == "#":
            buf[c] = "i"
            buf.insert(c + 1, "g")
        elif buf[c] == "!":
            buf[c] = "s"
            buf.insert(c + 1, "t")
        c += 1


def german_classic_stem(term: str) -> str:
    """GermanStemmer.stem (de/GermanStemmer.java:46)."""
    term = term.lower()
    if not all(c.isalpha() for c in term):
        return term
    buf = list(term)
    subst = _de_substitute(buf)
    _de_strip(buf, subst)
    # optimize: female plural erin* then re-strip
    if len(buf) > 5 and "".join(buf[-5:]) == "erin*":
        del buf[-1]
        _de_strip(buf, subst)
    if buf and buf[-1] == "z":
        buf[-1] = "x"
    _de_resubstitute(buf)
    # removeParticleDenotion: first "gege" loses its "ge"
    if len(buf) > 4:
        s = "".join(buf)
        idx = s.find("gege", 0, len(s) - 0)
        # reference scans c in [0, len-3): the window must fit
        if 0 <= idx <= len(s) - 4:
            buf = list(s[:idx] + s[idx + 2:])
    return "".join(buf)
