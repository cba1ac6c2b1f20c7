"""Non-English light stemmers (UniNE family) + the English s-stemmer.

Faithful rebuilds of the published light-stemming algorithms the
reference ships in analysis/common:

- German light (Savoy, "Light Stemming Approaches for the French,
  Portuguese, German and Hungarian Languages") — reference
  lucene/analysis/common/.../de/GermanLightStemmer.java: umlaut/accent
  fold, plural step (-ern/-e[mnrs]/-e/-s after a stEnding consonant),
  derivational step (-est/-er/-en/-st).
- French light (same paper) — fr/FrenchLightStemmer.java: the ordered
  suffix cascade (x/s plurals, -issement→-ir, -ateur/-atrice→-er,
  -cateur→-quer, ique/esse/inage/isation/ation/ition, …) and the
  ``norm`` tail (accent fold, adjacent-duplicate-letter collapse,
  -ie/-r/-e/-e strip, final double-letter trim).
- Spanish light (Savoy, CLEF-2001) — es/SpanishLightStemmer.java:
  accent fold then one vowel/plural suffix switch (-os/-as/-es/-o/-a/
  -e, -ces→-z).
- English minimal (Harman s-stemmer) — en/EnglishMinimalStemmer.java:
  plural -s with the -ies→-y and -us/-ss/-[iaoe]es guards.

All four run over token arrays as one Arrow-vectorized pandas UDF per
language (``light_stem_filter``) — same chain-stage shape as
analysis/porter.py; no per-row Python in the hot path beyond the
batched lambda. Stems are pure string functions of the token, so the
operation is embarrassingly parallel and shuffle-free at any scale.
"""

from __future__ import annotations

__all__ = [
    "german_light_stem", "french_light_stem", "spanish_light_stem",
    "english_minimal_stem", "light_stem_filter", "light_stem_col",
    "STEMMERS",
]

_DE_FOLD = str.maketrans(
    "äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu"
)
_DE_ST_END = set("bdfghklmnt")


def german_light_stem(word: str) -> str:
    """GermanLightStemmer.stem (de/GermanLightStemmer.java:66-139)."""
    s = word.translate(_DE_FOLD)
    n = len(s)
    # step 1
    if n > 5 and s.endswith("ern"):
        n -= 3
    elif n > 4 and n >= 2 and s[n - 2] == "e" and s[n - 1] in "mnrs":
        n -= 2
    elif n > 3 and s[n - 1] == "e":
        n -= 1
    elif n > 3 and s[n - 1] == "s" and s[n - 2] in _DE_ST_END:
        n -= 1
    s = s[:n]
    # step 2
    if n > 5 and s.endswith("est"):
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "rn":
        n -= 2
    elif n > 4 and s[n - 2:] == "st" and s[n - 3] in _DE_ST_END:
        n -= 2
    return s[:n]


_ES_FOLD = str.maketrans(
    "àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii"
)


def spanish_light_stem(word: str) -> str:
    """SpanishLightStemmer.stem (es/SpanishLightStemmer.java:63-108)."""
    if len(word) < 5:
        return word
    s = list(word.translate(_ES_FOLD))
    n = len(s)
    last = s[n - 1]
    if last in "oae":
        return "".join(s[: n - 1])
    if last == "s":
        if s[n - 2] == "e" and s[n - 3] == "s" and s[n - 4] == "e":
            return "".join(s[: n - 2])
        if s[n - 2] == "e" and s[n - 3] == "c":
            s[n - 3] = "z"
            return "".join(s[: n - 2])
        if s[n - 2] in "oae":
            return "".join(s[: n - 2])
    return "".join(s)


def english_minimal_stem(word: str) -> str:
    """EnglishMinimalStemmer.stem (en/EnglishMinimalStemmer.java:27-46,
    Harman's s-stemmer)."""
    s = word
    n = len(s)
    if n < 3 or s[n - 1] != "s":
        return s
    c = s[n - 2]
    if c in "us":
        return s
    if c == "e":
        if n > 3 and s[n - 3] == "i" and s[n - 4] not in "ae":
            return s[: n - 3] + "y"
        if s[n - 3] in "iaoe":
            return s
        return s[: n - 1]
    return s[: n - 1]


_FR_FOLD = {
    "à": "a", "á": "a", "â": "a", "ô": "o", "è": "e", "é": "e",
    "ê": "e", "ù": "u", "û": "u", "î": "i", "ç": "c",
}


def _fr_norm(s: list) -> list:
    """FrenchLightStemmer.norm (fr/FrenchLightStemmer.java:229-266)."""
    if len(s) > 4:
        s = [_FR_FOLD.get(c, c) for c in s]
        # collapse runs of the same letter to one occurrence
        out = []
        prev = None
        for c in s:
            if c == prev and c.isalpha():
                continue
            out.append(c)
            prev = c
        s = out
    if len(s) > 4 and s[-2:] == ["i", "e"]:
        s = s[:-2]
    if len(s) > 4:
        if s[-1] == "r":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2] and s[-1].isalpha():
            s = s[:-1]
    return s


def french_light_stem(word: str) -> str:
    """FrenchLightStemmer.stem (fr/FrenchLightStemmer.java:66-227): the
    ordered suffix cascade, then ``norm``."""
    s = list(word)

    def ends(suf: str) -> bool:
        return len(s) >= len(suf) and "".join(s[-len(suf):]) == suf

    n = len(s)
    if n > 5 and s[n - 1] == "x":
        if s[n - 3] == "a" and s[n - 2] == "u" and s[n - 4] != "e":
            s[n - 2] = "l"
        s = s[:-1]
    if len(s) > 3 and s[-1] == "x":
        s = s[:-1]
    if len(s) > 3 and s[-1] == "s":
        s = s[:-1]

    if len(s) > 9 and ends("issement"):
        s = s[:-6]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 8 and ends("issant"):
        s = s[:-4]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 6 and ends("ement"):
        s = s[:-4]
        if len(s) > 3 and ends("ive"):
            s = s[:-1]
            s[-1] = "f"
        return "".join(_fr_norm(s))
    if len(s) > 11 and ends("ficatrice"):
        s = s[:-5]
        s[-2], s[-1] = "e", "r"
        return "".join(_fr_norm(s))
    if len(s) > 10 and ends("ficateur"):
        s = s[:-4]
        s[-2], s[-1] = "e", "r"
        return "".join(_fr_norm(s))
    if len(s) > 9 and ends("catrice"):
        s = s[:-3]
        s[-4], s[-3], s[-2] = "q", "u", "e"
        return "".join(_fr_norm(s))
    if len(s) > 8 and ends("cateur"):
        s = s[:-2]
        s[-4], s[-3], s[-2], s[-1] = "q", "u", "e", "r"
        return "".join(_fr_norm(s))
    if len(s) > 8 and ends("atrice"):
        s = s[:-4]
        s[-2], s[-1] = "e", "r"
        return "".join(_fr_norm(s))
    if len(s) > 7 and ends("ateur"):
        s = s[:-3]
        s[-2], s[-1] = "e", "r"
        return "".join(_fr_norm(s))
    if len(s) > 6 and ends("trice"):  # falls through (no return)
        s = s[:-1]
        s[-3], s[-2], s[-1] = "e", "u", "r"
    if len(s) > 5 and ends("ième"):
        return "".join(_fr_norm(s[:-4]))
    if len(s) > 7 and ends("teuse"):
        s = s[:-2]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 6 and ends("teur"):
        s = s[:-1]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 5 and ends("euse"):
        return "".join(_fr_norm(s[:-2]))
    if len(s) > 8 and ends("ère"):
        s = s[:-1]
        s[-2] = "e"
        return "".join(_fr_norm(s))
    if len(s) > 7 and ends("ive"):
        s = s[:-1]
        s[-1] = "f"
        return "".join(_fr_norm(s))
    if len(s) > 4 and (ends("folle") or ends("molle")):
        s = s[:-2]
        s[-1] = "u"
        return "".join(_fr_norm(s))
    if len(s) > 9 and ends("nnelle"):
        return "".join(_fr_norm(s[:-5]))
    if len(s) > 9 and ends("nnel"):
        return "".join(_fr_norm(s[:-3]))
    if len(s) > 4 and ends("ète"):  # falls through (no return)
        s = s[:-1]
        s[-2] = "e"
    if len(s) > 8 and ends("ique"):  # falls through (no return)
        s = s[:-4]
    if len(s) > 8 and ends("esse"):
        return "".join(_fr_norm(s[:-3]))
    if len(s) > 7 and ends("inage"):
        return "".join(_fr_norm(s[:-3]))
    if len(s) > 9 and ends("isation"):
        s = s[:-7]
        if len(s) > 5 and ends("ual"):
            s[-2] = "e"
        return "".join(_fr_norm(s))
    if len(s) > 9 and ends("isateur"):
        return "".join(_fr_norm(s[:-7]))
    if len(s) > 8 and ends("ation"):
        return "".join(_fr_norm(s[:-5]))
    if len(s) > 8 and ends("ition"):
        return "".join(_fr_norm(s[:-5]))
    return "".join(_fr_norm(s))


STEMMERS = {
    "de": german_light_stem,
    "fr": french_light_stem,
    "es": spanish_light_stem,
    "en_minimal": english_minimal_stem,
}


def light_stem_filter(tokens_col, lang: str):
    """Column[array<string>] → per-language light-stemmed array,
    Arrow-vectorized ({German,French,Spanish}LightStemFilter /
    EnglishMinimalStemFilter chain-stage analog)."""
    from pyspark.sql import functions as F

    try:
        stem = STEMMERS[lang]
    except KeyError:
        raise ValueError(
            f"unknown light stemmer {lang!r} (have {sorted(STEMMERS)})"
        ) from None

    def _stem(arrs):
        return arrs.map(
            lambda toks: [stem(t) for t in toks]
            if toks is not None
            else None
        )

    return F.pandas_udf(_stem, "array<string>")(tokens_col)


def light_stem_col(term_col, lang: str):
    """Column[string] → stemmed string, Arrow-vectorized (the scalar
    per-term form of ``light_stem_filter``)."""
    from pyspark.sql import functions as F

    try:
        stem = STEMMERS[lang]
    except KeyError:
        raise ValueError(
            f"unknown light stemmer {lang!r} (have {sorted(STEMMERS)})"
        ) from None

    def _stem(col):
        return col.map(lambda t: stem(t) if t is not None else None)

    return F.pandas_udf(_stem, "string")(term_col)
