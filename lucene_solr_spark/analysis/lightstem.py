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
- Russian light (Dolamic & Savoy) — ru/RussianLightStemmer.java,
  Italian/Swedish/Finnish light (Savoy CLEF-2001/2003) —
  it/ItalianLightStemmer.java, sv/SwedishLightStemmer.java,
  fi/FinnishLightStemmer.java (incl. the k/p/t gemination collapse),
  Portuguese/Hungarian light (Savoy UniNE) —
  pt/PortugueseLightStemmer.java (plural/feminine normalization,
  accent fold LAST), hu/HungarianLightStemmer.java
  (case → possessive → plural → vowel-drop cascade). Every stemmer is
  verified mismatch-free against the reference's FULL published test
  vocabulary (312k pairs total across the nine light languages).
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
    "english_minimal_stem", "russian_light_stem", "italian_light_stem",
    "swedish_light_stem", "portuguese_light_stem",
    "hungarian_light_stem", "finnish_light_stem",
    "german_minimal_stem", "french_minimal_stem",
    "light_stem_filter", "light_stem_col", "STEMMERS",
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


def _register_more() -> None:
    """ru/it/sv/pt/hu/fi join the registry after their defs below;
    called at module bottom."""
    STEMMERS.update({
        "ru": russian_light_stem,
        "it": italian_light_stem,
        "sv": swedish_light_stem,
        "pt": portuguese_light_stem,
        "hu": hungarian_light_stem,
        "fi": finnish_light_stem,
        "de_minimal": german_minimal_stem,
        "fr_minimal": french_minimal_stem,
    })
    from .rslp import (
        galician_rslp_minimal_stem,
        galician_rslp_stem,
        portuguese_rslp_minimal_stem,
        portuguese_rslp_stem,
    )

    STEMMERS.update({
        "pt_rslp": portuguese_rslp_stem,
        "pt_rslp_minimal": portuguese_rslp_minimal_stem,
        "gl_rslp": galician_rslp_stem,
        "gl_rslp_minimal": galician_rslp_minimal_stem,
    })
    from .sorani import sorani_normalize_stem

    STEMMERS["ckb"] = sorani_normalize_stem
    from .porter import porter_stem

    STEMMERS["en_porter"] = porter_stem
    from .porter2 import porter2_stem

    STEMMERS["en_porter2"] = porter2_stem
    from .snowball_scandi import danish_stem, norwegian_stem, swedish_stem

    STEMMERS.update({
        "da_snowball": danish_stem,
        "no_snowball": norwegian_stem,
        "sv_snowball": swedish_stem,
    })
    from .snowball_german import german_snowball_stem

    STEMMERS["de_snowball"] = german_snowball_stem
    from .snowball_russian import russian_snowball_stem

    STEMMERS["ru_snowball"] = russian_snowball_stem
    from .snowball_spanish import spanish_snowball_stem

    STEMMERS["es_snowball"] = spanish_snowball_stem
    from .snowball_italian import italian_snowball_stem

    STEMMERS["it_snowball"] = italian_snowball_stem
    from .snowball_portuguese import portuguese_snowball_stem

    STEMMERS["pt_snowball"] = portuguese_snowball_stem
    from .snowball_french import french_snowball_stem

    STEMMERS["fr_snowball"] = french_snowball_stem
    from .snowball_dutch import dutch_snowball_stem

    STEMMERS["nl_snowball"] = dutch_snowball_stem
    from .snowball_romanian import romanian_snowball_stem

    STEMMERS["ro_snowball"] = romanian_snowball_stem
    from .snowball_hungarian import hungarian_snowball_stem

    STEMMERS["hu_snowball"] = hungarian_snowball_stem
    from .snowball_german2 import german2_snowball_stem

    STEMMERS["de_snowball2"] = german2_snowball_stem
    from .snowball_finnish import finnish_snowball_stem

    STEMMERS["fi_snowball"] = finnish_snowball_stem
    from .snowball_porter import snowball_porter_stem

    STEMMERS["en_snowball_porter"] = snowball_porter_stem
    from .snowball_lovins import lovins_stem

    STEMMERS["en_lovins"] = lovins_stem
    from .snowball_arabic import arabic_snowball_stem

    STEMMERS["ar_snowball"] = arabic_snowball_stem
    from .snowball_turkish import turkish_snowball_stem

    STEMMERS["tr_snowball"] = turkish_snowball_stem
    from .snowball_kp import kp_stem

    STEMMERS["nl_kp"] = kp_stem
    from .brazilian import brazilian_stem, german_classic_stem

    STEMMERS["br"] = brazilian_stem
    STEMMERS["de_classic"] = german_classic_stem
    from .snowball_armenian import armenian_snowball_stem
    from .snowball_basque import basque_snowball_stem
    from .snowball_catalan import catalan_snowball_stem
    from .snowball_irish import irish_snowball_stem
    from .snowball_lithuanian import lithuanian_snowball_stem

    STEMMERS.update({
        "hy_snowball": armenian_snowball_stem,
        "eu_snowball": basque_snowball_stem,
        "ca_snowball": catalan_snowball_stem,
        "ga_snowball": irish_snowball_stem,
        "lt_snowball": lithuanian_snowball_stem,
    })
    STEMMERS["nb_light"] = norwegian_bokmaal_light_stem
    STEMMERS["nn_light"] = norwegian_nynorsk_light_stem
    STEMMERS["nb_minimal"] = norwegian_bokmaal_minimal_stem
    STEMMERS["nn_minimal"] = norwegian_nynorsk_minimal_stem
    from . import langstem

    STEMMERS["cs"] = langstem.czech_stem
    STEMMERS["bg"] = langstem.bulgarian_stem
    STEMMERS["lv"] = langstem.latvian_stem
    STEMMERS["hi"] = langstem.hindi_stem
    STEMMERS["hi_norm"] = langstem.hindi_normalize
    STEMMERS["bn"] = langstem.bengali_stem
    STEMMERS["bn_norm"] = langstem.bengali_normalize
    STEMMERS["ar_light"] = langstem.arabic_light_stem
    STEMMERS["ar_norm"] = langstem.arabic_normalize
    STEMMERS["fa_norm"] = langstem.persian_normalize
    STEMMERS["sr_norm"] = langstem.serbian_normalize
    STEMMERS["ga_lower"] = langstem.irish_lowercase
    STEMMERS["id"] = langstem.indonesian_stem
    STEMMERS["id_inflectional"] = langstem.indonesian_inflectional_stem
    from .greek import greek_lowercase, greek_stem

    STEMMERS["el_lower"] = greek_lowercase
    STEMMERS["el"] = lambda w: greek_stem(greek_lowercase(w))
    from .kstem import kstem_stem

    STEMMERS["en_kstem"] = kstem_stem
    from .stempel import stempel_polish_stem

    STEMMERS["pl"] = stempel_polish_stem


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


# ------------------------------------------------------------- Russian

_RU_CASE_4 = ("иями", "оями")
_RU_CASE_3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его",
              "ему", "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_CASE_2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию",
              "ьв", "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей",
              "ём", "ев", "ий", "им", "ое", "ой", "ом", "ов", "ые",
              "ый", "ым", "ми")


def russian_light_stem(word: str) -> str:
    """RussianLightStemmer.stem (ru/RussianLightStemmer.java:66-151,
    Dolamic & Savoy, "Indexing and Searching Strategies for the
    Russian Language")."""
    s = word
    n = len(s)
    # removeCase
    if n > 6 and s.endswith(_RU_CASE_4):
        n -= 4
    elif n > 5 and s[:n].endswith(_RU_CASE_3):
        n -= 3
    elif n > 4 and s[:n].endswith(_RU_CASE_2):
        n -= 2
    elif n > 3 and s[n - 1] in "аеиоуйыяь":
        n -= 1
    s = s[:n]
    # normalize
    if n > 3:
        if s[n - 1] in "ьи":
            n -= 1
        elif s[n - 1] == "н" and s[n - 2] == "н":
            n -= 1
    return s[:n]


# ------------------------------------------------------------- Italian

_IT_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def italian_light_stem(word: str) -> str:
    """ItalianLightStemmer.stem (it/ItalianLightStemmer.java:62-116,
    Savoy CLEF-2001)."""
    if len(word) < 6:
        return word
    s = word.translate(_IT_FOLD)
    n = len(s)
    last, prev = s[n - 1], s[n - 2]
    if last == "e":
        return s[: n - 2] if prev in "ih" else s[: n - 1]
    if last == "i":
        return s[: n - 2] if prev in "hi" else s[: n - 1]
    if last == "a":
        return s[: n - 2] if prev == "i" else s[: n - 1]
    if last == "o":
        return s[: n - 2] if prev == "i" else s[: n - 1]
    return s


# ------------------------------------------------------------- Swedish

def swedish_light_stem(word: str) -> str:
    """SwedishLightStemmer.stem (sv/SwedishLightStemmer.java:66-110,
    Savoy CLEF-2003)."""
    s = word
    n = len(s)
    if n > 4 and s[n - 1] == "s":
        n -= 1
    t = s[:n]
    if n > 7 and (t.endswith("elser") or t.endswith("heten")):
        return t[: n - 5]
    if n > 6 and t.endswith(
        ("arne", "erna", "ande", "else", "aste", "orna", "aren")
    ):
        return t[: n - 4]
    if n > 5 and t.endswith(("are", "ast", "het")):
        return t[: n - 3]
    if n > 4 and t.endswith(("ar", "er", "or", "en", "at", "te", "et")):
        return t[: n - 2]
    if n > 3 and t[n - 1] in "taen":
        return t[: n - 1]
    return t


# ---------------------------------------------------------- Portuguese

_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaoooooeeeeuuuuiiiic")


def _pt_remove_suffix(s: list) -> list:
    n = len(s)

    def ends(suf):
        return n >= len(suf) and "".join(s[n - len(suf):n]) == suf

    if n > 4 and ends("es") and s[n - 3] in "rslz":
        return s[: n - 2]
    if n > 3 and ends("ns"):
        s[n - 2] = "m"
        return s[: n - 1]
    if n > 4 and (ends("eis") or ends("éis")):
        s[n - 3] = "e"
        s[n - 2] = "l"
        return s[: n - 1]
    if n > 4 and ends("ais"):
        s[n - 2] = "l"
        return s[: n - 1]
    if n > 4 and ends("óis"):
        s[n - 3] = "o"
        s[n - 2] = "l"
        return s[: n - 1]
    if n > 4 and ends("is"):
        s[n - 1] = "l"
        return s
    if n > 3 and (ends("ões") or ends("ães")):
        s = s[: n - 1]
        s[n - 3] = "ã"
        s[n - 2] = "o"
        return s
    if n > 6 and ends("mente"):
        return s[: n - 5]
    if n > 3 and s[n - 1] == "s":
        return s[: n - 1]
    return s


def _pt_norm_feminine(s: list) -> list:
    n = len(s)

    def ends(suf):
        return n >= len(suf) and "".join(s[n - len(suf):n]) == suf

    if n > 7 and (ends("inha") or ends("iaca") or ends("eira")):
        s[n - 1] = "o"
        return s
    if n > 6:
        if (ends("osa") or ends("ica") or ends("ida") or ends("ada")
                or ends("iva") or ends("ama")):
            s[n - 1] = "o"
            return s
        if ends("ona"):
            s[n - 3] = "ã"
            s[n - 2] = "o"
            return s[: n - 1]
        if ends("ora"):
            return s[: n - 1]
        if ends("esa"):
            s[n - 3] = "ê"
            return s[: n - 1]
        if ends("na"):
            s[n - 1] = "o"
            return s
    return s


def portuguese_light_stem(word: str) -> str:
    """PortugueseLightStemmer.stem (pt/PortugueseLightStemmer.java:
    66-205, Savoy UniNE — note the accent fold runs LAST, after the
    suffix steps, unlike de/es)."""
    if len(word) < 4:
        return word
    s = list(word)
    s = _pt_remove_suffix(s)
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in "eao":
        s = s[:-1]
    return "".join(s).translate(_PT_FOLD)


# ----------------------------------------------------------- Hungarian

_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")
_HU_VOWELS = set("aeiouy")


def _hu_remove_case(s: str) -> str:
    n = len(s)
    if n > 6 and s.endswith("kent"):
        return s[: n - 4]
    if n > 5:
        if s.endswith(("nak", "nek", "val", "vel", "ert", "rol", "ban",
                       "ben", "bol", "nal", "nel", "hoz", "hez", "tol")):
            return s[: n - 3]
        if s.endswith(("al", "el")):
            if s[n - 3] not in _HU_VOWELS and s[n - 3] == s[n - 4]:
                return s[: n - 3]
    if n > 4:
        if s.endswith(("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                       "be", "ul", "ig")):
            return s[: n - 2]
        if s.endswith(("on", "en")) and s[n - 3] not in _HU_VOWELS:
            return s[: n - 2]
        if s[n - 1] in "tn":
            return s[: n - 1]
        if s[n - 1] in "ae" and s[n - 2] == s[n - 3] \
                and s[n - 2] not in _HU_VOWELS:
            return s[: n - 2]
    return s


def _hu_remove_possessive(s: str) -> str:
    n = len(s)
    if n > 6:
        if s[n - 5] not in _HU_VOWELS and s.endswith(
            ("atok", "otok", "etek")
        ):
            return s[: n - 4]
        if s.endswith(("itek", "itok")):
            return s[: n - 4]
    if n > 5:
        if s[n - 4] not in _HU_VOWELS and s.endswith(
            ("unk", "tok", "tek")
        ):
            return s[: n - 3]
        if s[n - 4] in _HU_VOWELS and s.endswith("juk"):
            return s[: n - 3]
        if s.endswith("ink"):
            return s[: n - 3]
    if n > 4:
        if s[n - 3] not in _HU_VOWELS and s.endswith(
            ("am", "em", "om", "ad", "ed", "od", "uk")
        ):
            return s[: n - 2]
        if s[n - 3] in _HU_VOWELS and s.endswith(("nk", "ja", "je")):
            return s[: n - 2]
        if s.endswith(("im", "id", "ik")):
            return s[: n - 2]
    if n > 3:
        if s[n - 1] in "ae" and s[n - 2] not in _HU_VOWELS:
            return s[: n - 1]
        if s[n - 1] in "md" and s[n - 2] in _HU_VOWELS:
            return s[: n - 1]
        if s[n - 1] == "i":
            return s[: n - 1]
    return s


def _hu_remove_plural(s: str) -> str:
    n = len(s)
    if n > 3 and s[n - 1] == "k":
        if s[n - 2] in "aoe" and n > 4:
            return s[: n - 2]
        return s[: n - 1]
    return s


def hungarian_light_stem(word: str) -> str:
    """HungarianLightStemmer.stem (hu/HungarianLightStemmer.java:
    65-238, Savoy UniNE)."""
    s = word.translate(_HU_FOLD)
    s = _hu_remove_case(s)
    s = _hu_remove_possessive(s)
    s = _hu_remove_plural(s)
    if len(s) > 3 and s[-1] in "aeio":
        s = s[:-1]
    return s


# ------------------------------------------------------------- Finnish

_FI_FOLD = str.maketrans("äåö", "aao")
_FI_VOWELS = set("aeiouy")


def _fi_step1(s: str) -> str:
    n = len(s)
    if n > 8:
        if s.endswith("kin"):
            return _fi_step1(s[: n - 3])
        if s.endswith("ko"):
            return _fi_step1(s[: n - 2])
    if n > 11:
        if s.endswith("dellinen"):
            return s[: n - 8]
        if s.endswith("dellisuus"):
            return s[: n - 9]
    return s


def _fi_step2(s: str) -> str:
    n = len(s)
    if n > 5:
        if s.endswith(("lla", "tse", "sti")):
            return s[: n - 3]
        if s.endswith("ni"):
            return s[: n - 2]
        if s.endswith("aa"):
            return s[: n - 1]
    return s


def _fi_step3(s: str) -> str:
    t = list(s)
    n = len(t)
    if n > 8:
        if s.endswith("nnen"):
            t[n - 4] = "s"
            return "".join(t[: n - 3])
        if s.endswith("ntena"):
            t[n - 5] = "s"
            return "".join(t[: n - 4])
        if s.endswith("tten"):
            return s[: n - 4]
        if s.endswith("eiden"):
            return s[: n - 5]
    if n > 6:
        if s.endswith(("neen", "niin", "seen", "teen", "inen")):
            return s[: n - 4]
        if t[n - 3] == "h" and t[n - 2] in _FI_VOWELS and t[n - 1] == "n":
            return s[: n - 3]
        if s.endswith("den"):
            t[n - 3] = "s"
            return "".join(t[: n - 2])
        if s.endswith("ksen"):
            t[n - 4] = "s"
            return "".join(t[: n - 3])
        if s.endswith(("ssa", "sta", "lla", "lta", "tta", "ksi", "lle")):
            return s[: n - 3]
    if n > 5:
        if s.endswith(("na", "ne")):
            return s[: n - 2]
        if s.endswith("nei"):
            return s[: n - 3]
    if n > 4:
        if s.endswith(("ja", "ta")):
            return s[: n - 2]
        if t[n - 1] == "a":
            return s[: n - 1]
        if t[n - 1] == "n" and t[n - 2] in _FI_VOWELS:
            return s[: n - 2]
        if t[n - 1] == "n":
            return s[: n - 1]
    return s


def _fi_norm1(s: str) -> str:
    t = list(s)
    n = len(t)
    if n > 5 and s.endswith("hde"):
        t[n - 3], t[n - 2], t[n - 1] = "k", "s", "i"
        s = "".join(t)
    if n > 4 and (s.endswith("ei") or s.endswith("at")):
        return s[: n - 2]
    if n > 3 and s[n - 1] in "tsjeai":
        return s[: n - 1]
    return s


def _fi_norm2(s: str) -> str:
    t = list(s)
    n = len(t)
    if n > 8 and t[n - 1] in "eou":
        n -= 1
    if n > 4:
        if t[n - 1] == "i":
            n -= 1
        if n > 4:
            ch = t[0]
            i = 1
            while i < n:
                if t[i] == ch and ch in "kpt":
                    del t[i]
                    n -= 1
                else:
                    ch = t[i]
                    i += 1
    return "".join(t[:n])


def finnish_light_stem(word: str) -> str:
    """FinnishLightStemmer.stem (fi/FinnishLightStemmer.java:66-254,
    Savoy CLEF-2003)."""
    if len(word) < 4:
        return word
    s = word.translate(_FI_FOLD)
    s = _fi_step1(s)
    s = _fi_step2(s)
    s = _fi_step3(s)
    s = _fi_norm1(s)
    s = _fi_norm2(s)
    return s



# ---------------------------------------------------- minimal stemmers

_DE_MIN_FOLD = str.maketrans("äöü", "aou")


def german_minimal_stem(word: str) -> str:
    """GermanMinimalStemmer.stem (de/GermanMinimalStemmer.java:64-94,
    Savoy "Morphologie et recherche d'information")."""
    if len(word) < 5:
        return word
    s = word.translate(_DE_MIN_FOLD)
    n = len(s)
    if n > 6 and s.endswith("nen"):
        return s[: n - 3]
    if n > 5 and s.endswith(("en", "se", "es", "er")):
        return s[: n - 2]
    if s[n - 1] in "nesr":
        return s[: n - 1]
    return s


def french_minimal_stem(word: str) -> str:
    """FrenchMinimalStemmer.stem (fr/FrenchMinimalStemmer.java:63-79,
    Savoy stopword-list paper): x (with aux→al), then cascading
    s/r/e/é strips and a final double-letter trim."""
    if len(word) < 6:
        return word
    s = list(word)
    n = len(s)
    if s[n - 1] == "x":
        if s[n - 3] == "a" and s[n - 2] == "u":
            s[n - 2] = "l"
        return "".join(s[: n - 1])
    if s[n - 1] == "s":
        n -= 1
    if s[n - 1] == "r":
        n -= 1
    if s[n - 1] == "e":
        n -= 1
    if s[n - 1] == "é":
        n -= 1
    if s[n - 1] == s[n - 2]:
        n -= 1
    return "".join(s[:n])


# ------------------------------------------- Norwegian (Bokmål/Nynorsk)

def _no_light(word: str, bm: bool, nn: bool) -> str:
    """NorwegianLightStemmer.stem (no/NorwegianLightStemmer.java:
    75-137): genitive -s, then the longest matching ending from the
    dialect-gated cascade (heter/heita … a/e/n)."""
    s = word
    n = len(s)
    if n > 4 and s[-1] == "s":
        s = s[:-1]
        n -= 1
    if n > 7 and ((bm and s.endswith(("heter", "heten")))
                  or (nn and s.endswith("heita"))):
        return s[:n - 5]
    if n > 8 and nn and s.endswith(("heiter", "leiken", "leikar")):
        return s[:n - 6]
    if n > 5 and (s.endswith("dom") or (bm and s.endswith("het"))):
        return s[:n - 3]
    if n > 6 and nn and s.endswith(("heit", "semd", "leik")):
        return s[:n - 4]
    if n > 7 and s.endswith(("elser", "elsen")):
        return s[:n - 5]
    if n > 6 and ((bm and s.endswith(("ende", "este", "eren")))
                  or (nn and s.endswith(("ande", "aste", "aren")))
                  or s.endswith("else")):
        return s[:n - 4]
    if n > 5 and ((bm and s.endswith(("ere", "est")))
                  or (nn and s.endswith(("are", "ast", "ane")))
                  or s.endswith("ene")):
        return s[:n - 3]
    if n > 4 and (s.endswith(("er", "en", "et", "te"))
                  or (nn and s.endswith("ar"))
                  or (bm and s.endswith("st"))):
        return s[:n - 2]
    if n > 3 and s[-1] in "aen":
        return s[:n - 1]
    return s


def _no_minimal(word: str, bm: bool, nn: bool) -> str:
    """NorwegianMinimalStemmer.stem (no/NorwegianMinimalStemmer.java:
    73-102): genitive -s, plural/definite endings, final a/e."""
    s = word
    n = len(s)
    if n > 4 and s[-1] == "s":
        s = s[:-1]
        n -= 1
    if n > 5 and (s.endswith("ene") or (nn and s.endswith("ane"))):
        return s[:n - 3]
    if n > 4 and (s.endswith(("er", "en", "et"))
                  or (nn and s.endswith("ar"))):
        return s[:n - 2]
    if n > 3 and s[-1] in "ae":
        return s[:n - 1]
    return s


def norwegian_bokmaal_light_stem(word: str) -> str:
    return _no_light(word, True, False)


def norwegian_nynorsk_light_stem(word: str) -> str:
    return _no_light(word, False, True)


def norwegian_bokmaal_minimal_stem(word: str) -> str:
    return _no_minimal(word, True, False)


def norwegian_nynorsk_minimal_stem(word: str) -> str:
    return _no_minimal(word, False, True)


_register_more()
