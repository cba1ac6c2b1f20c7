"""Phonetic encoding — the lucene/analysis/phonetic module analog.

Reference: lucene/analysis/phonetic/src/java/org/apache/lucene/
analysis/phonetic/PhoneticFilter.java wrapping commons-codec encoders
(Soundex and friends); terms are replaced (or augmented) by their
phonetic code so spelling variants collide.

Spark surface: American Soundex — engine-side it is the built-in
``F.soundex`` (JVM codegen, commons-codec semantics: h/w transparent
to the duplicate rule, vowels reset it, the first letter's code
suppresses an equal following code). This module carries the
independent pure-Python implementation used to materialize the
vocabulary→code fixture the DuckDB oracle joins (the Porter-fixture
pattern — the oracle engine has no soundex), golden-tested against
the published examples AND asserted equal to ``F.soundex`` over the
whole corpus vocabulary in tests/test_filters.py."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "soundex", "soundex_col", "ENCODERS", "phonetic_filter_tokens",
    "phonetic_filter_col", "dm_soundex_filter_tokens",
    "dm_soundex_filter_col", "phonetic_code_col",
]

_MAP = {
    **{c: "1" for c in "bfpv"},
    **{c: "2" for c in "cgjkqsxz"},
    **{c: "3" for c in "dt"},
    "l": "4",
    **{c: "5" for c in "mn"},
    "r": "6",
}


def soundex(term: str) -> str:
    """American Soundex, commons-codec variant (matches F.soundex):
    Robert→R163, Ashcraft→A261, Tymczak→T522, Pfister→P236,
    Honeyman→H555. Non-alphabetic-initial input passes through."""
    t = term.strip()
    if not t or not t[0].isalpha():
        return t
    out = t[0].upper()
    last = _MAP.get(t[0].lower(), "")
    for ch in t[1:].lower():
        if ch in "hw":
            continue
        code = _MAP.get(ch)
        if code:
            if code != last:
                out += code
            last = code
        else:
            last = ""
        if len(out) == 4:
            break
    return (out + "000")[:4]


def soundex_col(col) -> Column:
    """Engine-side encoder: the JVM built-in."""
    return F.soundex(col if isinstance(col, Column) else F.col(col))


# ------------------------------------------------ the encoder registry
# PhoneticFilterFactory.java:96-105 name registry ("Caverphone" is
# registered as the 2.0 revision, like the reference).
def _encoders() -> dict:
    from .encoders import (
        caverphone2, cologne_phonetic, double_metaphone, metaphone,
        nysiis, refined_soundex,
    )

    return {
        "Metaphone": metaphone,
        "DoubleMetaphone": double_metaphone,
        "Soundex": soundex,
        "RefinedSoundex": refined_soundex,
        "Caverphone": caverphone2,
        "Caverphone2": caverphone2,
        "ColognePhonetic": cologne_phonetic,
        "Nysiis": nysiis,
    }


class _Lazy(dict):
    def __missing__(self, k):
        if not self:
            self.update(_encoders())
        if k in self:
            return dict.__getitem__(self, k)
        raise KeyError(k)


ENCODERS: dict = _Lazy()


def phonetic_filter_tokens(tokens: list, encoder: str = "Metaphone",
                           inject: bool = True) -> list:
    """PhoneticFilter semantics (PhoneticFilter.java:53-92): empty or
    identical codes pass the token through; with inject=true the code
    is emitted FIRST, then the original (the reference returns the
    phonetic alternative first to avoid a double captureState)."""
    enc = ENCODERS[encoder]
    out = []
    for t in tokens:
        if not t:
            out.append(t)
            continue
        try:
            code = enc(t.upper() if encoder == "Soundex" else t)
        except Exception:
            code = ""
        if not code or code == t:
            out.append(t)
        elif inject:
            out.append(code)
            out.append(t)
        else:
            out.append(code)
    return out


def phonetic_filter_col(tokens_col, encoder: str = "Metaphone",
                        inject: bool = True) -> Column:
    """Column[array<string>] → phonetic-filtered token array."""
    ENCODERS[encoder]  # fail fast on unknown names

    def _f(col):
        return col.map(
            lambda toks: None if toks is None
            else phonetic_filter_tokens(list(toks), encoder, inject)
        )

    return F.pandas_udf(_f, "array<string>")(
        tokens_col if isinstance(tokens_col, Column) else F.col(tokens_col)
    )


def dm_soundex_filter_tokens(tokens: list, inject: bool = True) -> list:
    """DaitchMokotoffSoundexFilter semantics
    (DaitchMokotoffSoundexFilter.java:64-92): original (inject) or the
    first branch code, then the remaining branch codes as same-position
    synonyms; tokens with no codeable letters pass through (the
    filter's pinned behavior for non-convertible tokens)."""
    from .encoders import daitch_mokotoff

    out = []
    for t in tokens:
        if not t or not any("a" <= c <= "z" for c in t.lower()):
            out.append(t)
            continue
        codes = daitch_mokotoff(t)
        if inject:
            out.append(t)
            out.extend(codes)
        else:
            out.extend(codes)
    return out


def dm_soundex_filter_col(tokens_col, inject: bool = True) -> Column:
    def _f(col):
        return col.map(
            lambda toks: None if toks is None
            else dm_soundex_filter_tokens(list(toks), inject)
        )

    return F.pandas_udf(_f, "array<string>")(
        tokens_col if isinstance(tokens_col, Column) else F.col(tokens_col)
    )


def phonetic_code_col(encoder_col, term_col) -> Column:
    """(encoder-name, term) → raw code string, Arrow-vectorized; the
    driver-gate path over the frozen commons-codec fixture.  Encoder
    names here are the fixture's row tags (incl. dmeta/dmeta_alt and
    |-joined daitch_mokotoff), not the factory registry names."""

    def _dispatch():
        from .encoders import (
            caverphone2, cologne_phonetic, daitch_mokotoff,
            double_metaphone, double_metaphone_alternate, metaphone,
            nysiis, refined_soundex,
        )

        return {
            "metaphone": metaphone,
            "dmeta": double_metaphone,
            "dmeta_alt": double_metaphone_alternate,
            "refined_soundex": refined_soundex,
            "caverphone2": caverphone2,
            "cologne": cologne_phonetic,
            "nysiis": nysiis,
            "daitch_mokotoff": lambda w: "|".join(daitch_mokotoff(w)),
        }

    def _f(enc_col, t_col):
        fns = _dispatch()
        return [fns[e](t) for e, t in zip(enc_col, t_col)]

    def _wrap(enc_col, t_col):
        import pandas as pd

        return pd.Series(_f(enc_col, t_col))

    return F.pandas_udf(_wrap, "string")(
        encoder_col if isinstance(encoder_col, Column)
        else F.col(encoder_col),
        term_col if isinstance(term_col, Column) else F.col(term_col),
    )
