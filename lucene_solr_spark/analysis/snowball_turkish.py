"""Snowball Turkish stemmer.

Reference: the generated org/tartarus/snowball/ext/TurkishStemmer.java
in the reference repo; algorithm = the published Snowball Turkish
stemmer by Evren (Kapusuz) Cilden
(snowballstem.org/algorithms/turkish/stemmer.html).

Shape of the algorithm (all suffix work is backwards from the end):

  gate       — at least two vowels, else the word is left alone.
  verb pass  — strip one chained nominal-verb suffix group
               (ymUs_/yDU/ysA/yken | cAsInA…ymUs_ | lAr+copula |
               nUz+past | person+ymUs_ | DUr+chain); the bare-lAr
               branch clears `continue_stemming_noun_suffixes`,
               which skips the noun pass AND the postlude.
  noun pass  — first matching case/possessive chain wins, each
               optionally recursing through the ki-chain
               (…deki/…nunki/…ndaki), which re-enters case suffix
               stripping before the 'ki'.
  postlude   — unless the stem is a reserved word (ad/soyad):
               a final d/g gains the harmony vowel (kitaplığ→…ğı
               style), then a final b/c/d/ğ devoices to p/ç/t/k.

Faithfulness notes (verified against the generated code, not the
paper description):

  * every mark_* checks vowel harmony over the WHOLE remaining
    prefix+suffix (two harmonizing vowels required), except
    lArI/sUnUz/cAsInA/ysA/ki/yken which skip the check;
  * optional-consonant attachment: either `<c>` preceded by a vowel
    (the consonant is consumed) or a non-`<c>` char whose PRECEDING
    char is a vowel (nothing consumed) — otherwise the whole mark
    fails, with no retry of a shorter among entry;
  * saved cursors are end-relative, so a `try` whose tail fails
    KEEPS any deletions already made inside it;
  * the ndA/nA and ndAn/nU branches recurse into the ki-chain
    mid-string (their own suffix is only marked, not deleted), so
    the chain deletes a middle segment — handled here by splitting
    head/tail;
  * the (ndAn|nU)+lArI path matches without deleting anything
    (mirrors the generated code exactly).

Suffix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py); verified mismatch-free against the
reference's full Snowball Turkish vocabulary. Pure str→str.
"""

from __future__ import annotations

import json
import os

__all__ = ["turkish_snowball_stem"]

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["turkish"]


def _bylen(key):
    return tuple(sorted(
        (e[0] for e in _T[key]), key=len, reverse=True))


_VOWELS = set("aeıioöuü")
_GU = set("ıiuü")
# vowel harmony: last vowel -> chars an earlier-in-the-word vowel may
# be drawn from (the scan skips everything outside the set)
_HARM = {
    "a": set("aoıu"), "e": set("eiöü"),
    "ı": set("aı"), "i": set("ei"),
    "o": set("ou"), "ö": set("öü"),
    "u": set("ou"), "ü": set("öü"),
}

_POSS = _bylen("a_0")          # m n mIz nIz
_LARI = _bylen("a_1")          # leri ları
_NU = _bylen("a_2")            # nI
_NUN = _bylen("a_3")           # In
_YA = _bylen("a_4")            # a e
_NA = _bylen("a_5")            # na ne
_DA = _bylen("a_6")            # da ta de te
_NDA = _bylen("a_7")           # nda nde
_DAN = _bylen("a_8")           # dan tan den ten
_NDAN = _bylen("a_9")          # ndan nden
_YLA = _bylen("a_10")          # la le
_NCA = _bylen("a_11")          # ca ce
_YUM = _bylen("a_12")          # Im
_SUN = _bylen("a_13")          # sIn
_YUZ = _bylen("a_14")          # Iz
_SUNUZ = _bylen("a_15")        # sInIz
_LAR = _bylen("a_16")          # lar ler
_NUZ = _bylen("a_17")          # nIz
_DUR = _bylen("a_18")          # DIr
_CASINA = _bylen("a_19")       # casına cesine
_YDU = _bylen("a_20")          # DI(k|m|n)?…
_YSA = _bylen("a_21")          # sa se sak …
_YMUS = _bylen("a_22")         # mIş
_FINAL_MAP = {e[0]: "pçtk"[e[1] - 1] for e in _T["a_23"]}


def _harmony(s: str, c: int) -> bool:
    """check_vowel_harmony over s[:c]: the last vowel and some earlier
    char from its harmony set must both exist."""
    j = c - 1
    while j >= 0 and s[j] not in _VOWELS:
        j -= 1
    if j < 0:
        return False
    allowed = _HARM[s[j]]
    k = j - 1
    while k >= 0 and s[k] not in allowed:
        k -= 1
    return k >= 0


def _opt_cons(s: str, c: int, ch: str):
    """mark_suffix_with_optional_<ch>_consonant: consume a <ch> that
    follows a vowel, or stand pat when a non-<ch> char has a vowel
    before it. None = the suffix attachment is invalid."""
    if c >= 1 and s[c - 1] == ch:
        if c >= 2 and s[c - 2] in _VOWELS:
            return c - 1
        return None
    if c >= 2 and s[c - 2] in _VOWELS:
        return c
    return None


def _opt_u(s: str, c: int):
    """mark_suffix_with_optional_U_vowel: consume a U that follows a
    consonant, or stand pat when a non-U char has a consonant before
    it (possessive m/n vs mIz/nIz attachment)."""
    if c >= 1 and s[c - 1] in _GU:
        if c >= 2 and s[c - 2] not in _VOWELS:
            return c - 1
        return None
    if c >= 2 and s[c - 2] not in _VOWELS:
        return c
    return None


def _among(s: str, c: int, table):
    """find_among_b over s[:c]: longest listed suffix, or None."""
    for suf in table:
        if s.endswith(suf, 0, c):
            return c - len(suf)
    return None


# ---- mark_* routines: return the cursor before the suffix, or None.

def _m_possessives(s, c):
    m = _among(s, c, _POSS)
    return None if m is None else _opt_u(s, m)


def _m_sU(s, c):
    if not _harmony(s, c):
        return None
    if c >= 1 and s[c - 1] in _GU:
        return _opt_cons(s, c - 1, "s")
    return None


def _m_lArI(s, c):
    return _among(s, c, _LARI)


def _m_yU(s, c):
    if not _harmony(s, c):
        return None
    if c >= 1 and s[c - 1] in _GU:
        return _opt_cons(s, c - 1, "y")
    return None


def _harm_among(table):
    def mark(s, c, _t=table):
        if not _harmony(s, c):
            return None
        return _among(s, c, _t)
    return mark


_m_nU = _harm_among(_NU)
_m_nA = _harm_among(_NA)
_m_DA = _harm_among(_DA)
_m_ndA = _harm_among(_NDA)
_m_DAn = _harm_among(_DAN)
_m_ndAn = _harm_among(_NDAN)
_m_sUn = _harm_among(_SUN)
_m_lAr = _harm_among(_LAR)
_m_nUz = _harm_among(_NUZ)
_m_DUr = _harm_among(_DUR)


def _harm_among_opt(table, ch):
    def mark(s, c, _t=table, _c=ch):
        if not _harmony(s, c):
            return None
        m = _among(s, c, _t)
        return None if m is None else _opt_cons(s, m, _c)
    return mark


_m_nUn = _harm_among_opt(_NUN, "n")
_m_ncA = _harm_among_opt(_NCA, "n")
_m_yA = _harm_among_opt(_YA, "y")
_m_ylA = _harm_among_opt(_YLA, "y")
_m_yUm = _harm_among_opt(_YUM, "y")
_m_yUz = _harm_among_opt(_YUZ, "y")
_m_yDU = _harm_among_opt(_YDU, "y")
_m_ymUs = _harm_among_opt(_YMUS, "y")


def _m_sUnUz(s, c):
    return _among(s, c, _SUNUZ)


def _m_cAsInA(s, c):
    return _among(s, c, _CASINA)


def _m_ysA(s, c):
    m = _among(s, c, _YSA)
    return None if m is None else _opt_cons(s, m, "y")


def _m_yken(s, c):
    if s.endswith("ken", 0, c):
        return _opt_cons(s, c - 3, "y")
    return None


def _first(s, c, *marks):
    for m in marks:
        r = m(s, c)
        if r is not None:
            return r
    return None


# ---- stem_nominal_verb_suffixes ----------------------------------

def _nominal_verb(s: str):
    """Returns (stemmed, continue_stemming_noun_suffixes)."""
    n = len(s)
    # A: -(y)mUş / -(y)DU / -(y)sA / -(y)ken
    c = _first(s, n, _m_ymUs, _m_yDU, _m_ysA, _m_yken)
    if c is not None:
        return s[:c], True
    # B: -cAsInA [person] -(y)mUş
    c = _m_cAsInA(s, n)
    if c is not None:
        c2 = _first(s, c, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)
        c3 = _m_ymUs(s, c2 if c2 is not None else c)
        if c3 is not None:
            return s[:c3], True
        # no deletion happened; fall through to the next branch
    # C: -lAr [+copula]; clears the continue flag
    c = _m_lAr(s, n)
    if c is not None:
        s = s[:c]
        c2 = _first(s, len(s), _m_DUr, _m_yDU, _m_ysA, _m_ymUs)
        if c2 is not None:
            s = s[:c2]
        return s, False
    # D: -nUz + (-(y)DU | -(y)sA)
    c = _m_nUz(s, n)
    if c is not None:
        c2 = _first(s, c, _m_yDU, _m_ysA)
        if c2 is not None:
            return s[:c2], True
    # E: person suffix [+ -(y)mUş]
    c = _first(s, n, _m_sUnUz, _m_yUz, _m_sUn, _m_yUm)
    if c is not None:
        s = s[:c]
        c2 = _m_ymUs(s, len(s))
        if c2 is not None:
            s = s[:c2]
        return s, True
    # F: -DUr [+ person + -(y)mUş]
    c = _m_DUr(s, n)
    if c is not None:
        s = s[:c]
        c2 = _first(s, len(s), _m_sUnUz, _m_lAr, _m_yUm, _m_sUn,
                    _m_yUz)
        c3 = _m_ymUs(s, c2 if c2 is not None else len(s))
        if c3 is not None:
            s = s[:c3]
        return s, True
    return s, True


# ---- stem_suffix_chain_before_ki ---------------------------------

def _chain_ki(s: str):
    """The recursive …ki chain. Operates on (and may shorten) the
    whole string; returns (new_s, matched). A False return implies
    s is unchanged (every failing path exits before any delete)."""
    n = len(s)
    if not s.endswith("ki"):
        return s, False
    c = n - 2
    # K1: -DA + ki
    c2 = _m_DA(s, c)
    if c2 is not None:
        s = s[:c2]
        c3 = _m_lAr(s, len(s))
        if c3 is not None:
            s = s[:c3]
            s2, ok = _chain_ki(s)
            if ok:
                s = s2
            return s, True
        c3 = _m_possessives(s, len(s))
        if c3 is not None:
            s = s[:c3]
            c4 = _m_lAr(s, len(s))
            if c4 is not None:
                s = s[:c4]
                s2, ok = _chain_ki(s)
                if ok:
                    s = s2
        return s, True
    # K2: -nUn + ki
    c2 = _m_nUn(s, c)
    if c2 is not None:
        s = s[:c2]
        c3 = _m_lArI(s, len(s))
        if c3 is not None:
            return s[:c3], True
        c3 = _first(s, len(s), _m_possessives, _m_sU)
        if c3 is not None:
            s = s[:c3]
            c4 = _m_lAr(s, len(s))
            if c4 is not None:
                s = s[:c4]
                s2, ok = _chain_ki(s)
                if ok:
                    s = s2
            return s, True
        s2, ok = _chain_ki(s)
        if ok:
            s = s2
        return s, True
    # K3: -ndA + ki (the ndA+ki itself is only marked, never deleted)
    c2 = _m_ndA(s, c)
    if c2 is None:
        return s, False
    c3 = _m_lArI(s, c2)
    if c3 is not None:
        return s[:c3], True
    c3 = _m_sU(s, c2)
    if c3 is not None:
        s = s[:c3]
        c4 = _m_lAr(s, len(s))
        if c4 is not None:
            s = s[:c4]
            s2, ok = _chain_ki(s)
            if ok:
                s = s2
        return s, True
    head, ok = _chain_ki(s[:c2])
    if ok:
        return head + s[c2:], True
    return s, False


# ---- stem_noun_suffixes ------------------------------------------

def _noun_suffixes(s: str) -> str:
    n = len(s)
    # N1: -lAr [+ki-chain]
    c = _m_lAr(s, n)
    if c is not None:
        s = s[:c]
        s2, ok = _chain_ki(s)
        return s2 if ok else s
    # N2: -ncA [+ tail]
    c = _m_ncA(s, n)
    if c is not None:
        s = s[:c]
        c2 = _m_lArI(s, len(s))
        if c2 is not None:
            return s[:c2]
        c2 = _first(s, len(s), _m_possessives, _m_sU)
        if c2 is not None:
            s = s[:c2]
            c3 = _m_lAr(s, len(s))
            if c3 is not None:
                s = s[:c3]
                s2, ok = _chain_ki(s)
                if ok:
                    s = s2
            return s
        c2 = _m_lAr(s, len(s))
        if c2 is not None:
            s = s[:c2]
            s2, ok = _chain_ki(s)
            if ok:
                s = s2
        return s
    # N3: (-ndA | -nA) + mandatory tail (marked, not deleted alone)
    c = _first(s, n, _m_ndA, _m_nA)
    if c is not None:
        c2 = _m_lArI(s, c)
        if c2 is not None:
            return s[:c2]
        c2 = _m_sU(s, c)
        if c2 is not None:
            s = s[:c2]
            c3 = _m_lAr(s, len(s))
            if c3 is not None:
                s = s[:c3]
                s2, ok = _chain_ki(s)
                if ok:
                    s = s2
            return s
        head, ok = _chain_ki(s[:c])
        if ok:
            return head + s[c:]
        # branch failed without deleting; fall through
    # N4: (-ndAn | -nU) + (-sU… deleted | -lArI matched-but-kept)
    c = _first(s, n, _m_ndAn, _m_nU)
    if c is not None:
        c2 = _m_sU(s, c)
        if c2 is not None:
            s = s[:c2]
            c3 = _m_lAr(s, len(s))
            if c3 is not None:
                s = s[:c3]
                s2, ok = _chain_ki(s)
                if ok:
                    s = s2
            return s
        if _m_lArI(s, c) is not None:
            return s          # generated-code quirk: no deletion
    # N5: -DAn [+ tail]
    c = _m_DAn(s, n)
    if c is not None:
        s = s[:c]
        c2 = _m_possessives(s, len(s))
        if c2 is not None:
            s = s[:c2]
            c3 = _m_lAr(s, len(s))
            if c3 is not None:
                s = s[:c3]
                s2, ok = _chain_ki(s)
                if ok:
                    s = s2
            return s
        c2 = _m_lAr(s, len(s))
        if c2 is not None:
            s = s[:c2]
            s2, ok = _chain_ki(s)
            return s2 if ok else s
        s2, ok = _chain_ki(s)
        return s2 if ok else s
    # N6: (-nUn | -(y)lA) [+ tail]
    c = _first(s, n, _m_nUn, _m_ylA)
    if c is not None:
        s = s[:c]
        c2 = _m_lAr(s, len(s))
        if c2 is not None:
            s = s[:c2]
            s2, ok = _chain_ki(s)
            if ok:
                return s2
            # lAr stays deleted; continue with the later alternatives
        c2 = _first(s, len(s), _m_possessives, _m_sU)
        if c2 is not None:
            s = s[:c2]
            c3 = _m_lAr(s, len(s))
            if c3 is not None:
                s = s[:c3]
                s2, ok = _chain_ki(s)
                if ok:
                    s = s2
            return s
        s2, ok = _chain_ki(s)
        return s2 if ok else s
    # N7: -lArI
    c = _m_lArI(s, n)
    if c is not None:
        return s[:c]
    # N8: bare ki-chain
    s2, ok = _chain_ki(s)
    if ok:
        return s2
    # N9: (-DA | -(y)U | -(y)A) [+ possessive/lAr + ki-chain]
    c = _first(s, n, _m_DA, _m_yU, _m_yA)
    if c is not None:
        s = s[:c]
        c2 = _m_possessives(s, len(s))
        if c2 is not None:
            s = s[:c2]
            end = len(s)
            c3 = _m_lAr(s, end)
            s = s[:c3 if c3 is not None else end]
            s2, ok = _chain_ki(s)
            return s2 if ok else s
        c2 = _m_lAr(s, len(s))
        if c2 is not None:
            s = s[:c2]
            s2, ok = _chain_ki(s)
            return s2 if ok else s
        return s
    # N10: possessive / -sU [+ -lAr + ki-chain]
    c = _first(s, n, _m_possessives, _m_sU)
    if c is not None:
        s = s[:c]
        c2 = _m_lAr(s, len(s))
        if c2 is not None:
            s = s[:c2]
            s2, ok = _chain_ki(s)
            if ok:
                s = s2
    return s


# ---- postlude ----------------------------------------------------

def _append_u(s: str) -> str:
    """A stem left ending in d/g gains its harmony vowel."""
    if not s or s[-1] not in "dg":
        return s
    j = len(s) - 1
    while j >= 0 and s[j] not in _VOWELS:
        j -= 1
    if j < 0:
        return s
    v = s[j]
    if v in "aı":
        return s + "ı"
    if v in "ei":
        return s + "i"
    if v in "ou":
        return s + "u"
    return s + "ü"


def turkish_snowball_stem(word: str) -> str:
    s = word
    nvowels = 0
    for ch in s:
        if ch in _VOWELS:
            nvowels += 1
            if nvowels >= 2:
                break
    if nvowels < 2:
        return s
    s, cont = _nominal_verb(s)
    if not cont:
        return s
    s = _noun_suffixes(s)
    if s in ("ad", "soyad"):
        return s
    s = _append_u(s)
    if s and s[-1] in _FINAL_MAP:
        s = s[:-1] + _FINAL_MAP[s[-1]]
    return s
