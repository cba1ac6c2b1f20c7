"""Snowball Arabic stemmer.

Reference: the generated org/tartarus/snowball/ext/ArabicStemmer.java
in the reference repo; algorithm = the published Snowball Arabic
stemmer by Assem Chelli (snowballstem.org/algorithms/arabic/stemmer.html).

Phases:

  Checks1        — on the RAW word (before normalization): a leading
                   definite article (bal/kal needing len>4, al/ll
                   needing len>3) marks the word noun + defined and
                   clears the verb flag.
  Normalize_pre  — per-character map: strip tatweel + harakat
                   diacritics, Arabic-Indic digits -> ASCII,
                   presentation forms (U+FE80..FEFC) -> canonical
                   letters (lam-alef ligatures expand to two chars).
  Suffix phase   — first matching family wins:
                     verb:  one-or-more Step1 pronoun suffixes then
                            (Step2a | Step2c | any char), else Step2b,
                            else Step2a;
                     noun:  try (2c2 | [undefined] 1a+(2a|2b|2c1|any)
                            | 1b+(2a|2b|2c1) | [undefined] 2a | 2b)
                            then the mandatory yaa Step3;
                     else:  trailing alef maqsura -> yaa.
                   Every among case carries a word-length floor taken
                   at routine ENTRY (deletions inside a family lower
                   it for the next step).
  Prefix phase   — cursor-chained left-to-right: hamza-pair repair,
                   faa/waw conjunction strip (unless fa/wa alef),
                   article strip (or noun baa/kaf doubling repair, or
                   verb sa-future + sta -> ist).
  Normalize_post — trailing hamza-carrier -> bare hamza, then map
                   hamza carriers to their plain letters everywhere.

Suffix/prefix tables frozen from the published algorithm data
(scripts/make_snowball_tables.py); verified mismatch-free against the
reference's full Snowball Arabic vocabulary. Pure str -> str.
"""

from __future__ import annotations

import json
import os

__all__ = ["arabic_snowball_stem"]

_FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "snowball_tables.json",
)
with open(os.path.abspath(_FIXTURE), encoding="utf-8") as _f:
    _T = json.load(_f)["arabic"]

# Normalize_pre action map: case -> replacement ('' = delete).
_PRE_ACTION = {1: "", 2: ""}
_PRE_ACTION.update({c: str(c - 3) for c in range(3, 13)})  # digits 0-9
_PRE_ACTION.update({
    13: "ء", 14: "أ", 15: "إ", 16: "ئ", 17: "آ",
    18: "ؤ", 19: "ا", 20: "ب", 21: "ة", 22: "ت",
    23: "ث", 24: "ج", 25: "ح", 26: "خ", 27: "د",
    28: "ذ", 29: "ر", 30: "ز", 31: "س", 32: "ش",
    33: "ص", 34: "ض", 35: "ط", 36: "ظ", 37: "ع",
    38: "غ", 39: "ف", 40: "ق", 41: "ك", 42: "ل",
    43: "م", 44: "ن", 45: "ه", 46: "و", 47: "ى",
    48: "ي", 49: "لا", 50: "لأ",
    51: "لإ", 52: "لآ",
})
_PRE = {ch: _PRE_ACTION[case] for ch, case in _T["a_0"]}

# Normalize_post hamza-carrier maps.
_POST_FINAL = {ch for ch, _ in _T["a_1"]}                       # -> hamza
_POST_ACTION = {1: "ا", 2: "و", 3: "ي"}
_POST = {ch: _POST_ACTION[case] for ch, case in _T["a_2"]}


def _bylen(table):
    return tuple(sorted(table, key=lambda e: len(e[0]), reverse=True))


_CHECKS1 = _bylen(_T["a_3"])          # articles (raw word)
_P1_HAMZA = _bylen(_T["a_4"])         # hamza pairs
_P2_CONJ = _bylen(_T["a_5"])          # faa / waw
_P3A_ARTICLE = _bylen(_T["a_6"])      # articles (prefix strip)
_P3B_NOUN = _bylen(_T["a_7"])         # baa / doubled baa / kaf
_P3_VERB = _bylen(_T["a_8"])          # sa-future
_P4_VERB = _bylen(_T["a_9"])          # Xst -> ist
_S_NOUN_1A = _bylen(_T["a_10"])
_S_NOUN_1B = _bylen(_T["a_11"])
_S_NOUN_2A = _bylen(_T["a_12"])
_S_NOUN_2B = _bylen(_T["a_13"])
_S_NOUN_2C1 = _bylen(_T["a_14"])
_S_NOUN_2C2 = _bylen(_T["a_15"])
_S_NOUN_3 = _bylen(_T["a_16"])
_S_VERB_1 = _bylen(_T["a_17"])
_S_VERB_2A = _bylen(_T["a_18"])
_S_VERB_2B = _bylen(_T["a_19"])
_S_VERB_2C = _bylen(_T["a_20"])

# Per-case word-length floors (value, strict) for each suffix table,
# checked against len(s) at routine entry; the matched suffix deletes.
_VERB_1_MIN = {1: (4, False), 2: (5, False), 3: (6, False)}
_VERB_2A_MIN = {1: (4, False), 2: (4, False), 3: (5, False),
                4: (5, True), 5: (6, False)}
_VERB_2B_MIN = {1: (5, False)}
_VERB_2C_MIN = {1: (4, False), 2: (6, False)}
_NOUN_1A_MIN = {1: (4, False), 2: (5, False), 3: (6, False)}
_NOUN_1B_MIN = {1: (5, True)}
_NOUN_2A_MIN = {1: (4, True)}
_NOUN_2B_MIN = {1: (5, False)}
_NOUN_2C1_MIN = {1: (4, False)}
_NOUN_2C2_MIN = {1: (4, False)}
_NOUN_3_MIN = {1: (3, False)}

_P3_VERB_SUB = {1: "ي", 2: "ت", 3: "ن", 4: "أ"}


def _suffix_del(s: str, table, mins):
    """Longest-suffix among + length-floor check; delete on success."""
    for suf, case in table:
        if s.endswith(suf):
            floor, strict = mins[case]
            n = len(s)
            if (n > floor) if strict else (n >= floor):
                return s[: -len(suf)], True
            return s, False  # matched case failed its floor: no fallback
    return s, False


def arabic_snowball_stem(word: str) -> str:
    is_noun = True
    is_verb = True
    is_defined = False

    # Checks1 — on the raw word, flags only, no mutation.
    n = len(word)
    for pre, case in _CHECKS1:
        if word.startswith(pre):
            if case == 1 and n > 4:
                is_noun, is_verb, is_defined = True, False, True
            elif case == 2 and n > 3:
                is_noun, is_verb, is_defined = True, False, True
            break

    # Normalize_pre — each source char consumed once, replacements
    # never rescanned, so the cursor loop reduces to a per-char map.
    s = "".join(_PRE.get(ch, ch) for ch in word)

    # ---- suffix phase (backwards) -------------------------------
    matched = False
    if is_verb:
        cnt = 0
        while True:
            s2, ok = _suffix_del(s, _S_VERB_1, _VERB_1_MIN)
            if not ok:
                break
            s = s2
            cnt += 1
        if cnt >= 1:
            s2, ok = _suffix_del(s, _S_VERB_2A, _VERB_2A_MIN)
            if ok:
                s, matched = s2, True
            else:
                s2, ok = _suffix_del(s, _S_VERB_2C, _VERB_2C_MIN)
                if ok:
                    s, matched = s2, True
                elif s:  # 'next': succeeds unless Step1 ate everything
                    matched = True
        if not matched:
            s2, ok = _suffix_del(s, _S_VERB_2B, _VERB_2B_MIN)
            if ok:
                s, matched = s2, True
            else:
                s2, ok = _suffix_del(s, _S_VERB_2A, _VERB_2A_MIN)
                if ok:
                    s, matched = s2, True

    if not matched and is_noun:
        # try-block: first suffix family that fires wins; a family
        # whose first step fired but whose follow-up failed still
        # keeps its deletion (Snowball 'or' restores the cursor, not
        # the string).
        done = False
        s2, ok = _suffix_del(s, _S_NOUN_2C2, _NOUN_2C2_MIN)
        if ok:
            s, done = s2, True
        if not done and not is_defined:
            s2, ok = _suffix_del(s, _S_NOUN_1A, _NOUN_1A_MIN)
            if ok:
                s = s2
                s3, ok2 = _suffix_del(s, _S_NOUN_2A, _NOUN_2A_MIN)
                if not ok2:
                    s3, ok2 = _suffix_del(s, _S_NOUN_2B, _NOUN_2B_MIN)
                if not ok2:
                    s3, ok2 = _suffix_del(s, _S_NOUN_2C1, _NOUN_2C1_MIN)
                if ok2:
                    s, done = s3, True
                elif s:  # 'next'
                    done = True
        if not done:
            s2, ok = _suffix_del(s, _S_NOUN_1B, _NOUN_1B_MIN)
            if ok:
                s = s2
                s3, ok2 = _suffix_del(s, _S_NOUN_2A, _NOUN_2A_MIN)
                if not ok2:
                    s3, ok2 = _suffix_del(s, _S_NOUN_2B, _NOUN_2B_MIN)
                if not ok2:
                    s3, ok2 = _suffix_del(s, _S_NOUN_2C1, _NOUN_2C1_MIN)
                if ok2:
                    s, done = s3, True
        if not done and not is_defined:
            s2, ok = _suffix_del(s, _S_NOUN_2A, _NOUN_2A_MIN)
            if ok:
                s, done = s2, True
        if not done:
            s2, ok = _suffix_del(s, _S_NOUN_2B, _NOUN_2B_MIN)
            if ok:
                s, done = s2, True
        # mandatory yaa strip closes the noun family
        s2, ok = _suffix_del(s, _S_NOUN_3, _NOUN_3_MIN)
        if ok:
            s, matched = s2, True

    if not matched and s.endswith("ى"):  # alef maqsura -> yaa
        s = s[:-1] + "ي"

    # ---- prefix phase (cursor-chained left to right) ------------
    c = 0
    # Step1: hamza-pair repair (try)
    n = len(s)
    for pre, case in _P1_HAMZA:
        if s.startswith(pre, c):
            if n > 3:
                rep = {1: "أ", 2: "آ", 3: "أ",
                       4: "ا", 5: "إ"}[case]
                s = s[:c] + rep + s[c + len(pre):]
                c += len(rep)
            break
    # Step2: faa/waw conjunction (try), guarded against fa/wa + alef
    n = len(s)
    if not (s.startswith("فا", c)
            or s.startswith("وا", c)):
        for pre, _case in _P2_CONJ:
            if s.startswith(pre, c):
                if n > 3:
                    s = s[:c] + s[c + len(pre):]
                break
    # Step3 or-chain
    done3 = False
    n = len(s)
    for pre, case in _P3A_ARTICLE:
        if s.startswith(pre, c):
            if (case == 1 and n > 5) or (case == 2 and n > 4):
                s = s[:c] + s[c + len(pre):]
                done3 = True
            break  # a failed floor does not fall back
    if not done3 and is_noun and not s.startswith("با", c):
        n = len(s)
        for pre, case in _P3B_NOUN:
            if s.startswith(pre, c):
                if n > 3:
                    if case == 1:
                        s = s[:c] + s[c + len(pre):]
                    elif case == 2:
                        s = s[:c] + "ب" + s[c + len(pre):]
                    else:
                        s = s[:c] + "ك" + s[c + len(pre):]
                    done3 = True
                break
    if not done3 and is_verb:
        # try Step3_Verb: sa-future -> person prefix
        n = len(s)
        for pre, case in _P3_VERB:
            if s.startswith(pre, c):
                if n > 4:
                    rep = _P3_VERB_SUB[case]
                    s = s[:c] + rep + s[c + len(pre):]
                    c += len(rep)
                break
        # Step4_Verb (required): Xst -> ist
        n = len(s)
        for pre, _case in _P4_VERB:
            if s.startswith(pre, c):
                if n > 4:
                    is_verb, is_noun = True, False
                    s = s[:c] + "است" + s[c + len(pre):]
                break

    # ---- Normalize_post -----------------------------------------
    if s and s[-1] in _POST_FINAL:
        s = s[:-1] + "ء"
    return "".join(_POST.get(ch, ch) for ch in s)
