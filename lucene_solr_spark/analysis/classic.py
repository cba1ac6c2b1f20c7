"""ClassicTokenizer + ClassicFilter — the pre-3.1 Lucene StandardTokenizer.

Re-implements the 127-line JFlex grammar
(reference lucene/analysis/common/src/java/org/apache/lucene/analysis/
standard/ClassicTokenizerImpl.jflex:67-127) as longest-match scanning
over a per-character class string, plus the ClassicTokenizer wrapper
semantics (maxTokenLength skip with position-increment accumulation,
ACRONYM_DEP re-typed as HOST minus its trailing dot —
ClassicTokenizer.java:131-159) and ClassicFilter's possessive-'s /
acronym-dot normalization (ClassicFilter.java:46-71).

The grammar is `%unicode 3.0`, so [:letter:]/[:digit:] are the
UNICODE 3.0 properties — not whatever this interpreter's unicodedata
says. The character classes are therefore loaded from
fixtures_data/classic_cmap.json, extracted from the generated
scanner's own ZZ_CMAP table by scripts/make_classic_fixture.py (data,
like a stemmer rule table), which also verifies this module
word-for-word against the compiled reference scanner over a full-BMP
sweep + structured corpus.

Class symbols (one per UTF-16 code unit):
  l  plain letter   ([:letter:] minus CJ ranges minus the THAI range)
  t  Thai letter    (in [\\u0E00-\\u0E59] and [:letter:])
  n  Thai digit     (in the THAI range and [:digit:])
  e  Thai other     (in the THAI range, neither letter nor digit)
  d  plain digit    ([:digit:] outside the THAI range)
  J  CJ             (the grammar's fixed CJK/kana ranges, jflex:112)
  ' . & @ - _ / ,   themselves (the grammar's separator literals)
  (space)           everything else — ignored filler
"""

from __future__ import annotations

import json
import os
import re
from typing import List, NamedTuple, Optional

ALPHANUM = 0
APOSTROPHE = 1
ACRONYM = 2
COMPANY = 3
EMAIL = 4
HOST = 5
NUM = 6
CJ = 7
ACRONYM_DEP = 8

TOKEN_TYPES = [
    "<ALPHANUM>",
    "<APOSTROPHE>",
    "<ACRONYM>",
    "<COMPANY>",
    "<EMAIL>",
    "<HOST>",
    "<NUM>",
    "<CJ>",
    "<ACRONYM_DEP>",
]

DEFAULT_MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH

_CMAP_JSON = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..", "fixtures_data", "classic_cmap.json")


def _load_table() -> dict:
    with open(_CMAP_JSON, "r", encoding="utf-8") as f:
        ranges = json.load(f)
    table = {}
    for sym, spans in ranges.items():
        for lo, hi in spans:
            for cp in range(lo, hi + 1):
                table[cp] = sym
    return table


_TABLE: Optional[dict] = None


def _table() -> dict:
    global _TABLE
    if _TABLE is None:
        _TABLE = _load_table()
    return _TABLE


# Grammar macros over class symbols (jflex:67-112).  ALPHANUM admits
# LETTER|THAI|digit = {l,t} | {t,n,e} | {d,n}; HAS_DIGIT admits only
# LETTER|digit with at least one digit (Thai-only marks excluded).
_AN = "[ltned]+"
_ALPHA = "[lt]+"
_LET = "[lt]"
_HD = "[ltdn]*[dn][ltdn]*"
_P = "[-_/.,]"

# (type, pattern) in JFlex rule order; longest match wins, ties go to
# the earliest rule (NUM's six alternatives share one rule slot and
# are maximized independently — Python's leftmost-alternation regex
# would otherwise under-match).
_RULES = [
    (ALPHANUM, _AN),
    (APOSTROPHE, "%s('%s)+" % (_ALPHA, _ALPHA)),
    (ACRONYM, "%s\\.(%s\\.)+" % (_LET, _LET)),
    (COMPANY, "%s[&@]%s" % (_ALPHA, _ALPHA)),
    (EMAIL, "%s([.\\-_]%s)*@%s([.\\-]%s)+" % (_AN, _AN, _AN, _AN)),
    (HOST, "%s(\\.%s)+" % (_AN, _AN)),
    (NUM, "%s%s%s" % (_AN, _P, _HD)),
    (NUM, "%s%s%s" % (_HD, _P, _AN)),
    (NUM, "%s(%s%s%s%s)+" % (_AN, _P, _HD, _P, _AN)),
    (NUM, "%s(%s%s%s%s)+" % (_HD, _P, _AN, _P, _HD)),
    (NUM, "%s%s%s(%s%s%s%s)+" % (_AN, _P, _HD, _P, _AN, _P, _HD)),
    (NUM, "%s%s%s(%s%s%s%s)+" % (_HD, _P, _AN, _P, _HD, _P, _AN)),
    (CJ, "[J]"),
    (ACRONYM_DEP, "%s\\.(%s\\.)+" % (_AN, _AN)),
]
_COMPILED = [(t, re.compile(p)) for t, p in _RULES]
_START = re.compile("[ltnedJ]")  # only these classes can begin a token


class ClassicToken(NamedTuple):
    term: str
    type: str
    start: int       # UTF-16 offset, as Lucene reports
    end: int
    pos_inc: int


def classic_tokenize(text: str,
                     max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH
                     ) -> List[ClassicToken]:
    """Tokenize like ClassicTokenizer.incrementToken: longest-match
    scan, skip tokens longer than max_token_length (the skip still
    bumps the next token's position increment), and surface
    ACRONYM_DEP matches as HOST with the trailing '.' dropped.

    The scanner consumes CODE POINTS (Character.codePointAt in the
    generated zzRefill loop; every supplementary code point is filler
    per ZZ_CMAP) but reports offsets in UTF-16 chars — so we scan the
    Python string per code point and widen offsets by the number of
    preceding supplementary chars."""
    units = text
    tbl = _table()
    cls = units.translate(tbl)
    # UTF-16 offset correction: +1 for each preceding non-BMP char
    wide = [j for j, ch in enumerate(units) if ord(ch) > 0xFFFF]
    if wide:
        import bisect

        def _off(j):
            return j + bisect.bisect_right(wide, j - 1)
    else:
        def _off(j):
            return j
    out: List[ClassicToken] = []
    skipped = 0
    i = 0
    n = len(cls)
    while i < n:
        m0 = _START.search(cls, i)
        if m0 is None:
            break
        i = m0.start()
        best_len = 0
        best_type = -1
        for ttype, rx in _COMPILED:
            m = rx.match(cls, i)
            if m is not None and m.end() - i > best_len:
                best_len = m.end() - i
                best_type = ttype
        # every start-class char matches ALPHANUM or CJ, so best_len>=1
        if best_len > max_token_length:
            skipped += 1
            i += best_len
            continue
        term = units[i:i + best_len]
        start, end = _off(i), _off(i + best_len)
        if best_type == ACRONYM_DEP:
            # ClassicTokenizer.java:147-149 — retype as HOST, drop '.'
            out.append(ClassicToken(term[:-1], TOKEN_TYPES[HOST],
                                    start, end, skipped + 1))
        else:
            out.append(ClassicToken(term, TOKEN_TYPES[best_type],
                                    start, end, skipped + 1))
        skipped = 0
        i += best_len
    return out


def classic_filter(tokens: List[ClassicToken]) -> List[ClassicToken]:
    """ClassicFilter: strip a trailing 's / 'S from APOSTROPHE tokens
    and remove every '.' from ACRONYM tokens (ClassicFilter.java:46-71;
    offsets are untouched, exactly like the reference)."""
    out = []
    for t in tokens:
        if (t.type == TOKEN_TYPES[APOSTROPHE] and len(t.term) >= 2
                and t.term[-2] == "'" and t.term[-1] in "sS"):
            out.append(t._replace(term=t.term[:-2]))
        elif t.type == TOKEN_TYPES[ACRONYM]:
            out.append(t._replace(term=t.term.replace(".", "")))
        else:
            out.append(t)
    return out


_SEP = "\x1f"
_FS = "\x1e"

#: fixture modes — (apply ClassicFilter?, maxTokenLength)
MODES = {
    "raw255": (False, 255),
    "filtered255": (True, 255),
    "raw10": (False, 10),
}


def classic_serialize(text: str, mode: str) -> str:
    filt, mtl = MODES[mode]
    toks = classic_tokenize(text, max_token_length=mtl)
    if filt:
        toks = classic_filter(toks)
    return _SEP.join(
        _FS.join((t.term, t.type, str(t.start), str(t.end),
                  str(t.pos_inc))) for t in toks)


def classic_udf(mode_col, text_col):
    """Arrow-batched (mode, text) -> serialized token stream column."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _run(modes, texts):
        return pd.Series([
            classic_serialize(t if t is not None else "", m)
            for m, t in zip(modes, texts)])

    return pandas_udf(_run, "string")(mode_col, text_col)
