"""CharTokenizer family + NGram/Edge/Keyword tokenizers.

Re-implements the reference's character-oriented tokenizers:

- ``CharTokenizer`` (analysis/util/CharTokenizer.java:165-215) — emit
  maximal runs of code points satisfying a predicate; the token LENGTH
  CAP is in UTF-16 units and SPLITS runs (``length >= maxTokenLen``
  breaks mid-run and the next call continues from the following code
  point — a supplementary char may push a token to maxTokenLen+1
  units, exactly as ``Character.toChars`` does before the cap check).
  Predicates: LetterTokenizer = ``Character.isLetter``,
  WhitespaceTokenizer = ``!Character.isWhitespace``,
  UnicodeWhitespaceTokenizer = Unicode WHITESPACE property
  (analysis/util/UnicodeProps.java — the literal 25-code-point list).
  The isLetter / isWhitespace code-point ranges are DATA dumped from
  the JVM (fixtures_data/chartok_props.json,
  scripts/make_chartok_fixture.py).
- ``KeywordTokenizer`` (core/KeywordTokenizer.java) — whole input as
  one token, none for empty input.
- ``NGramTokenizer`` / ``EdgeNGramTokenizer``
  (ngram/NGramTokenizer.java:127-178) — code-point n-grams emitted by
  increasing start offset then gram size; ``edgesOnly`` keeps a gram
  only when the previous position is a non-token char (start-of-input
  with the default always-true predicate). Offsets are UTF-16:
  ``end = start + utf16len(term)``.

All verified word-for-word against the COMPILED reference classes
over a full-BMP + astral sweep before fixture freeze.
"""

from __future__ import annotations

import json
import os
from typing import List, NamedTuple

_FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "..", "fixtures_data")

# UnicodeProps.java WHITESPACE — literal data in the reference
_UNICODE_WS = frozenset([
    0x0009, 0x000A, 0x000B, 0x000C, 0x000D, 0x0020, 0x0085, 0x00A0,
    0x1680, 0x2000, 0x2001, 0x2002, 0x2003, 0x2004, 0x2005, 0x2006,
    0x2007, 0x2008, 0x2009, 0x200A, 0x2028, 0x2029, 0x202F, 0x205F,
    0x3000])

_PREDS = None


class CharToken(NamedTuple):
    term: str
    start: int      # UTF-16 offsets, as the JVM reports
    end: int


def _load_preds():
    global _PREDS
    if _PREDS is None:
        with open(os.path.join(_FIX, "chartok_props.json")) as f:
            p = json.load(f)

        def as_set(ranges):
            s = set()
            for lo, hi in ranges:
                s.update(range(lo, hi + 1))
            return frozenset(s)

        _PREDS = {
            "letter": as_set(p["letter"]).__contains__,
            "ws": lambda cp, _s=as_set(p["space"]): cp not in _s,
            "uws": lambda cp: cp not in _UNICODE_WS,
        }
    return _PREDS


def _u16len(cp: int) -> int:
    return 2 if cp > 0xFFFF else 1


def char_tokenize(text: str, kind: str,
                  max_token_len: int = 255) -> List[CharToken]:
    """CharTokenizer.incrementToken loop over a whole string."""
    is_tok = _load_preds()[kind]
    out: List[CharToken] = []
    term: List[str] = []
    units = 0           # term length in UTF-16 units
    start = -1
    off = 0             # UTF-16 offset of current char
    for ch in text:
        cp = ord(ch)
        w = _u16len(cp)
        if is_tok(cp):
            if units == 0:
                start = off
            term.append(ch)
            units += w
            if units >= max_token_len:   # cap in UTF-16 units; SPLITS
                out.append(CharToken("".join(term), start, off + w))
                term, units, start = [], 0, -1
        elif units > 0:
            out.append(CharToken("".join(term), start, off))
            term, units, start = [], 0, -1
        off += w
    if units > 0:
        out.append(CharToken("".join(term), start, off))
    return out


def keyword_tokenize(text: str) -> List[CharToken]:
    # one token ALWAYS — empty input emits an empty term with offsets
    # (0,0): KeywordTokenizer.incrementToken returns true once
    # unconditionally (core/KeywordTokenizer.java:60-75)
    n = sum(_u16len(ord(c)) for c in text)
    return [CharToken(text, 0, n)]


def ngram_tokenize(text: str, min_gram: int, max_gram: int,
                   edges_only: bool = False) -> List[CharToken]:
    """NGramTokenizer: code-point grams by increasing start offset.

    With the default always-true isTokenChar predicate, edgesOnly
    admits only start == 0 (EdgeNGramTokenizer.java:31).
    """
    cps = [ord(c) for c in text]    # str iteration = code points
    chars = list(text)
    n = len(cps)
    out: List[CharToken] = []
    off = 0                         # UTF-16 offset of position `start`
    for start in range(n):
        if start + min_gram > n:
            break
        if not edges_only or start == 0:
            for g in range(min_gram, max_gram + 1):
                if start + g > n:
                    break
                term = "".join(chars[start:start + g])
                tlen = sum(_u16len(cp) for cp in cps[start:start + g])
                out.append(CharToken(term, off, off + tlen))
        off += _u16len(cps[start])
    return out


_SEP = "\x1f"
_FS = "\x1e"

MODES = ("letter:255", "letter:10", "ws:255", "ws:20", "uws:255",
         "uws:5", "keyword", "ngram:1:2", "ngram:2:3", "edge:1:1",
         "edge:2:4")


def chartok_tokens(text: str, mode: str) -> List[CharToken]:
    p = mode.split(":")
    if p[0] in ("letter", "ws", "uws"):
        return char_tokenize(text, p[0], max_token_len=int(p[1]))
    if p[0] == "keyword":
        return keyword_tokenize(text)
    if p[0] == "ngram":
        return ngram_tokenize(text, int(p[1]), int(p[2]))
    if p[0] == "edge":
        return ngram_tokenize(text, int(p[1]), int(p[2]),
                              edges_only=True)
    raise ValueError(f"unknown chartok mode {mode!r}")


def chartok_serialize(text: str, mode: str) -> str:
    return _SEP.join(
        _FS.join((t.term, str(t.start), str(t.end)))
        for t in chartok_tokens(text, mode))


def chartok_udf(mode_col, text_col):
    """Arrow-batched (mode, text) -> serialized token stream column."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _run(modes, texts):
        return pd.Series([
            chartok_serialize(t if t is not None else "", m)
            for m, t in zip(modes, texts)])

    return pandas_udf(_run, "string")(mode_col, text_col)
