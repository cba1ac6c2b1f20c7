"""Full WordDelimiterGraphFilter — the complete flag surface.

Re-implements the reference's sub-word graph filter exactly:

- ``WordDelimiterIterator`` (miscellaneous/WordDelimiterIterator.java)
  — per-UTF-16-unit char types (LOWER/UPPER/DIGIT/SUBWORD_DELIM, with
  surrogate units typed ALPHA|DIGIT to prevent splitting; table dumped
  from the JVM as data, fixtures_data/wdgf_types.json), bounds
  stripping, isBreak transitions gated by splitOnCaseChange /
  splitOnNumerics, English-possessive skipping.
- ``WordDelimiterGraphFilter``
  (miscellaneous/WordDelimiterGraphFilter.java:259-445) — all ten
  flags: GENERATE_WORD_PARTS, GENERATE_NUMBER_PARTS, CATENATE_WORDS,
  CATENATE_NUMBERS, CATENATE_ALL, PRESERVE_ORIGINAL,
  SPLIT_ON_CASE_CHANGE, SPLIT_ON_NUMERICS, STEM_ENGLISH_POSSESSIVE,
  IGNORE_KEYWORDS; protected-word pass-through; part buffering with
  the (startPos asc, posLen desc) stable sort; graph position
  increments with hole accumulation (accumPosInc), adjusted or
  pass-through offsets with the never-backwards clamp; the
  delimiter-only-token swallow/hole.

Verified word-for-word (term, posInc, posLen, offsets) against the
COMPILED reference filter chained after WhitespaceTokenizer across 8
flag modes (scripts/make_wdgf_fixture.py). This supersedes the
Column-expression subset in analysis/filters.py (which remains the
JVM-side fast path for the plain generate-parts chain).
"""

from __future__ import annotations

import json
import os
from bisect import bisect_right
from typing import List, NamedTuple, Optional, Sequence, Tuple

LOWER = 0x01
UPPER = 0x02
DIGIT = 0x04
SUBWORD_DELIM = 0x08
ALPHA = 0x03

GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256
IGNORE_KEYWORDS = 512

DONE = -1

_FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "..", "fixtures_data")

_TYPES: Optional[Tuple[List[int], List[int]]] = None


def _type_table() -> Tuple[List[int], List[int]]:
    global _TYPES
    if _TYPES is None:
        with open(os.path.join(_FIX, "wdgf_types.json")) as f:
            ranges = json.load(f)
        starts = [r[0] for r in ranges]
        types = [r[2] for r in ranges]
        _TYPES = (starts, types)
    return _TYPES


def _char_type(u: int) -> int:
    starts, types = _type_table()
    return types[bisect_right(starts, u) - 1]


class GraphToken(NamedTuple):
    term: str
    pos_inc: int
    pos_len: int
    start: int      # UTF-16 offsets
    end: int


def _units(text: str) -> List[int]:
    out: List[int] = []
    for ch in text:
        cp = ord(ch)
        if cp > 0xFFFF:
            cp -= 0x10000
            out.append(0xD800 + (cp >> 10))
            out.append(0xDC00 + (cp & 0x3FF))
        else:
            out.append(cp)
    return out


def _text(units: Sequence[int]) -> str:
    b = b"".join(u.to_bytes(2, "little") for u in units)
    return b.decode("utf-16-le", errors="surrogatepass")


class _Iter:
    """WordDelimiterIterator over UTF-16 units."""

    def __init__(self, split_case: bool, split_num: bool,
                 stem_poss: bool):
        self.split_case = split_case
        self.split_num = split_num
        self.stem_poss = stem_poss

    def set_text(self, units: List[int]) -> None:
        self.text = units
        self.length = self.end_bounds = len(units)
        self.current = self.start_bounds = self.end = 0
        self.skip_possessive = False
        self.has_final_possessive = False
        self._set_bounds()

    def next(self) -> int:
        self.current = self.end
        if self.current == DONE:
            return DONE
        if self.skip_possessive:
            self.current += 2
            self.skip_possessive = False
        last_type = 0
        while self.current < self.end_bounds:
            last_type = _char_type(self.text[self.current])
            if not last_type & SUBWORD_DELIM:
                break
            self.current += 1
        if self.current >= self.end_bounds:
            self.end = DONE
            return DONE
        self.end = self.current + 1
        while self.end < self.end_bounds:
            t = _char_type(self.text[self.end])
            if self._is_break(last_type, t):
                break
            last_type = t
            self.end += 1
        if (self.end < self.end_bounds - 1
                and self._ends_with_possessive(self.end + 2)):
            self.skip_possessive = True
        return self.end

    def type(self) -> int:
        if self.end == DONE:
            return 0
        t = _char_type(self.text[self.current])
        if t in (LOWER, UPPER):
            return ALPHA
        return t

    def is_single_word(self) -> bool:
        if self.has_final_possessive:
            return (self.current == self.start_bounds
                    and self.end == self.end_bounds - 2)
        return (self.current == self.start_bounds
                and self.end == self.end_bounds)

    def _is_break(self, last_type: int, t: int) -> bool:
        if t & last_type:
            return False
        la, ta = last_type & ALPHA, t & ALPHA
        if not self.split_case and la and ta:
            return False
        if (last_type & UPPER) and ta:
            return False
        if not self.split_num and ((la and t & DIGIT)
                                   or (last_type & DIGIT and ta)):
            return False
        return True

    def _set_bounds(self) -> None:
        while (self.start_bounds < self.length
               and _char_type(self.text[self.start_bounds])
               & SUBWORD_DELIM):
            self.start_bounds += 1
        while (self.end_bounds > self.start_bounds
               and _char_type(self.text[self.end_bounds - 1])
               & SUBWORD_DELIM):
            self.end_bounds -= 1
        if self._ends_with_possessive(self.end_bounds):
            self.has_final_possessive = True
        self.current = self.start_bounds

    def _ends_with_possessive(self, pos: int) -> bool:
        return (self.stem_poss
                and pos > 2
                and self.text[pos - 2] == ord("'")
                and self.text[pos - 1] in (ord("s"), ord("S"))
                and _char_type(self.text[pos - 3]) & ALPHA != 0
                and (pos == self.end_bounds
                     or _char_type(self.text[pos]) & SUBWORD_DELIM))


class _Concat:
    __slots__ = ("units", "start_part", "end_part", "start_pos",
                 "type", "subword_count")

    def __init__(self):
        self.clear()

    def clear(self):
        self.units: List[int] = []
        self.start_part = self.end_part = self.type = 0
        self.subword_count = 0

    def is_empty(self):
        return not self.units


class WordDelimiterGraph:
    """The filter over a pre-tokenized stream (stateful across tokens
    for accumPosInc holes and the never-backwards offset clamp)."""

    def __init__(self, flags: int,
                 prot_words: Optional[Sequence[str]] = None,
                 adjust_internal_offsets: bool = True):
        self.flags = flags
        self.prot = frozenset(prot_words) if prot_words else None
        self.adjust = adjust_internal_offsets
        self.it = _Iter(bool(flags & SPLIT_ON_CASE_CHANGE),
                        bool(flags & SPLIT_ON_NUMERICS),
                        bool(flags & STEM_ENGLISH_POSSESSIVE))
        self.accum_pos_inc = 0
        self.last_start_offset = 0

    def _has(self, flag: int) -> bool:
        return bool(self.flags & flag)

    def _should_concat(self, word_type: int) -> bool:
        return ((self._has(CATENATE_WORDS) and word_type & ALPHA != 0)
                or (self._has(CATENATE_NUMBERS)
                    and word_type & DIGIT != 0))

    def _should_generate(self, word_type: int) -> bool:
        return ((self._has(GENERATE_WORD_PARTS)
                 and word_type & ALPHA != 0)
                or (self._has(GENERATE_NUMBER_PARTS)
                    and word_type & DIGIT != 0))

    def process_token(self, term: str, start_off: int, end_off: int,
                      pos_inc: int = 1) -> List[GraphToken]:
        """All graph tokens for one incoming token (the reference's
        incrementToken loop unrolled over the buffered parts)."""
        it = self.it
        units = _units(term)
        self.accum_pos_inc += pos_inc
        it.set_text(units)
        it.next()

        # word with no delimiters, or protected word: pass through
        if ((it.current == 0 and it.end == len(units))
                or (self.prot is not None and term in self.prot)):
            out = [GraphToken(term, self.accum_pos_inc, 1,
                              start_off, end_off)]
            self.accum_pos_inc = 0
            self.last_start_offset = max(self.last_start_offset,
                                         start_off)
            return out

        # delimiters only: swallow (hole) unless PRESERVE_ORIGINAL
        if it.end == DONE:
            if not self._has(PRESERVE_ORIGINAL):
                return []
            # reference emits the token with the INCOMING posInc attr
            # (accumPosInc is reset without being applied)
            self.accum_pos_inc = 0
            self.last_start_offset = max(self.last_start_offset,
                                         start_off)
            return [GraphToken(term, pos_inc, 1, start_off, end_off)]

        # ---- bufferWordParts ----
        saved_len = len(units)
        adjusting = self.adjust and (end_off - start_off == saved_len)
        # buffered: (startPos, endPos, startPart, endPart, termPart)
        buffered: List[list] = []
        concat = _Concat()
        concat_all = _Concat()
        last_concat_count = 0
        word_pos = 0

        def buf(term_part, sp, ep, s, e):
            buffered.append([sp, ep, s, e, term_part])

        def concatenate(c: _Concat):
            nonlocal word_pos
            if c.is_empty():
                c.type = it.type()
                c.start_part = it.current
                c.start_pos = word_pos
            c.units.extend(units[it.current:it.end])
            c.subword_count += 1
            c.end_part = it.end

        def concat_write(c: _Concat):
            buf(list(c.units), c.start_pos, word_pos,
                c.start_part, c.end_part)

        def flush_concat(c: _Concat):
            nonlocal word_pos, last_concat_count
            if word_pos == c.start_pos:
                word_pos += 1
            last_concat_count = c.subword_count
            if (c.subword_count != 1
                    or not self._should_generate(c.type)):
                concat_write(c)
            c.clear()

        if self._has(PRESERVE_ORIGINAL):
            buf(None, 0, 1, 0, saved_len)

        if it.is_single_word():
            buf(None, word_pos, word_pos + 1, it.current, it.end)
            word_pos += 1
            it.next()
        else:
            while it.end != DONE:
                word_type = it.type()
                if not concat.is_empty() and not concat.type & word_type:
                    flush_concat(concat)
                if self._should_concat(word_type):
                    concatenate(concat)
                if self._has(CATENATE_ALL):
                    concatenate(concat_all)
                if self._should_generate(word_type):
                    buf(None, word_pos, word_pos + 1,
                        it.current, it.end)
                    word_pos += 1
                it.next()
            if not concat.is_empty():
                flush_concat(concat)
            if not concat_all.is_empty():
                if concat_all.subword_count > last_concat_count:
                    if word_pos == concat_all.start_pos:
                        word_pos += 1
                    concat_write(concat_all)
                concat_all.clear()

        if self._has(PRESERVE_ORIGINAL):
            if word_pos == 0:
                word_pos += 1
            buffered[0][1] = word_pos

        # stable sort by (startPos asc, endPos desc); the PRESERVE
        # original row stays pinned at index 0
        head = 1 if self._has(PRESERVE_ORIGINAL) else 0
        buffered[head:] = sorted(
            buffered[head:], key=lambda b: (b[0], -b[1]))

        # ---- emit loop ----
        out: List[GraphToken] = []
        word_pos = 0
        for sp, ep, s, e, term_part in buffered:
            if not adjusting:
                so, eo = start_off, end_off
            else:
                so = start_off + s
                eo = start_off + e
            so = max(so, self.last_start_offset)
            eo = max(eo, self.last_start_offset)
            self.last_start_offset = so
            text = (_text(term_part) if term_part is not None
                    else _text(units[s:e]))
            out.append(GraphToken(
                text, self.accum_pos_inc + sp - word_pos, ep - sp,
                so, eo))
            self.accum_pos_inc = 0
            word_pos = sp
        return out


# ------------------------------------------------- serialized dispatch

_SEP = "\x1f"
_FS = "\x1e"

_F = {"GW": GENERATE_WORD_PARTS, "GN": GENERATE_NUMBER_PARTS,
      "CW": CATENATE_WORDS, "CN": CATENATE_NUMBERS, "CA": CATENATE_ALL,
      "PO": PRESERVE_ORIGINAL, "SC": SPLIT_ON_CASE_CHANGE,
      "SN": SPLIT_ON_NUMERICS, "SP": STEM_ENGLISH_POSSESSIVE}

MODES = {
    "full": (_F["GW"] | _F["GN"] | _F["CW"] | _F["CN"] | _F["SC"]
             | _F["SN"] | _F["SP"], True, None),
    "catall": (_F["GW"] | _F["GN"] | _F["CA"] | _F["PO"] | _F["SC"]
               | _F["SN"], True, None),
    "minimal": (_F["GW"] | _F["GN"], True, None),
    "preserve": (_F["PO"] | _F["SC"] | _F["SN"], True, None),
    "noadjust": (_F["GW"] | _F["GN"] | _F["CW"] | _F["CN"] | _F["SC"]
                 | _F["SN"] | _F["SP"], False, None),
    "protected": (_F["GW"] | _F["GN"] | _F["SC"] | _F["SN"], True,
                  ("NASA", "mp3")),
    "possessive": (_F["GW"] | _F["SC"] | _F["SP"], True, None),
    "catnum": (_F["GN"] | _F["CN"] | _F["SN"], True, None),
    # graph-producing configs flattened for indexing by
    # core/FlattenGraphFilter.java (analysis/flattengraph.py)
    "flat_full": "full",
    "flat_catall": "catall",
    "flat_preserve": "preserve",
}


def _ws_tokens(text: str) -> List[Tuple[str, int, int]]:
    """WhitespaceTokenizer analog in UTF-16 offsets (the oracle chain's
    source; Java isWhitespace within ASCII+Latin-1 == the chartok
    space table, reused here)."""
    from .chartokenizers import char_tokenize

    return [(t.term, t.start, t.end)
            for t in char_tokenize(text, "ws")]


def wdgf_tokenize(text: str, mode: str) -> List[GraphToken]:
    if isinstance(MODES[mode], str):
        from .flattengraph import flatten_graph

        return flatten_graph(wdgf_tokenize(text, MODES[mode]))
    flags, adjust, prot = MODES[mode]
    f = WordDelimiterGraph(flags, prot_words=prot,
                           adjust_internal_offsets=adjust)
    out: List[GraphToken] = []
    for term, so, eo in _ws_tokens(text):
        out.extend(f.process_token(term, so, eo))
    return out


def wdgf_serialize(text: str, mode: str) -> str:
    return _SEP.join(
        _FS.join((t.term, str(t.pos_inc), str(t.pos_len),
                  str(t.start), str(t.end)))
        for t in wdgf_tokenize(text, mode))


def wdgf_udf(mode_col, text_col):
    """Arrow-batched (mode, text) -> serialized graph token column."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _run(modes, texts):
        return pd.Series([
            wdgf_serialize(t if t is not None else "", m)
            for m, t in zip(modes, texts)])

    return pandas_udf(_run, "string")(mode_col, text_col)
