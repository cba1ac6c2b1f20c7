"""CharFilters — MappingCharFilter and HTMLStripCharFilter
re-expressed for Spark text pipelines.

* ``mapping_charfilter`` — MappingCharFilter
  (lucene/analysis/common/src/java/org/apache/lucene/analysis/
  charfilter/{MappingCharFilter,NormalizeCharMap}.java): greedy
  longest-match replacement at every input position.
* ``html_strip`` — HTMLStripCharFilter, a faithful re-implementation
  of the reference's JFlex scanner
  (charfilter/HTMLStripCharFilter.jflex, 930 lines): tags stripped
  (block-level start/end tags and <br> become '\\n', inline elements
  vanish), scripts/styles dropped and replaced by '\\n', comments and
  server-side includes (with quoted-string awareness) dropped, CDATA
  content kept, processing instructions dropped, named/numeric/
  surrogate-pair character references decoded (HTML-4 entity table
  frozen as data in fixtures_data/html_entities.json), EOF-truncated
  constructs resolved per the reference's %eof block, and an
  ``escaped_tags`` set preserved verbatim. States and rule
  longest-match order mirror the JFlex grammar one-to-one; parity is
  enforced by the reference JUnit vectors (tests/test_charfilter.py)
  and a corpus comparison against the reference scanner compiled as a
  JVM oracle (scripts/make_charfilter_fixture.py), 0 mismatches.

The Spark surface is the Arrow-batched ``html_strip_udf`` /
``charfilter_udf`` dispatchers (``mapInPandas``-compatible, no
per-row Python in the JVM pipeline); at 100 TB the filter is a
narrow per-document map — no shuffle, linear scan per doc.
"""

from __future__ import annotations

import json
import os
import re
import unicodedata
from typing import Dict, List, Optional, Sequence, Set, Tuple

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import StringType

__all__ = [
    "mapping_charfilter", "html_strip", "HTML_ENTITIES",
    "CHARFILTER_CASES", "charfilter_udf", "html_strip_udf",
]

_FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures_data")

with open(os.path.join(_FIXTURE_DIR, "html_entities.json"),
          encoding="utf-8") as _f:
    #: HTML-4 named character entities (incl. the six accepted
    #: uppercase variants), frozen from the reference's
    #: HTMLCharacterEntities.jflex table.
    HTML_ENTITIES: Dict[str, str] = json.load(_f)

_MAX_ENTITY_LEN = max(len(k) for k in HTML_ENTITIES)


# ------------------------------------------------------ MappingCharFilter

def mapping_charfilter(text: str, mappings: Dict[str, str]) -> str:
    """MappingCharFilter.read (MappingCharFilter.java:60): at each
    position take the longest mapping key matching the input and emit
    its replacement, else pass the char through. Matching is exact
    (NormalizeCharMap FSTs are case-sensitive)."""
    if not mappings:
        return text
    max_len = max(len(k) for k in mappings)
    by_first: Dict[str, List[str]] = {}
    for k in mappings:
        by_first.setdefault(k[0], []).append(k)
    out: List[str] = []
    i, n = 0, len(text)
    while i < n:
        keys = by_first.get(text[i])
        best = None
        if keys:
            for ln in range(min(max_len, n - i), 0, -1):
                cand = text[i:i + ln]
                if cand in mappings:
                    best = cand
                    break
        if best is not None:
            out.append(mappings[best])
            i += len(best)
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


# ----------------------------------------------------- HTMLStripCharFilter

# JFlex \s under %unicode = \p{Whitespace}
_WS = "[\\t-\\r \\x85\\xa0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]"

_EVENT_SUFFIXES = ("abort", "blur", "change", "click", "dblclick",
                   "error", "focus", "keydown", "keypress", "keyup",
                   "load", "mousedown", "mousemove", "mouseout",
                   "mouseover", "mouseup", "reset", "select", "submit",
                   "unload")


def _ci(word: str) -> str:
    """Case-insensitive literal via explicit classes (JFlex writes
    [aA][bB]...; Python's re.I would also match Kelvin-sign etc.)."""
    return "".join("[%s%s]" % (c, c.upper()) if c.isalpha() else c
                   for c in word)


_SINGLE_QUOTED = r"'(?:\\'|[^']*)*'"
_DOUBLE_QUOTED = r'"(?:\\"|[^"]*)*"'
_SSI_RX = r"<!--#(?:[^'\"]|%s|%s)*-->" % (_SINGLE_QUOTED, _DOUBLE_QUOTED)
_EVENT_ATTR = r"[oO][nN](?:%s)%s*=%s*(?:%s|%s)" % (
    "|".join(_ci(s) for s in _EVENT_SUFFIXES), _WS, _WS,
    _SINGLE_QUOTED, _DOUBLE_QUOTED)
_OPEN_TAG_CONTENT = r"(?:%s|[^<>]|%s)*" % (_EVENT_ATTR, _SSI_RX)

_START_TAG_TAIL_RX = re.compile(
    r"(?:(?:=%s*|%s+)%s)?%s*/?>" % (_WS, _WS, _OPEN_TAG_CONTENT, _WS))
_END_TAG_TAIL_RX = re.compile(r"%s*>" % _WS)
_PI_RX = re.compile(r"\?[^>]*[/?]>")
_BR_START_RX = re.compile(
    r"%s*%s(?:(?:=%s*|%s+)%s)?%s*/?>" % (
        _WS, _ci("br"), _WS, _WS, _OPEN_TAG_CONTENT, _WS))
_SCRIPT_START_RX = re.compile(
    r"%s*%s(?:%s+%s)?%s*>" % (_WS, _ci("script"), _WS,
                              _OPEN_TAG_CONTENT, _WS))
_STYLE_START_RX = re.compile(
    r"%s*%s(?:%s+%s)?%s*>" % (_WS, _ci("style"), _WS,
                              _OPEN_TAG_CONTENT, _WS))
_BR_END_RX = re.compile(r"%s%s*>" % (_ci("br"), _WS))
_SCRIPT_END_RX = re.compile(r"</%s*%s%s*>" % (_WS, _ci("script"), _WS))
_STYLE_END_RX = re.compile(r"</%s*%s%s*>" % (_WS, _ci("style"), _WS))
_WS_RX = re.compile(_WS + "+")
_NUM_HEX_RX = re.compile(r"[xX][0-9A-Fa-f]+")
_NUM_DEC_RX = re.compile(r"[0-9]+")

# The four paired-surrogate character-reference rules (AMPERSAND state)
_SURR_HEX_HEX = re.compile(
    r"#[xX][dD][89aAbB][0-9a-fA-F]{2};&#[xX][dD][c-fC-F][0-9a-fA-F]{2};")
_SURR_DEC_HEX = re.compile(
    r"#5[56][0-9]{3};&#[xX][dD][c-fC-F][0-9a-fA-F]{2};")
_SURR_HEX_DEC = re.compile(
    r"#[xX][dD][89aAbB][0-9a-fA-F]{2};&#5[67][0-9]{3};")
_SURR_DEC_DEC = re.compile(r"#5[56][0-9]{3};&#5[67][0-9]{3};")

_INLINE_ELEMENTS = frozenset((
    "a", "abbr", "acronym", "b", "basefont", "bdo", "big", "cite",
    "code", "dfn", "em", "font", "i", "img", "input", "kbd", "label",
    "q", "s", "samp", "select", "small", "span", "strike", "strong",
    "sub", "sup", "textarea", "tt", "u", "var"))

_OTHER_ID_START = "ᢅᢆ℘℮゛゜"
_OTHER_ID_CONTINUE = "··᧚" + "".join(
    chr(c) for c in range(0x1369, 0x1372))


def _is_id_start(ch: str) -> bool:
    return (ch.isalpha() or unicodedata.category(ch) == "Nl"
            or ch in _OTHER_ID_START)


def _is_id_continue(ch: str) -> bool:
    return (_is_id_start(ch) or ch in _OTHER_ID_CONTINUE
            or unicodedata.category(ch) in ("Mn", "Mc", "Nd", "Pc"))


def _match_name(text: str, i: int) -> int:
    """XML Name = [:_ID_Start][-.:_ID_Continue]* ; returns match
    length (0 = no match)."""
    n = len(text)
    if i >= n:
        return 0
    ch = text[i]
    if not (ch in ":_" or _is_id_start(ch)):
        return 0
    j = i + 1
    while j < n and (text[j] in "-.:_" or _is_id_continue(text[j])):
        j += 1
    return j - i


def _match_entity(text: str, i: int) -> int:
    """Longest {CharacterEntities} name at i (0 = none)."""
    for ln in range(min(_MAX_ENTITY_LEN, len(text) - i), 0, -1):
        if text[i:i + ln] in HTML_ENTITIES:
            return ln
    return 0


# scanner states
(_INITIAL, _AMP, _NUMERIC, _CRT, _LAB, _LAB_SLASH, _LAB_SPACE, _BANG,
 _COMMENT, _CDATA, _SSI, _SQ, _DQ, _SCRIPT, _STYLE, _SCRIPT_COMMENT,
 _STYLE_COMMENT, _STT_INCLUDE, _STT_EXCLUDE, _STT_SUBSTITUTE,
 _ETT_INCLUDE, _ETT_EXCLUDE, _ETT_SUBSTITUTE) = range(23)

_EOF_EXCLUDE = frozenset((
    _SCRIPT, _COMMENT, _SCRIPT_COMMENT, _STYLE, _STYLE_COMMENT, _SQ,
    _DQ, _ETT_EXCLUDE, _ETT_SUBSTITUTE, _STT_EXCLUDE, _SSI,
    _STT_SUBSTITUTE))
_EOF_INCLUDE = frozenset((
    _BANG, _CDATA, _AMP, _NUMERIC, _ETT_INCLUDE, _STT_INCLUDE, _LAB,
    _LAB_SLASH, _LAB_SPACE))


def html_strip(text: str,
               escaped_tags: Optional[Sequence[str]] = None) -> str:
    """Strip HTML constructs from ``text`` exactly as the reference
    HTMLStripCharFilter does (see module docstring). ``escaped_tags``
    (case-insensitive) are passed through verbatim; BR/SCRIPT/STYLE
    get their dedicated escape flags as in the reference ctor
    (HTMLStripCharFilter.jflex:178-198)."""
    escape_br = escape_script = escape_style = False
    esc_set: Set[str] = set()
    if escaped_tags:
        for tag in escaped_tags:
            low = tag.lower()
            if low == "br":
                escape_br = True
            elif low == "script":
                escape_script = True
            elif low == "style":
                escape_style = True
            else:
                esc_set.add(low)

    out: List[str] = []
    seg: List[str] = []          # inputSegment (raw consumed chars)
    entity: List[str] = []       # entitySegment (pending substitution)
    state = _INITIAL
    restore_state = previous_restore_state = _INITIAL
    i, n = 0, len(text)

    def escaped(name: str) -> bool:
        return bool(esc_set) and name.lower() in esc_set

    while i < n:
        if state == _INITIAL:
            ch = text[i]
            if ch == "&":
                seg = ["&"]
                i += 1
                state = _AMP
            elif ch == "<":
                seg = ["<"]
                i += 1
                state = _LAB
            else:
                out.append(ch)
                i += 1

        elif state == _AMP:
            ent_len = _match_entity(text, i)
            m_hh = _SURR_HEX_HEX.match(text, i)
            m_dh = _SURR_DEC_HEX.match(text, i)
            m_hd = _SURR_HEX_DEC.match(text, i)
            m_dd = _SURR_DEC_DEC.match(text, i)
            # longest-match; rule order: entities, "#", surrogate pairs
            cands: List[Tuple[int, int, str]] = []
            if ent_len:
                cands.append((ent_len, 0, "ent"))
            if text[i] == "#":
                cands.append((1, 1, "hash"))
            for rank, m, kind in ((2, m_hh, "hh"), (3, m_dh, "dh"),
                                  (4, m_hd, "hd"), (5, m_dd, "dd")):
                if m:
                    cands.append((m.end() - i, rank, kind))
            if not cands:
                # combined-xstate fallback: pushback, emit inputSegment
                out.extend(seg)
                state = _INITIAL
                continue
            cands.sort(key=lambda c: (-c[0], c[1]))
            ln, _, kind = cands[0]
            matched = text[i:i + ln]
            if kind == "ent":
                seg.append(matched)
                entity = [HTML_ENTITIES[matched]]
                i += ln
                state = _CRT
            elif kind == "hash":
                seg.append("#")
                i += 1
                state = _NUMERIC
            else:
                # paired UTF-16 surrogate references
                sp = matched
                if kind == "hh":
                    hi_v = int(sp[2:6], 16)
                    lo_v = int(sp[10:14], 16)
                    ok = True
                elif kind == "dh":
                    hi_v = int(sp[1:6])
                    lo_v = int(sp[10:14], 16)
                    ok = 0xD800 <= hi_v <= 0xDBFF
                elif kind == "hd":
                    hi_v = int(sp[2:6], 16)
                    lo_v = int(sp[9:14])
                    ok = 0xDC00 <= lo_v <= 0xDFFF
                else:
                    hi_v = int(sp[1:6])
                    lo_v = int(sp[9:14])
                    ok = (0xD800 <= hi_v <= 0xDBFF
                          and 0xDC00 <= lo_v <= 0xDFFF)
                if ok:
                    out.append(chr(0x10000 + ((hi_v - 0xD800) << 10)
                                   + (lo_v - 0xDC00)))
                    seg = []
                    i += ln
                    state = _INITIAL
                else:
                    # yypushback(len-1): consume only '#'
                    seg.append("#")
                    i += 1
                    state = _NUMERIC

        elif state == _NUMERIC:
            m = _NUM_HEX_RX.match(text, i) or _NUM_DEC_RX.match(text, i)
            if not m:
                out.extend(seg)
                state = _INITIAL
                continue
            matched = m.group()
            ln = len(matched)
            seg.append(matched)
            i = m.end()
            is_hex = matched[0] in "xX"
            limit = 6 if is_hex else 7
            cp = -1
            if ln <= limit:
                cp = int(matched[1:], 16) if is_hex else int(matched)
            if 0 <= cp <= 0x10FFFF:
                if 0xD800 <= cp <= 0xDFFF:
                    entity = ["�"]
                else:
                    entity = [chr(cp)]
                state = _CRT
            else:
                out.extend(seg)
                state = _INITIAL

        elif state == _CRT:
            if text[i] == ";":
                out.extend(entity)
                i += 1
            else:
                out.extend(seg)
            state = _INITIAL

        elif state == _LAB:
            rest = text[i]
            m_pi = _PI_RX.match(text, i)
            m_br = _BR_START_RX.match(text, i)
            m_script = _SCRIPT_START_RX.match(text, i)
            m_style = _STYLE_START_RX.match(text, i)
            m_ws = _WS_RX.match(text, i)
            name_len = _match_name(text, i)
            cands = []
            if rest == "!":
                cands.append((1, 0, "bang"))
            if rest == "/":
                cands.append((1, 1, "slash"))
            if m_ws:
                cands.append((m_ws.end() - i, 2, "ws"))
            if m_pi:
                cands.append((m_pi.end() - i, 3, "pi"))
            if m_br:
                cands.append((m_br.end() - i, 4, "br"))
            if m_script:
                cands.append((m_script.end() - i, 5, "script"))
            if m_style:
                cands.append((m_style.end() - i, 6, "style"))
            if name_len:
                nm = text[i:i + name_len]
                rank = 7 if nm.lower() in _INLINE_ELEMENTS else 8
                cands.append((name_len, rank, "name"))
            if not cands:
                out.extend(seg)
                state = _INITIAL
                continue
            cands.sort(key=lambda c: (-c[0], c[1]))
            ln, _, kind = cands[0]
            matched = text[i:i + ln]
            if kind == "bang":
                seg.append("!")
                i += 1
                state = _BANG
            elif kind == "slash":
                seg.append("/")
                i += 1
                state = _LAB_SLASH
            elif kind == "ws":
                seg.append(matched)
                i += ln
                state = _LAB_SPACE
            elif kind == "pi":
                seg = []
                i += ln
                state = _INITIAL
            elif kind == "br":
                i += ln
                state = _INITIAL
                if escape_br:
                    seg.append(matched)
                    out.extend(seg)
                else:
                    out.append("\n")
                seg = []
            elif kind in ("script", "style"):
                i += ln
                state = _SCRIPT if kind == "script" else _STYLE
                esc = escape_script if kind == "script" else escape_style
                if esc:
                    seg.append(matched)
                    out.extend(seg)
                seg = []
            else:  # name / inline element
                seg.append(matched)
                i += ln
                nm = matched.lower()
                if escaped(matched):
                    state = _STT_INCLUDE
                elif nm in _INLINE_ELEMENTS:
                    state = _STT_EXCLUDE
                else:
                    state = _STT_SUBSTITUTE

        elif state == _LAB_SPACE:
            name_len = _match_name(text, i)
            if not name_len:
                out.extend(seg)
                state = _INITIAL
                continue
            matched = text[i:i + name_len]
            seg.append(matched)
            i += name_len
            if escaped(matched):
                state = _STT_INCLUDE
            elif matched.lower() in _INLINE_ELEMENTS:
                state = _STT_EXCLUDE
            else:
                state = _STT_SUBSTITUTE

        elif state == _LAB_SLASH:
            m_ws = _WS_RX.match(text, i)
            m_br = _BR_END_RX.match(text, i)
            name_len = _match_name(text, i)
            cands = []
            if m_ws:
                cands.append((m_ws.end() - i, 0, "ws"))
            if m_br:
                cands.append((m_br.end() - i, 1, "br"))
            if name_len:
                nm = text[i:i + name_len]
                rank = 2 if nm.lower() in _INLINE_ELEMENTS else 3
                cands.append((name_len, rank, "name"))
            if not cands:
                out.extend(seg)
                state = _INITIAL
                continue
            cands.sort(key=lambda c: (-c[0], c[1]))
            ln, _, kind = cands[0]
            matched = text[i:i + ln]
            if kind == "ws":
                seg.append(matched)
                i += ln
            elif kind == "br":
                i += ln
                state = _INITIAL
                if escape_br:
                    seg.append(matched)
                    out.extend(seg)
                else:
                    out.append("\n")
                seg = []
            else:
                seg.append(matched)
                i += ln
                if escaped(matched):
                    state = _ETT_INCLUDE
                elif matched.lower() in _INLINE_ELEMENTS:
                    state = _ETT_EXCLUDE
                else:
                    state = _ETT_SUBSTITUTE

        elif state in (_ETT_INCLUDE, _ETT_EXCLUDE, _ETT_SUBSTITUTE):
            m = _END_TAG_TAIL_RX.match(text, i)
            if not m:
                out.extend(seg)
                state = _INITIAL
                continue
            if state == _ETT_INCLUDE:
                seg.append(m.group())
                out.extend(seg)
            elif state == _ETT_SUBSTITUTE:
                out.append("\n")
            seg = []
            i = m.end()
            state = _INITIAL

        elif state in (_STT_INCLUDE, _STT_EXCLUDE, _STT_SUBSTITUTE):
            m = _START_TAG_TAIL_RX.match(text, i)
            if not m:
                out.extend(seg)
                state = _INITIAL
                continue
            if state == _STT_INCLUDE:
                seg.append(m.group())
                out.extend(seg)
            elif state == _STT_SUBSTITUTE:
                out.append("\n")
            seg = []
            i = m.end()
            state = _INITIAL

        elif state == _BANG:
            if text.startswith("--", i):
                if len("".join(seg)) > 2:
                    seg.append("--")
                else:
                    state = _COMMENT
                i += 2
            elif text[i] == ">":
                seg = []
                i += 1
                state = _INITIAL
            elif text.startswith("[CDATA[", i):
                if len("".join(seg)) > 2:
                    seg.append("[CDATA[")
                else:
                    seg = []
                    state = _CDATA
                i += 7
            else:
                seg.append(text[i])
                i += 1

        elif state == _COMMENT:
            if text.startswith("<!--#", i):
                restore_state = _COMMENT
                i += 5
                state = _SSI
            elif text.startswith("-->", i):
                seg = []
                i += 3
                state = _INITIAL
            else:
                i += 1

        elif state == _CDATA:
            if text.startswith("]]>", i):
                i += 3
                state = _INITIAL
            else:
                out.append(text[i])
                i += 1

        elif state == _SSI:
            ch = text[i]
            if text.startswith("-->", i):
                i += 3
                state = restore_state
            elif ch == "'":
                previous_restore_state = restore_state
                restore_state = _SSI
                i += 1
                state = _SQ
            elif ch == '"':
                previous_restore_state = restore_state
                restore_state = _SSI
                i += 1
                state = _DQ
            else:
                i += 1

        elif state in (_SQ, _DQ):
            quote = "'" if state == _SQ else '"'
            ch = text[i]
            if ch == "\\" and i + 1 < n:
                i += 2
            elif ch == quote:
                i += 1
                state = restore_state
                restore_state = previous_restore_state
            else:
                i += 1

        elif state in (_SCRIPT, _STYLE):
            end_rx = _SCRIPT_END_RX if state == _SCRIPT else _STYLE_END_RX
            esc = escape_script if state == _SCRIPT else escape_style
            if text.startswith("<!--", i):
                i += 4
                state = (_SCRIPT_COMMENT if state == _SCRIPT
                         else _STYLE_COMMENT)
            else:
                m = end_rx.match(text, i)
                if m:
                    if esc:
                        out.append(m.group())
                    else:
                        out.append("\n")
                    seg = []
                    i = m.end()
                    state = _INITIAL
                else:
                    i += 1

        elif state in (_SCRIPT_COMMENT, _STYLE_COMMENT):
            ch = text[i]
            if text.startswith("<!--#", i):
                restore_state = state
                i += 5
                state = _SSI
            elif ch == "'":
                restore_state = state
                i += 1
                state = _SQ
            elif ch == '"':
                restore_state = state
                i += 1
                state = _DQ
            elif text.startswith("-->", i):
                i += 3
                state = _SCRIPT if state == _SCRIPT_COMMENT else _STYLE
            else:
                i += 1

    # %eof block
    if state in _EOF_INCLUDE:
        out.extend(seg)
    elif state == _CRT:
        out.extend(entity)
    # _EOF_EXCLUDE and _INITIAL: nothing

    return "".join(out)


# --------------------------------------------------- Spark gate surface

_TEST_MAPPINGS = {
    "aa": "a", "bbb": "b", "cccc": "cc", "h": "i", "j": "jj",
    "k": "kkk", "ll": "llll", "empty": "", "\U0001D122": "fclef",
    "！": "full-width-exclamation",
}

CHARFILTER_CASES = {
    "html_strip": lambda s: html_strip(s),
    "html_strip_escbr": lambda s: html_strip(s, ["BR"]),
    "html_strip_escaped": lambda s: html_strip(
        s, ["reserved", "escaped", "SCRIPT", "STYLE"]),
    "mapping": lambda s: mapping_charfilter(s, _TEST_MAPPINGS),
}


@F.pandas_udf(StringType())
def _charfilter_pd(names: pd.Series, texts: pd.Series) -> pd.Series:
    return pd.Series([
        None if t is None else CHARFILTER_CASES[nm](t)
        for nm, t in zip(names, texts)
    ])


def charfilter_udf(name_col, text_col) -> Column:
    """Arrow-batched dispatcher: apply CHARFILTER_CASES[name] per row."""
    return _charfilter_pd(name_col, text_col)


@F.pandas_udf(StringType())
def _html_strip_pd(texts: pd.Series) -> pd.Series:
    return pd.Series([
        None if t is None else html_strip(t) for t in texts
    ])


def html_strip_udf(text_col) -> Column:
    """Arrow-batched HTML strip of a document column (the LLM-pipeline
    web-text cleaning hot path)."""
    return _html_strip_pd(text_col)
