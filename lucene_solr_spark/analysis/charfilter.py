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


# ------------------------------------------------------------------
# JVM fast path for the default-config strip (the LLM-ingest web-text
# cleaning hot path).  The reference scanner's common-case rules —
# simple start/end tags (inline elements vanish, everything else and
# <br> becomes '\n') and the high-frequency named character references
# — are an exact regexp/replace chain that whole-stage codegen runs
# JVM-side; every construct whose semantics the chain cannot mirror
# bit-exactly (comments/CDATA/DOCTYPE/SSI '<!', processing
# instructions '<?', script/style elements, quoted event-handler
# attributes that may hide '>', non-ASCII tag names, any character
# reference outside the fast set, and '<'-whitespace-'<' sequences
# whose pushback interleaves with tag deletion) routes that ROW to the
# exact Python machine above.  The eligibility predicate is
# deliberately conservative: a false fallback only costs speed, never
# parity.  Parity of the chain itself is enforced against the Python
# machine (itself 0-mismatch vs the reference's compiled JFlex
# scanner) over the golden fixture corpus + randomized construct mixes
# (tests/test_charfilter_fast.py).

# ASCII tag-name shape (rows with non-ASCII inside a tag fall back):
# XML NameStart ∩ ASCII = [A-Za-z_:], NameContinue adds [0-9.-]
_J_NAME = r"[A-Za-z_:][A-Za-z0-9._:\-]*"
_J_NAMEC = r"[A-Za-z0-9._:\-]"
# start-tag tail after the name (HTMLStripCharFilter.jflex
# InStartTagName→InStartTag): with event attrs / SSI excluded by
# eligibility, OPEN_TAG_CONTENT reduces to [^<>]* — tags end at the
# first '>', quotes NOT honored (verified reference behavior).
# Java \s == [ \t\n\x0B\f\r] == the ASCII subset of the scanner's
# whitespace class; non-ASCII whitespace inside a tag falls back.
_J_TAIL = r"(?:(?:=\s*|\s+)[^<>]*)?\s*/?>"
_J_INLINE = "|".join(sorted(_INLINE_ELEMENTS, key=len, reverse=True))
_J_IS_INLINE = r"(?i:(?:%s))(?!%s)" % (_J_INLINE, _J_NAMEC)
# non-inline start/end tags (and <br>, which is not inline) → '\n'.
# Every pattern here keeps a LITERAL '<' head (alternation factored
# to the right of it): Java's Pattern start optimization then skips
# between '<'s at scan speed instead of attempting the NFA at every
# char — measured 7× on the tag passes.
_J_PASS_NEWLINE = (
    r"<(?:\s*(?!%(inl)s)%(name)s%(tail)s"
    r"|/\s*(?!%(inl)s)%(name)s\s*>)"
) % {"inl": _J_IS_INLINE, "name": _J_NAME, "tail": _J_TAIL}
# inline-element start/end tags → removed; third alternative: an
# EOF-truncated tag ('<'/'</' + optional ws + name running EXACTLY to
# end-of-input) is silently dropped (the scanner parks in an
# InStartTagName/InEndTagName state and the %eof block discards it —
# any other truncation pushes back verbatim).  \z, not $ ($ would
# also match before a final newline).  Pass order is immaterial under
# the '<[^>]*<' eligibility guard — see HTML_FAST_INELIGIBLE_RX.
_J_PASS_EMPTY = (
    r"<(?:\s*%(inl)s%(tail)s"
    r"|/\s*%(inl)s\s*>"
    r"|/?\s*%(name)s\z)"
) % {"inl": _J_IS_INLINE, "tail": _J_TAIL, "name": _J_NAME}
# high-frequency named references (exact-case table keys + ';').
# '&amp;'/'&AMP;' run LAST: their '&' output must not be re-scanned
# into another reference (string replace never re-scans its own
# output, and no other replacement emits '&').
_J_FAST_ENTITIES = (
    ("&lt;", "<"), ("&LT;", "<"), ("&gt;", ">"), ("&GT;", ">"),
    ("&quot;", '"'), ("&QUOT;", '"'), ("&apos;", "'"),
    ("&nbsp;", " "), ("&amp;", "&"), ("&AMP;", "&"),
)
_J_FAST_ENTITY_NAMES = "|".join(
    e[0][1:-1] for e in _J_FAST_ENTITIES
)
# rows matching ANY of these go to the Python machine (see above).
# '<[^>]*<' (two '<' with no '>' between) is the pass-independence
# guard: every cross-pass reinterpretation of a pushback-verbatim '<'
# requires a second '<' inside its would-be tail, so excluding it
# makes the chain's pass order immaterial.  All '<'-anchored checks
# (second '<', non-ASCII, quoted event-handler attr — each only
# meaningful inside a tag) share ONE scan-to-'>' per '<', and the
# event/entity checks never probe positions that aren't '<'/'&' —
# the predicate is one linear probe per delimiter, not per char.
# split by literal prefix so each rlike keeps Java's start-char scan
HTML_FAST_INELIGIBLE_LT_RX = (
    r"<(?:[!?]"
    r"|\s*(?i:script|style)"
    r"|[^>]*(?:<|[^\x00-\x7f]|[oO][nN][a-zA-Z]+\s*=\s*['\"]))"
)
HTML_FAST_INELIGIBLE_AMP_RX = (
    r"&(?!(?:%s);)[A-Za-z#]" % _J_FAST_ENTITY_NAMES
)
HTML_FAST_INELIGIBLE_RX = "(?:%s)|(?:%s)" % (
    HTML_FAST_INELIGIBLE_LT_RX, HTML_FAST_INELIGIBLE_AMP_RX
)


def html_strip_jvm(text_col) -> Column:
    """The pure-JVM strip chain. ONLY exact on rows where
    ``HTML_FAST_INELIGIBLE_RX`` does not match — callers must dispatch
    (use ``html_strip_udf``)."""
    col = text_col if isinstance(text_col, Column) else F.col(text_col)
    out = F.regexp_replace(col, _J_PASS_NEWLINE, "\n")
    out = F.regexp_replace(out, _J_PASS_EMPTY, "")
    ent = out
    for e, rep in _J_FAST_ENTITIES:
        ent = F.replace(ent, F.lit(e), F.lit(rep))
    # rows without '&' skip the ten reference-replace scans (CaseWhen
    # short-circuits per row in codegen)
    return F.when(out.contains("&"), ent).otherwise(out)


def html_strip_udf(text_col, fast: bool = True) -> Column:
    """Arrow-batched HTML strip of a document column (the LLM-pipeline
    web-text cleaning hot path).

    fast=True (default): common-case rows run the whole-stage-codegen
    JVM chain; only rows containing a rare construct cross into the
    exact Python machine — and only THOSE rows' text crosses the
    Arrow boundary (the Python UDF receives NULL for fast rows, so a
    clean-text corpus pays ~zero Python cost)."""
    col = text_col if isinstance(text_col, Column) else F.col(text_col)
    if not fast:
        return _html_strip_pd(col)
    # identity shortcut: without '<' or '&' the strip is a no-op —
    # JVM CaseWhen/coalesce short-circuit per row (contains() is a
    # plain substring probe), so already-clean corpora skip even the
    # regex passes.  The eligibility rlike is evaluated exactly once
    # (inside the UDF's input projection); the UDF receives NULL for
    # every fast row and returns NULL, so coalesce() falls through to
    # the JVM branches and only ineligible rows' text ever crosses
    # the Arrow boundary.
    trivial = ~(col.contains("<") | col.contains("&"))
    needs_py = ~trivial & (
        col.rlike(HTML_FAST_INELIGIBLE_LT_RX)
        | col.rlike(HTML_FAST_INELIGIBLE_AMP_RX)
    )
    slow = _html_strip_pd(F.when(needs_py, col))
    # NULL input: slow=NULL, trivial=NULL→branch skipped, and the JVM
    # chain propagates NULL — no explicit isNull branch needed
    return F.coalesce(
        slow,
        F.when(trivial, col),
        html_strip_jvm(col),
    )
