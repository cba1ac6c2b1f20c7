"""WikipediaTokenizer — MediaWiki-markup-aware tokenization
re-expressed for Spark text pipelines.

Faithful re-implementation of the reference JFlex scanner
(lucene/analysis/common/src/java/org/apache/lucene/analysis/
wikipedia/WikipediaTokenizerImpl.jflex, 343 lines) and its wrapper
(wikipedia/WikipediaTokenizer.java): classic word/apostrophe/acronym/
company/email/host/num/CJ tokens plus typed wiki constructs —
internal links, categories, external link URL + anchor text, bold /
italics / bold-italics, headings / sub-headings, citations ({{...}}
and <ref>), infobox and HTML-tag skipping. The wrapper's three output
modes are supported: TOKENS_ONLY, UNTOKENIZED_ONLY (contiguous
same-type wiki tokens collapsed into one whitespace-reconstructed
token, flags=UNTOKENIZED_TOKEN_FLAG) and BOTH (collapsed token first,
then the individual tokens at posInc 0/1 —
WikipediaTokenizer.java:collapseAndSaveTokens). Every reference JUnit
vector (WikipediaTokenizerTest.java) is replayed in
tests/test_wikipedia.py, including the 97-token handwritten corpus
and the BOTH-mode offsets/posInc/flags table.

States and rule order mirror the grammar one-to-one; JFlex
longest-match is applied across each state's rules plus the global
``[^] | {TAGS}`` ignore (the grammar's states are inclusive %state
declarations, so the global rule applies everywhere). At 100 TB this
is a narrow Arrow map over wiki-dump documents — no shuffle.
"""

from __future__ import annotations

import re
from typing import FrozenSet, Iterable, List, NamedTuple, Optional, Set

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

__all__ = [
    "wikipedia_tokenize", "WikiToken", "TOKENS_ONLY",
    "UNTOKENIZED_ONLY", "BOTH", "UNTOKENIZED_TOKEN_FLAG", "TOKEN_TYPES",
]

TOKENS_ONLY = 0
UNTOKENIZED_ONLY = 1
BOTH = 2
UNTOKENIZED_TOKEN_FLAG = 1

# type ids (WikipediaTokenizer.java:63-81)
(ALPHANUM, APOSTROPHE, ACRONYM, COMPANY, EMAIL, HOST, NUM, CJ,
 INTERNAL_LINK, EXTERNAL_LINK, CITATION, CATEGORY, BOLD, ITALICS,
 BOLD_ITALICS, HEADING, SUB_HEADING, EXTERNAL_LINK_URL) = range(18)

TOKEN_TYPES = (
    "<ALPHANUM>", "<APOSTROPHE>", "<ACRONYM>", "<COMPANY>", "<EMAIL>",
    "<HOST>", "<NUM>", "<CJ>", "il", "el", "ci", "c", "b", "i", "bi",
    "h", "sh", "elu",
)

# character classes (WikipediaTokenizerImpl.jflex:127-140)
_LETTER = ("A-Za-z\u00c0-\u00d6\u00d8-\u00f6\u00f8-\u00ff"
           "\u0100-\u1fff\uffa0-\uffdc")
_DIGIT = ("0-9\u0660-\u0669\u06f0-\u06f9\u0966-\u096f"
          "\u09e6-\u09ef\u0a66-\u0a6f\u0ae6-\u0aef"
          "\u0b66-\u0b6f\u0be7-\u0bef\u0c66-\u0c6f"
          "\u0ce6-\u0cef\u0d66-\u0d6f\u0e50-\u0e59"
          "\u0ed0-\u0ed9\u1040-\u1049")
_KOREAN = "\uac00-\ud7af\u1100-\u11ff"
_CJ = ("\u3040-\u318f\u3100-\u312f\u30a0-\u30ff\u31f0-\u31ff"
       "\u3300-\u337f\u3400-\u4dbf\u4e00-\u9fff\uf900-\ufaff"
       "\uff65-\uff9f")

_AN = "[%s%s%s]+" % (_LETTER, _DIGIT, _KOREAN)        # ALPHANUM
_ALPHA = "[%s]+" % _LETTER
_LD = "[%s%s]" % (_LETTER, _DIGIT)
_HAS_DIGIT = "%s*[%s]%s*" % (_LD, _DIGIT, _LD)
_P = "[_\\-/.,]"
_WS1 = "(?:\\r\\n|[ \\r\\n\\t\\f])"

_RX_ALPHANUM = re.compile(_AN)
_RX_APOSTROPHE = re.compile("%s(?:'%s)+" % (_ALPHA, _ALPHA))
_RX_ACRONYM = re.compile("%s\\.(?:%s\\.)+" % (_ALPHA, _ALPHA))
_RX_COMPANY = re.compile("%s[&@]%s" % (_ALPHA, _ALPHA))
_RX_EMAIL = re.compile(
    "%s(?:[._\\-]%s)*@%s(?:[.\\-]%s)+" % (_AN, _AN, _AN, _AN))
_RX_HOST = re.compile("%s(?:\\.%s)+" % (_AN, _AN))
_RX_NUM = re.compile(
    "(?:%s)" % "|".join((
        "{an}{p}{hd}",
        "[{d}]+{p}[{d}]+",
        "{hd}{p}{an}",
        "{an}(?:{p}{hd}{p}{an})+",
        "{hd}(?:{p}{an}{p}{hd})+",
        "{an}{p}{hd}(?:{p}{an}{p}{hd})+",
        "{hd}{p}{an}(?:{p}{hd}{p}{an})+",
    )).format(an=_AN, p=_P, hd=_HAS_DIGIT, d=_DIGIT))
_RX_CJ = re.compile("[%s]" % _CJ)
_RX_TAGS = re.compile(
    "</?%s(?:%s*%s=\"%s\")*>" % (_AN, _WS1, _AN, _AN))
_RX_CAT = re.compile("\\[\\[:?Category:")
_RX_URL = re.compile(
    "(?:http://|https://)%s(?:/?(?:%s|%s|[?&=#])*)*"
    % (_RX_HOST.pattern, _AN, _P))
_RX_WS = re.compile(_WS1)
_RX_INFOBOX_OR_ANY = re.compile("(?:\\{\\{[Ii]nfobox_|[\\s\\S])")
_RX_ANY = re.compile("[\\s\\S]")

# scanner states
(_INITIAL, _CAT, _ILINK, _ELINK, _2SQ, _3SQ, _5SQ, _DEQ, _DBRACE,
 _STRING) = range(10)


class WikiToken(NamedTuple):
    term: str
    type: str
    start: int
    end: int
    pos_inc: int
    flags: int


class _Scanner:
    """WikipediaTokenizerImpl analog: next_token() returns a type id
    or None at EOF; yychar/yylength/pos_inc/nwts mirror the scanner
    accessors; pushback() rewinds the last match."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.state = _INITIAL
        self.cur = 0              # currentTokType
        self.num_balanced = 0
        self.pos_inc = 1
        self.num_link_toks = 0
        self.nwts = 0             # numWikiTokensSeen
        self.match_start = 0
        self.match_end = 0

    # --- helpers -----------------------------------------------------
    def _candidates(self, rules):
        """Longest match among ordered rules + the global [^]|{TAGS};
        returns (rule_index, match_len) with -1 for the global rule."""
        text, pos = self.text, self.pos
        best_len, best_idx = 0, None
        for idx, rx in rules:
            m = rx.match(text, pos)
            if m and m.end() - pos > best_len:
                best_len, best_idx = m.end() - pos, idx
        m = _RX_TAGS.match(text, pos)
        glen = m.end() - pos if m else 1
        if glen > best_len:
            return -1, glen
        return best_idx, best_len

    def yytext(self) -> str:
        return self.text[self.match_start:self.match_end]

    def pushback_all(self) -> None:
        self.pos = self.match_start

    # --- rule tables (order = file order) ----------------------------
    _LIT = {k: re.compile(re.escape(k)) for k in (
        "[[", "]]", "[", "]", "''", "'", "'''", "==", "=", "{{", "}}",
        "<ref>", "</ref>", "'''''", "===", "|")}

    def next_token(self) -> Optional[int]:
        text = self.text
        n = len(text)
        while self.pos < n:
            st = self.state
            if st == _INITIAL:
                rules = (
                    (0, _RX_ALPHANUM), (1, _RX_APOSTROPHE),
                    (2, _RX_ACRONYM), (3, _RX_COMPANY), (4, _RX_EMAIL),
                    (5, _RX_NUM), (6, _RX_HOST), (7, _RX_CJ),
                    (8, self._LIT["[["]), (9, _RX_CAT),
                    (10, self._LIT["["]), (11, self._LIT["''"]),
                    (12, self._LIT["=="]), (13, self._LIT["{{"]),
                    (14, self._LIT["<ref>"]), (15, _RX_INFOBOX_OR_ANY),
                )
            elif st == _ILINK:
                rules = ((0, _RX_ALPHANUM), (1, self._LIT["]]"]),
                         (2, _RX_ANY))
            elif st == _ELINK:
                rules = ((0, _RX_URL), (1, _RX_ALPHANUM),
                         (2, self._LIT["]"]), (3, _RX_WS))
            elif st == _CAT:
                rules = ((0, _RX_ALPHANUM), (1, self._LIT["]]"]),
                         (2, _RX_ANY))
            elif st == _2SQ:
                rules = ((0, self._LIT["'"]), (1, self._LIT["'''"]),
                         (2, _RX_ALPHANUM), (3, self._LIT["[["]),
                         (4, _RX_CAT), (5, self._LIT["["]), (6, _RX_ANY))
            elif st in (_3SQ, _5SQ):
                rules = ((0, _RX_ALPHANUM), (1, self._LIT["[["]),
                         (2, _RX_CAT), (3, self._LIT["["]), (4, _RX_ANY))
            elif st == _DEQ:
                rules = ((0, self._LIT["="]), (1, _RX_ALPHANUM),
                         (2, self._LIT["=="]), (3, _RX_ANY))
            elif st == _DBRACE:
                rules = ((0, _RX_ALPHANUM), (1, self._LIT["}}"]),
                         (2, self._LIT["</ref>"]), (3, _RX_ANY))
            else:  # _STRING
                rules = ((0, self._LIT["'''''"]), (1, self._LIT["'''"]),
                         (2, self._LIT["''"]), (3, self._LIT["==="]),
                         (4, _RX_ALPHANUM), (5, self._LIT["[["]),
                         (6, _RX_CAT), (7, self._LIT["["]),
                         (8, self._LIT["|"]), (9, _RX_ANY))

            idx, ln = self._candidates(rules)
            self.match_start = self.pos
            self.match_end = self.pos + ln
            self.pos = self.match_end
            if idx == -1:
                continue  # global [^]|{TAGS} ignore

            if st == _INITIAL:
                if idx <= 7:
                    self.pos_inc = 1
                    return (ALPHANUM, APOSTROPHE, ACRONYM, COMPANY,
                            EMAIL, NUM, HOST, CJ)[idx]
                self.nwts = 0
                self.pos_inc = 1
                if idx == 8:
                    self.cur = INTERNAL_LINK
                    self.state = _ILINK
                elif idx == 9:
                    self.cur = CATEGORY
                    self.state = _CAT
                elif idx == 10:
                    self.cur = EXTERNAL_LINK_URL
                    self.state = _ELINK
                elif idx == 11:
                    if self.num_balanced == 0:
                        self.num_balanced += 1
                        self.state = _2SQ
                    else:
                        self.num_balanced = 0
                elif idx == 12:
                    self.state = _DEQ
                elif idx == 13 or idx == 14:
                    self.cur = CITATION
                    self.state = _DBRACE
                # idx 15: ignore ([^]|{INFOBOX})

            elif st == _ILINK:
                if idx == 0:
                    self.nwts += 1
                    return self.cur
                if idx == 1:
                    self.num_link_toks = 0
                    self.state = _INITIAL
                else:
                    self.pos_inc = 1

            elif st == _ELINK:
                if idx == 0:
                    self.pos_inc = 1
                    self.nwts += 1
                    return self.cur
                if idx == 1:
                    self.pos_inc = 0 if self.num_link_toks == 0 else 1
                    self.nwts += 1
                    self.cur = EXTERNAL_LINK
                    self.num_link_toks += 1
                    return self.cur
                if idx == 2:
                    self.num_link_toks = 0
                    self.pos_inc = 0
                    self.state = _INITIAL
                else:
                    self.pos_inc = 1

            elif st == _CAT:
                if idx == 0:
                    self.nwts += 1
                    return self.cur
                if idx == 1:
                    self.state = _INITIAL
                else:
                    self.pos_inc = 1

            elif st == _2SQ:
                if idx == 0:
                    self.cur = BOLD
                    self.state = _3SQ
                elif idx == 1:
                    self.cur = BOLD_ITALICS
                    self.state = _5SQ
                elif idx == 2:
                    self.cur = ITALICS
                    self.nwts += 1
                    self.state = _STRING
                    return self.cur
                elif idx == 3:
                    self.cur = INTERNAL_LINK
                    self.nwts = 0
                    self.state = _ILINK
                elif idx == 4:
                    self.cur = CATEGORY
                    self.nwts = 0
                    self.state = _CAT
                elif idx == 5:
                    self.cur = EXTERNAL_LINK
                    self.nwts = 0
                    self.state = _ELINK

            elif st in (_3SQ, _5SQ):
                if idx == 0:
                    self.nwts += 1
                    self.state = _STRING
                    return self.cur
                if idx == 1:
                    self.cur = INTERNAL_LINK
                    self.nwts = 0
                    self.state = _ILINK
                elif idx == 2:
                    self.cur = CATEGORY
                    self.nwts = 0
                    self.state = _CAT
                elif idx == 3:
                    self.cur = EXTERNAL_LINK
                    self.nwts = 0
                    self.state = _ELINK

            elif st == _DEQ:
                if idx == 0:
                    self.cur = SUB_HEADING
                    self.nwts = 0
                    self.state = _STRING
                elif idx == 1:
                    self.cur = HEADING
                    self.nwts += 1
                    return self.cur
                elif idx == 2:
                    self.state = _INITIAL

            elif st == _DBRACE:
                if idx == 0:
                    self.nwts = 0
                    return self.cur
                if idx in (1, 2):
                    self.state = _INITIAL

            else:  # _STRING
                if idx in (0, 1, 2, 3):
                    self.num_balanced = 0
                    self.cur = ALPHANUM
                    self.state = _INITIAL
                elif idx == 4:
                    self.nwts += 1
                    return self.cur
                elif idx == 5:
                    self.num_balanced = 0
                    self.nwts = 0
                    self.cur = INTERNAL_LINK
                    self.state = _ILINK
                elif idx == 6:
                    self.num_balanced = 0
                    self.nwts = 0
                    self.cur = CATEGORY
                    self.state = _CAT
                elif idx == 7:
                    self.num_balanced = 0
                    self.nwts = 0
                    self.cur = EXTERNAL_LINK
                    self.state = _ELINK
                elif idx == 8:
                    return self.cur
        return None


def wikipedia_tokenize(
        text: str, token_output: int = TOKENS_ONLY,
        untokenized_types: Iterable[str] = ()) -> List[WikiToken]:
    """WikipediaTokenizer.incrementToken over a whole document."""
    if token_output not in (TOKENS_ONLY, UNTOKENIZED_ONLY, BOTH):
        raise ValueError("tokenOutput must be TOKENS_ONLY, "
                         "UNTOKENIZED_ONLY or BOTH")
    untok: FrozenSet[str] = frozenset(untokenized_types)
    sc = _Scanner(text)
    out: List[WikiToken] = []
    pending: List[WikiToken] = []
    first = True

    tok_type = sc.next_token()
    while tok_type is not None:
        type_s = TOKEN_TYPES[tok_type]
        if token_output == TOKENS_ONLY or type_s not in untok:
            term = sc.yytext()
            start = sc.match_start
            posinc = sc.pos_inc
            if first and posinc == 0:
                posinc = 1
            out.append(WikiToken(term, type_s, start,
                                 start + len(term), posinc, 0))
            first = False
            tok_type = sc.next_token()
            continue

        # collapse (UNTOKENIZED_ONLY / BOTH)
        buf = sc.yytext()
        the_start = sc.match_start
        last_pos = the_start + len(buf)
        num_seen = 0
        if token_output == BOTH:
            pending = [WikiToken(sc.yytext(), type_s, sc.match_start,
                                 sc.match_start + len(sc.yytext()),
                                 0, 0)]
        while True:
            tmp = sc.next_token()
            if tmp is None or tmp != tok_type or sc.nwts <= num_seen:
                break
            curr_pos = sc.match_start
            buf += " " * (curr_pos - last_pos)
            piece = sc.yytext()
            buf += piece
            if token_output == BOTH:
                pending.append(WikiToken(
                    piece, type_s, curr_pos, curr_pos + len(piece),
                    sc.pos_inc, 0))
            num_seen += 1
            last_pos = curr_pos + len(piece)
        trimmed = buf.strip()
        # posInc of the collapsed token = the scanner's value after the
        # lookahead (WikipediaTokenizer.incrementToken reads it AFTER
        # collapse)
        posinc = sc.pos_inc
        if first and posinc == 0:
            posinc = 1
        out.append(WikiToken(trimmed, type_s, the_start,
                             the_start + len(trimmed), posinc,
                             UNTOKENIZED_TOKEN_FLAG))
        first = False
        if token_output == BOTH:
            out.extend(pending)
            pending = []
        if tmp is not None:
            sc.pushback_all()
        tok_type = sc.next_token()
    return out


# --------------------------------------------------- Spark gate surface

_GATE_MODES = {
    "tokens_only": (TOKENS_ONLY, ()),
    "untokenized_only": (UNTOKENIZED_ONLY, ("c", "i", "b", "il")),
    "both": (BOTH, ("c", "i", "h")),
}


def _render(text: str, mode_name: str) -> str:
    mode, untok = _GATE_MODES[mode_name]
    return "\x1f".join(
        "\x1e".join((t.term, t.type, str(t.start), str(t.pos_inc),
                     str(t.flags)))
        for t in wikipedia_tokenize(text, mode, untok))


def wikipedia_udf(mode_col, text_col):
    """Arrow-batched dispatcher for the driver gate: render the token
    stream of the named mode as a flat string."""
    @F.pandas_udf(StringType())
    def _wiki_pd(modes: pd.Series, texts: pd.Series) -> pd.Series:
        return pd.Series([
            None if t is None else _render(t, m)
            for m, t in zip(modes, texts)
        ])

    return _wiki_pd(mode_col, text_col)
