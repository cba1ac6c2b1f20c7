"""SimplePatternTokenizer + SimplePatternSplitTokenizer.

Re-implements the reference's DFA scanners over the Lucene RegExp
engine (analysis/luceneregex.py):

- ``SimplePatternTokenizer`` (pattern/SimplePatternTokenizer.java:
  104-151) — the regexp matches TOKEN text; greedy longest accept
  from each start; on a false alarm all but the FIRST CODE UNIT are
  pushed back (restart can split a surrogate pair — replicated); if
  the scan runs into EOF with no accept recorded, tokenization ENDS
  (the reference returns false, dropping any shorter viable retry).
- ``SimplePatternSplitTokenizer`` (pattern/
  SimplePatternSplitTokenizer.java:96-164) — the regexp matches the
  SEPARATOR; emitted tokens are the text between matches, same
  greedy/pushback discipline, adjacent separators collapse.

The DFA steps code POINTS composed from UTF-16 units exactly like the
reference's nextCodePoint (a high surrogate blindly pairs with the
next unit — Character.toCodePoint without validation; EOF pairs as
0xFFFF), and offsets count UTF-16 units.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

from .luceneregex import DFA, compile_regexp


class SPToken(NamedTuple):
    term: str
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


def _next_cp(units: List[int], i: int) -> Tuple[int, int]:
    """(code point, units consumed) — reference nextCodePoint: a high
    surrogate pairs with whatever unit follows (0xFFFF at EOF)."""
    u = units[i]
    if 0xD800 <= u <= 0xDBFF:
        if i + 1 < len(units):
            return ((u - 0xD800) << 10) + (units[i + 1] - 0xDC00) \
                + 0x10000, 2
        # EOF: nextCodeUnit returns -1, cast to (char) 0xFFFF and
        # composed, but nothing was consumed or appended
        return ((u - 0xD800) << 10) + (0xFFFF - 0xDC00) + 0x10000, 1
    return u, 1


def _to_text(units: List[int]) -> str:
    # recombine surrogate pairs; lone surrogates pass through as-is
    b = b"".join(u.to_bytes(2, "little") for u in units)
    return b.decode("utf-16-le", errors="surrogatepass")


def simplepattern_tokenize(text: str, dfa: DFA) -> List[SPToken]:
    units = _units(text)
    n = len(units)
    out: List[SPToken] = []
    i = 0
    while i < n:
        start = i
        cp, w = _next_cp(units, i)
        j = i + w
        state = dfa.step(0, cp)
        if state == -1:
            i = j                     # skip one code point, retry
            continue
        last_accept = -1              # units from start
        hit_eof = False
        while True:
            if dfa.is_accept(state):
                last_accept = j - start
            if j >= n:
                hit_eof = True
                break
            cp, w = _next_cp(units, j)
            j += w
            state = dfa.step(state, cp)
            if state == -1:
                break
        if last_accept != -1:
            out.append(SPToken(_to_text(units[start:start + last_accept]),
                               start, start + last_accept))
            i = start + last_accept
        elif hit_eof:
            # reference returns false here: tokenization ends
            break
        else:
            i = start + 1             # push back all but one UNIT
    return out


def simplepattern_split_tokenize(text: str, dfa: DFA) -> List[SPToken]:
    units = _units(text)
    n = len(units)
    out: List[SPToken] = []
    tok_start = 0
    tok: List[int] = []
    i = 0
    while True:
        if i >= n:
            if tok:
                out.append(SPToken(_to_text(tok), tok_start,
                                   tok_start + len(tok)))
            return out
        sep_start = i
        cp, w = _next_cp(units, i)
        j = i + w
        state = dfa.step(0, cp)
        if state == -1:
            tok.extend(units[i:j])    # not a separator start: the
            i = j                     # code point joins the token
            continue
        last_accept = -1
        hit_eof = False
        while True:
            if dfa.is_accept(state):
                last_accept = j - sep_start
            if j >= n:
                hit_eof = True
                break
            cp, w = _next_cp(units, j)
            j += w
            state = dfa.step(state, cp)
            if state == -1:
                break
        if last_accept != -1:
            # separator confirmed: emit the pending token, restart
            # right after the separator (adjacent separators collapse)
            i = sep_start + last_accept
            if tok:
                out.append(SPToken(_to_text(tok), tok_start,
                                   tok_start + len(tok)))
                tok = []
            tok_start = i
        elif hit_eof:
            # EOF with no accept: every scanned unit stays in the token
            tok.extend(units[sep_start:j])
            if tok:
                out.append(SPToken(_to_text(tok), tok_start,
                                   tok_start + len(tok)))
            return out
        else:
            # false alarm: only the first scanned UNIT joins the token
            tok.append(units[sep_start])
            i = sep_start + 1
    return out


_SEP = "\x1f"
_FS = "\x1e"

# (name, pattern, split?) — the gate's pinned parameterizations.
# Lucene syntax notes pinned by the oracle: a bare `"` STARTS a quoted
# string (escape literal quotes), and a bare variable-width interval
# `<1-255>` is rejected by the reference tokenizer ctor (the only
# RegExp.toAutomaton leaf that skips minimization is nondeterministic)
# — composite forms are minimized and accepted.
CASES = {
    "tok:alnum": ("[a-zA-Z0-9]+", False),
    "tok:quoted": ("\\\"[^\\\"]*\\\"|[a-z]+", False),
    "tok:interval": ("<100-255>|<00-99>", False),
    "tok:complex": ("([a-z]+&~(xx.*))|[0-9]{2,4}", False),
    "split:ws": ("[ \t\r\n]+", True),
    "split:punct": ("[,;.]( )*", True),
    "split:str": ('"--"|"-"', True),
}

_DFAS = {}


def _dfa_for(name: str) -> Tuple[DFA, bool]:
    if name not in _DFAS:
        pattern, split = CASES[name]
        _DFAS[name] = (compile_regexp(pattern), split)
    return _DFAS[name]


def simplepattern_serialize(text: str, case: str) -> str:
    dfa, split = _dfa_for(case)
    toks = (simplepattern_split_tokenize(text, dfa) if split
            else simplepattern_tokenize(text, dfa))
    return _SEP.join(
        _FS.join((t.term, str(t.start), str(t.end))) for t in toks)


def simplepattern_udf(case_col, text_col):
    """Arrow-batched (case, text) -> serialized token stream column."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _run(cases, texts):
        return pd.Series([
            simplepattern_serialize(t if t is not None else "", c)
            for c, t in zip(cases, texts)])

    return pandas_udf(_run, "string")(case_col, text_col)
