"""SimpleQueryParser — the never-throws end-user query syntax.

Reference: lucene/queryparser/.../simple/SimpleQueryParser.java —
operators ``+`` (AND), ``|`` (OR), ``-`` (NOT prefix), ``"..."``
phrase (``~N`` slop), trailing ``*`` prefix, ``~N`` term fuzziness,
``( )`` grouping, ``\\`` escaping; whitespace joins clauses with the
configured default operator; and, the parser's defining contract,
MALFORMED INPUT NEVER RAISES — anything that fails to parse as an
operator degrades to literal text (SimpleQueryParser.java class
javadoc: "will never throw an exception ... designed to be thrown at
users").

Pinned structural simplification (documented divergence): the parse
folds LEFT-ASSOCIATIVELY into the engine's flat ParsedQuery spec —
``a | b + c`` is (a OR b) AND c, an ``|``-chain becomes one required
disjunction group when conjoined, and parenthesized groups are pure
|-chains (nested boolean structure degrades each paren to text, the
parser's own response to constructs it cannot place).
"""

from __future__ import annotations

import re

from .queryparser import (
    ParsedQuery, _analyze, _encode_escapes, _unescape, _unescape_pattern,
)

__all__ = ["parse_simple_query", "execute_simple"]

_WORD = re.compile(r'"[^"]*"(?:~\d+)?|\(|\)|[+|]|[^\s+|()]+')
_PHRASE = re.compile(r'^"([^"]*)"(?:~(\d+))?$')
_FUZZY = re.compile(r"^(.+?)~(\d*)$")


def _classify(raw: str, analyzer):
    """One clause → ('term', tok, neg) | ('prefix', p, neg) |
    ('fuzzy', t, edits, neg) | ('phrase', words, slop, neg). Unparseable
    pieces come back as plain terms (never raises)."""
    neg = False
    while raw.startswith("-"):
        neg = not neg
        raw = raw[1:]
    if not raw:
        return None
    pm = _PHRASE.match(raw)
    if pm:
        words = []
        for w in pm.group(1).split():
            words.extend(_analyze(w, analyzer))
        if not words:
            return None
        if len(words) == 1:  # single-word "phrase" is a term
            return ("term", words[0], neg)
        return ("phrase", words, int(pm.group(2) or 0), neg)
    if raw.startswith('"'):  # unbalanced quote: literal text
        raw = raw.lstrip('"')
        if not raw:
            return None
    if raw.endswith("*") and len(raw) > 1 and "*" not in raw[:-1]:
        try:
            pat = _unescape_pattern(raw[:-1].lower(), "prefix")
        except ValueError:
            pat = _unescape(raw[:-1].lower())
        return ("prefix", pat, neg)
    fz = _FUZZY.match(raw)
    if fz and fz.group(2) != "":
        return ("fuzzy", _unescape(fz.group(1)).lower(),
                min(int(fz.group(2)), 2), neg)
    toks = _analyze(raw.replace("*", "").replace("~", ""), analyzer)
    return ("term", toks[0], neg) if toks else None


def parse_simple_query(
    q: str, analyzer=None, default_operator: str = "or"
) -> ParsedQuery:
    """Parse a simple-syntax query into a ParsedQuery. Never raises on
    user input (the SimpleQueryParser contract): a trailing backslash,
    dangling operator, unbalanced paren or quote all degrade to text
    or vanish."""
    if default_operator not in ("or", "and"):
        raise ValueError("default_operator must be 'or' or 'and'")
    try:
        enc = _encode_escapes(q or "")
    except ValueError:  # trailing backslash: drop it, keep the text
        enc = _encode_escapes((q or "").rstrip("\\"))

    toks = _WORD.findall(enc)
    # units: [(connector_before, [clauses...])] — '|' extends the
    # current unit's alternative list, '+'/'and'-whitespace closes it
    units: list = []
    cur: list = []
    pending_or = False

    def flush():
        nonlocal cur
        if cur:
            units.append(cur)
            cur = []

    i = 0
    while i < len(toks):
        t = toks[i]
        i += 1
        if t == "+":
            flush()
            continue
        if t == "|":
            pending_or = True
            continue
        if t == "(":
            # pure |-chain group; anything else inside degrades to text
            depth, body = 1, []
            while i < len(toks) and depth:
                if toks[i] == "(":
                    depth += 1
                elif toks[i] == ")":
                    depth -= 1
                    if not depth:
                        break
                body.append(toks[i])
                i += 1
            if i < len(toks):
                i += 1  # consume ')'
            inner = [b for b in body if b not in ("(", ")")]
            chain = [b for b in inner if b != "|"]
            if not pending_or and not (default_operator == "or" and cur):
                flush()
            pending_or = False
            for b in chain:
                c = _classify(b, analyzer)
                if c is not None:
                    cur.append(c)
            flush()
            continue
        if t == ")":
            continue  # unbalanced: ignore
        c = _classify(t, analyzer)
        if c is None:
            continue
        if pending_or or (default_operator == "or" and cur):
            cur.append(c)
            pending_or = False
        else:
            flush()
            cur.append(c)
    flush()

    out = ParsedQuery()
    for unit in units:
        pos = [c for c in unit if not c[-1]]
        negs = [c for c in unit if c[-1]]
        for c in negs:  # NOT applies clause-wise
            if c[0] == "term" and c[1] not in out.must_not:
                out.must_not.append(c[1])
            elif c[0] == "prefix":
                out.expansions.append(("must_not", "prefix", c[1], None, 1.0))
            elif c[0] == "fuzzy":
                out.expansions.append(("must_not", "fuzzy", c[1], c[2], 1.0))
            # prohibited phrases: unsupported downstream — degrade to
            # prohibited terms (each word), the parser's text fallback
            elif c[0] == "phrase":
                for w in c[1]:
                    if w not in out.must_not:
                        out.must_not.append(w)
        if not pos:
            continue
        single = len(pos) == 1
        multi_terms = [c[1] for c in pos if c[0] == "term"]
        occur = "must" if len(units) > 1 or default_operator == "and" else "should"
        if single:
            c = pos[0]
            if c[0] == "term":
                tgt = out.must if occur == "must" else out.should
                if c[1] not in [t for t, _ in tgt]:
                    tgt.append((c[1], 1.0))
            elif c[0] == "prefix":
                out.expansions.append((occur, "prefix", c[1], None, 1.0))
            elif c[0] == "fuzzy":
                out.expansions.append((occur, "fuzzy", c[1], c[2], 1.0))
            else:
                out.phrases.append((c[1], c[2]))  # phrases always required
        else:
            # an |-chain: terms form one disjunction; non-term members
            # ride along as SHOULD expansions/phrases (flat-spec limit)
            if multi_terms:
                if occur == "must":
                    out.groups.append([(t, 1.0) for t in multi_terms])
                else:
                    for t in multi_terms:
                        if t not in [x for x, _ in out.should]:
                            out.should.append((t, 1.0))
            for c in pos:
                if c[0] == "prefix":
                    out.expansions.append(
                        ("should", "prefix", c[1], None, 1.0)
                    )
                elif c[0] == "fuzzy":
                    out.expansions.append(
                        ("should", "fuzzy", c[1], c[2], 1.0)
                    )
                elif c[0] == "phrase":
                    out.phrases.append((c[1], c[2]))
    return out


def execute_simple(
    q: str,
    tables,
    pos_index=None,
    k: int | None = 10,
    precision: str = "float32",
    analyzer=None,
    default_operator: str = "or",
):
    """Parse with the simple syntax and run through the shared
    executor."""
    from .executor import execute_parsed

    return execute_parsed(
        parse_simple_query(q, analyzer, default_operator),
        tables, pos_index=pos_index, k=k, precision=precision,
    )
