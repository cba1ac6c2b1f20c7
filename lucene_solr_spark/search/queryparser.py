"""Classic query-string parser (sugar over the structured query spec).

A deliberately small subset of Lucene's classic QueryParser grammar
(reference: queryparser/.../classic/QueryParser.jj:66-67,195-226 —
Query ::= (Clause)*; Clause ::= ["+","-"] (TERM | ...)):

- bare terms            → SHOULD
- ``+term``             → MUST
- ``-term`` / ``NOT t`` → MUST_NOT
- ``a AND b``           → both become MUST
- ``OR``                → connector noise (SHOULD is the default)
- ``"a b"``             → phrase (returned as a phrase spec)
- ``"a b"~2``           → sloppy phrase (slop=2)
- ``term^2.5``          → boost (applied to that term)

The output is the engine's structured spec; BooleanQuery-style
normalization (empty → match-none, duplicate dedup — reference
search/BooleanQuery.java:220-298) happens here in plain Python since
query specs are tiny.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = ["ParsedQuery", "parse_query"]

_TOKEN = re.compile(r'"[^"]*"(?:~\d+)?|\S+')


@dataclass
class ParsedQuery:
    must: list = field(default_factory=list)       # [(term, boost)]
    should: list = field(default_factory=list)     # [(term, boost)]
    must_not: list = field(default_factory=list)   # [term]
    phrases: list = field(default_factory=list)    # [([term, ...], slop)]

    @property
    def mode(self) -> str:
        return "conjunctive" if self.must and not self.should else "disjunctive"

    @property
    def terms(self) -> list:
        return [t for t, _ in (self.must if self.must else self.should)]

    @property
    def exclude(self) -> list:
        return list(self.must_not)

    def is_match_none(self) -> bool:
        """MUST ∧ MUST_NOT of the same term can never match
        (BooleanQuery.java:296 normalization)."""
        return bool(set(t for t, _ in self.must) & set(self.must_not))


def _analyze(term: str, analyzer) -> list:
    return analyzer(term) if analyzer else [term.lower()]


def parse_query(q: str, analyzer=None) -> ParsedQuery:
    """Parse a classic query string into a ParsedQuery spec.

    ``analyzer``: optional callable(str) -> [token]; defaults to
    lowercasing (terms are assumed pre-tokenized words).
    """
    out = ParsedQuery()
    pending_must = False  # set by a preceding AND
    pending_not = False   # set by a preceding NOT
    tokens = _TOKEN.findall(q or "")
    for i, raw in enumerate(tokens):
        up = raw.upper()
        if up in ("AND", "&&"):
            # promote previous should-clause to MUST
            if out.should:
                out.must.append(out.should.pop())
            pending_must = True
            continue
        if up in ("OR", "||"):
            pending_must = False
            continue
        if up in ("NOT", "!"):
            pending_not = True
            continue

        occur = "should"
        if raw.startswith("+"):
            occur, raw = "must", raw[1:]
        elif raw.startswith("-"):
            occur, raw = "must_not", raw[1:]
        if pending_not:
            occur = "must_not"
            pending_not = False
        elif pending_must:
            occur = "must"
            pending_must = False

        boost = 1.0
        m = re.match(r"^(.*)\^(\d+(?:\.\d+)?)$", raw)
        if m:
            raw, boost = m.group(1), float(m.group(2))

        pm = re.match(r'^"([^"]*)"(?:~(\d+))?$', raw)
        if pm:
            words = []
            for w in pm.group(1).split():
                words.extend(_analyze(w, analyzer))
            if words:
                out.phrases.append((words, int(pm.group(2) or 0)))
            continue
        if not raw:
            continue
        for tok in _analyze(raw, analyzer):
            if occur == "must":
                if tok not in [t for t, _ in out.must]:
                    out.must.append((tok, boost))
            elif occur == "must_not":
                if tok not in out.must_not:  # dedup (clauseSets analog)
                    out.must_not.append(tok)
            else:
                if tok not in [t for t, _ in out.should]:
                    out.should.append((tok, boost))
    return out
