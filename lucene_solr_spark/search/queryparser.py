"""Classic query-string parser (sugar over the structured query spec).

Covers the productive core of Lucene's classic QueryParser grammar
(reference: queryparser/.../classic/QueryParser.jj:66-67,195-226 —
Query ::= (Clause)*; Clause ::= ["+","-"] (TERM | "(" Query ")" ...)):

- bare terms              → SHOULD
- ``+term``               → MUST
- ``-term`` / ``NOT t``   → MUST_NOT
- ``a AND b``             → both become MUST
- ``OR``                  → connector noise (SHOULD is the default)
- ``"a b"`` / ``"a b"~2`` → (sloppy) phrase, REQUIRED
- ``term^2.5``            → boost
- ``(a b)`` as MUST       → a REQUIRED DISJUNCTION group (>=1 must match,
                            matching members all contribute score — the
                            BooleanQuery-inside-MUST shape,
                            Boolean2ScorerSupplier.java:106-174)
- ``field:term``          → term clause when field is the default text
                            field; otherwise a CONSTANT-SCORE metadata
                            filter on the stored field (the Solr fq /
                            IndexOrDocValuesQuery analog)
- ``field:[a TO b]``      → range filter, inclusive ([..]) or exclusive
                            ({..}) per end; ``*`` = unbounded
                            (PointRangeQuery / TermRangeQuery analog)
- mixed ``+a b``          → MUST a, b an optional score contribution
                            (ReqOptSumScorer, Boolean2ScorerSupplier
                            .java:168-174)
- ``spa*`` / ``s?a*k``    → prefix / wildcard term (QueryParser.jj
                            <PREFIXTERM>/<WILDTERM>, :195-226), executed
                            as a CONSTANT-SCORE dictionary expansion
                            (MultiTermQueryConstantScoreWrapper.java —
                            the CONSTANT_SCORE_BLENDED default rewrite's
                            bitset arm; score = boost per matching doc)
- ``roam~`` / ``roam~1``  → fuzzy term, Damerau-Levenshtein edits ≤ n
                            (default 2, capped 2 —
                            FuzzyQuery.java:68-88 transpositions=true),
                            same constant-score expansion. NOTE: the
                            reference's default fuzzy rewrite blends
                            per-term idf (TopTermsBlendedFreqScoring-
                            Rewrite); this engine pins the documented
                            constant-score alternative so the score is
                            ANSI-SQL-reproducible.
- ``/rege?x/``            → regexp term (RegExp full-match anchoring,
                            RegexpQuery.java), constant-score expansion
- ``lang:(en fr)``        → fielded group: constant-score IN filter on
                            the stored field (Solr fq {!terms} analog);
                            on the default text field it is a plain
                            disjunction group
- ``(a b)^2``             → trailing group boost: multiplies every
                            member boost (BoostQuery over BooleanQuery
                            distributes over the sum — reference
                            search/BoostQuery.java)

The output is the engine's structured spec; BooleanQuery-style
normalization (empty → match-none, duplicate dedup — reference
search/BooleanQuery.java:220-298) happens here in plain Python since
query specs are tiny.

Deliberately out of scope (raise ValueError, documented): groups in
SHOULD/MUST_NOT position that are not pure disjunctions, and nested
parentheses beyond one level of boolean structure per group — the
engine's executor flattens to (must, groups, should, must_not, phrases,
filters), which covers every reference test query this repo mirrors.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

__all__ = [
    "ParsedQuery", "parse_query", "parse_complex_phrase", "DEFAULT_FIELD",
]

DEFAULT_FIELD = "text"

# ``\X`` escaping (classic QueryParser.jj <_ESCAPED_CHAR>; inverse of
# QueryParserBase.escape): any backslash-escaped character is literal
# text, never syntax. Implemented by rewriting ``\X`` to a private-use
# sentinel codepoint BEFORE tokenization — the tokenizer and every
# syntax regex then see an ordinary non-special character (an escaped
# space stays inside its term, an escaped '*' never becomes a wildcard)
# — and decoding sentinels back at each leaf-value site.
_ESCAPE_RE = re.compile(r"\\(.)", re.DOTALL)
_SENT_BASE = 0xE000  # U+E000..U+E0FF shadow Latin-1
_SENT_RANGE = re.compile("[\ue000-\ue0ff]")
_SENT_WILD = {chr(_SENT_BASE + ord("*")), chr(_SENT_BASE + ord("?"))}


def _encode_escapes(q: str) -> str:
    def repl(m):
        c = m.group(1)
        return chr(_SENT_BASE + ord(c)) if ord(c) < 0x100 else c

    enc = _ESCAPE_RE.sub(repl, q)
    if "\\" in enc:
        raise ValueError(
            "trailing escape character '\\' in query string "
            "(QueryParser.jj: a '\\' must be followed by the escaped char)"
        )
    return enc


def _unescape(s: str) -> str:
    return _SENT_RANGE.sub(lambda m: chr(ord(m.group(0)) - _SENT_BASE), s)


def _unescape_pattern(s: str, what: str) -> str:
    """Decode escapes inside a multi-term pattern that still carries
    live wildcard metacharacters — a decoded literal '*'/'?' would be
    indistinguishable from syntax, so that one mix is rejected."""
    if any(c in _SENT_WILD for c in s):
        raise ValueError(
            f"unsupported query: escaped wildcard inside a live {what} "
            "pattern — escape every wildcard or none"
        )
    return _unescape(s)

_TOKEN = re.compile(
    r"""[+-]?/[^/]*/(?:\^\d+(?:\.\d+)?)?       # /regexp/ (may contain parens)
      | \(|\)                                  # parens
      | [+-]?[A-Za-z_][\w.]*:\[[^\]]*\]        # field:[a TO b]
      | [+-]?[A-Za-z_][\w.]*:\{[^}]*\}         # field:{a TO b}
      | [+-]?"[^"]*"(?:~\d+)?                  # phrase (opt. +/- prefix)
      | [^\s()]+                               # term / field:term / ops
    """,
    re.VERBOSE,
)

_RANGE = re.compile(
    r"^([A-Za-z_][\w.]*):([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$", re.IGNORECASE
)
_FIELD_TERM = re.compile(r"^([A-Za-z_][\w.]*):(.+)$", re.DOTALL)


@dataclass
class ParsedQuery:
    must: list = field(default_factory=list)       # [(term, boost)]
    should: list = field(default_factory=list)     # [(term, boost)]
    must_not: list = field(default_factory=list)   # [term]
    phrases: list = field(default_factory=list)    # [([term, ...], slop)]
    groups: list = field(default_factory=list)     # [[(term, boost)], ...] MUST-disjunctions
    filters: list = field(default_factory=list)    # [spec, ...] required
    neg_filters: list = field(default_factory=list)  # [spec, ...] prohibited
    # filter spec: ("eq", field, value) |
    #              ("in", field, [values...]) |
    #              ("like", field, pattern)  (* and ? wildcards) |
    #              ("range", field, lo, hi, lo_incl, hi_incl)  (None = open)
    expansions: list = field(default_factory=list)
    # multi-term expansion clauses on the DEFAULT text field:
    #   (occur, kind, pattern, param, boost)
    # occur ∈ must|should|must_not; kind ∈ prefix|wildcard|fuzzy|regexp;
    # param = max_edits for fuzzy else None. Executed constant-score
    # (MultiTermQueryConstantScoreWrapper analog).

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

    def is_simple(self) -> bool:
        """True when the legacy conj/disj executor path suffices."""
        return not (
            self.groups
            or self.filters
            or self.neg_filters
            or self.expansions
            or (self.must and self.should)
        )


def _analyze(term: str, analyzer) -> list:
    term = _unescape(term)
    return analyzer(term) if analyzer else [term.lower()]


def _range_bound(raw: str):
    if raw == "*":
        return None
    raw = _unescape(raw)
    try:
        return float(raw)
    except ValueError:
        return raw


def _add_term(out: ParsedQuery, occur: str, tok: str, boost: float) -> None:
    if occur == "must":
        if tok not in [t for t, _ in out.must]:
            out.must.append((tok, boost))
    elif occur == "must_not":
        if tok not in out.must_not:  # dedup (clauseSets analog)
            out.must_not.append(tok)
    else:
        if tok not in [t for t, _ in out.should]:
            out.should.append((tok, boost))


def _merge_group(out: ParsedQuery, sub: ParsedQuery, occur: str) -> None:
    """Flatten a parenthesized sub-query into the parent under its
    occur. MUST groups keep full structure (a pure-SHOULD group becomes
    a required disjunction; inner MUST terms become top-level MUST —
    conjunction distributes); SHOULD / MUST_NOT groups must be pure
    disjunctions."""
    pure_disj = not (
        sub.must or sub.groups or sub.must_not or sub.phrases
        or sub.filters or sub.neg_filters
        or any(e[0] != "should" for e in sub.expansions)
    )
    if occur == "must":
        out.must.extend(x for x in sub.must if x not in out.must)
        out.groups.extend(sub.groups)
        out.expansions.extend(sub.expansions)
        if sub.should:
            if sub.must or sub.groups:
                # mixed inside a required group: inner optionals stay
                # optional (ReqOptSum distributes over the conjunction)
                for t, b in sub.should:
                    _add_term(out, "should", t, b)
            else:
                out.groups.append(list(sub.should))
        out.must_not.extend(t for t in sub.must_not if t not in out.must_not)
        out.phrases.extend(sub.phrases)
        out.filters.extend(sub.filters)
        out.neg_filters.extend(sub.neg_filters)
    elif occur == "must_not":
        if not pure_disj:
            raise ValueError(
                "unsupported query: a prohibited group must be a pure "
                "disjunction of terms, e.g. -(a b)"
            )
        out.must_not.extend(
            t for t, _ in sub.should if t not in out.must_not
        )
        out.expansions.extend(
            ("must_not",) + e[1:] for e in sub.expansions
        )
    else:  # should
        if not pure_disj:
            raise ValueError(
                "unsupported query: an optional group must be a pure "
                "disjunction of terms, e.g. (a b c)"
            )
        for t, b in sub.should:
            _add_term(out, "should", t, b)
        out.expansions.extend(sub.expansions)


def _scale_boosts(p: ParsedQuery, factor: float) -> None:
    """Trailing group boost ``(a b)^2``: BoostQuery over a BooleanQuery
    multiplies the summed score, which distributes onto every member's
    boost (reference search/BoostQuery.java)."""
    p.must = [(t, b * factor) for t, b in p.must]
    p.should = [(t, b * factor) for t, b in p.should]
    p.groups = [[(t, b * factor) for t, b in g] for g in p.groups]
    p.expansions = [e[:4] + (e[4] * factor,) for e in p.expansions]


def _collect_group_values(tokens: list, i: int) -> tuple:
    """Members of a fielded group ``field:(a b ...)`` — raw values, OR
    connectors skipped; any boolean structure is rejected loudly (a
    fielded group is a plain disjunction). → (values, next_i)."""
    vals = []
    while i < len(tokens) and tokens[i] != ")":
        v = tokens[i]
        i += 1
        if v.upper() in ("OR", "||"):
            continue
        if (
            v == "("
            or v.upper() in ("AND", "&&", "NOT", "!")
            or v.startswith(("+", "-"))
        ):
            raise ValueError(
                "unsupported query: a fielded group field:(...) must be a "
                "plain disjunction of values, e.g. lang:(en fr)"
            )
        vals.append(v)
    if i >= len(tokens):
        raise ValueError("unbalanced '(' in query string")
    return vals, i + 1  # consume ')'


_FIELD_GROUP = re.compile(r"^([A-Za-z_][\w.]*):$")
_BOOST_TOKEN = re.compile(r"^\^(\d+(?:\.\d+)?)$")
_REGEXP_TERM = re.compile(r"^/(.*)/$", re.DOTALL)
_FUZZY_TERM = re.compile(r"^(.+?)~(\d*)$")


def _parse(tokens: list, i: int, analyzer, depth: int) -> tuple:
    """Parse tokens[i:] until ')' (depth>0) or end. → (ParsedQuery, next_i)."""
    out = ParsedQuery()
    pending_must = False  # set by a preceding AND
    pending_not = False   # set by a preceding NOT
    pending_occur = None  # set by a detached +/- (e.g. "+ (a b)")
    # what the PREVIOUS clause was, for AND promotion:
    #   ("opt_term", tok)            — a SHOULD term (promotable)
    #   ("group", full, added)       — a SHOULD-position group: its full
    #                                  member list + the terms it newly
    #                                  added to out.should (dedup-aware)
    #   "required"                   — already MUST/MUST_NOT/phrase/filter
    #                                  (AND promotion is a no-op)
    last_unit = None

    def _remove_should(term):
        for idx in range(len(out.should) - 1, -1, -1):
            if out.should[idx][0] == term:
                return out.should.pop(idx)
        return None

    def promote_last():
        # a AND b: 'a' was a SHOULD term — promote it to MUST.
        # (a b) AND c: the group becomes a REQUIRED disjunction (its
        # FULL member list, even members deduped against earlier SHOULD
        # terms, which themselves stay optional).
        if isinstance(last_unit, tuple) and last_unit[0] == "opt_term":
            ent = _remove_should(last_unit[1])
            if ent and ent[0] not in [t for t, _ in out.must]:
                out.must.append(ent)
        elif isinstance(last_unit, tuple) and last_unit[0] == "group":
            _, full, added = last_unit
            for t in added:
                _remove_should(t)
            if full:
                out.groups.append(list(full))
        elif isinstance(last_unit, tuple) and last_unit[0] == "expansion":
            # "a* AND b": promote the SHOULD expansion clause to MUST
            idx = last_unit[1]
            e = out.expansions[idx]
            if e[0] == "should":
                out.expansions[idx] = ("must",) + e[1:]

    while i < len(tokens):
        raw = tokens[i]
        i += 1
        up = raw.upper()
        if raw == ")":
            if depth == 0:
                raise ValueError("unbalanced ')' in query string")
            return out, i
        if up in ("AND", "&&"):
            promote_last()
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
        if not raw and occur != "should":
            # detached prefix ("+ (a b)" or the tokenizer splitting
            # "+(" into "+" "(") — applies to the NEXT clause
            pending_occur = occur
            continue
        if pending_occur is not None:
            occur, pending_occur = pending_occur, None
        if pending_not:
            occur = "must_not"
            pending_not = False
        elif pending_must:
            occur = "must"
            pending_must = False

        gm = _FIELD_GROUP.match(raw)
        if gm and i < len(tokens) and tokens[i] == "(":
            # fielded group  field:(a b ...) — a plain disjunction over
            # one field (QueryParser field-scoped group; Solr {!terms}).
            fieldname = gm.group(1)
            vals, i = _collect_group_values(tokens, i + 1)
            if fieldname == DEFAULT_FIELD:
                sub = ParsedQuery()
                for v in vals:
                    for tok in _analyze(v, analyzer):
                        _add_term(sub, "should", tok, 1.0)
            else:
                sub = None
            if i < len(tokens):  # trailing boost "lang:(en fr)^2"
                bm = _BOOST_TOKEN.match(tokens[i])
                if bm:
                    i += 1
                    if sub is None:
                        raise ValueError(
                            "unsupported query: boost on a constant-score "
                            f"field group {fieldname}:(...) has no effect"
                        )
                    _scale_boosts(sub, float(bm.group(1)))
            if sub is not None:
                _merge_group(out, sub, occur)
            elif vals:
                spec = ("in", fieldname, [_unescape(v) for v in vals])
                (out.neg_filters if occur == "must_not" else out.filters
                 ).append(spec)
            last_unit = "required"
            continue
        if gm:
            raise ValueError(
                f"dangling field prefix {raw!r} — expected a value or a "
                "parenthesized group after the ':'"
            )

        if raw == "(":
            sub, i = _parse(tokens, i, analyzer, depth + 1)
            if i < len(tokens):
                # trailing group boost "(a b)^2": the tokenizer emits the
                # detached "^N" after ')' — distribute onto every member
                bm = _BOOST_TOKEN.match(tokens[i])
                if bm:
                    i += 1
                    _scale_boosts(sub, float(bm.group(1)))
            before = {t for t, _ in out.should}
            _merge_group(out, sub, occur)
            if occur == "should":
                added = [t for t, _ in out.should if t not in before]
                last_unit = ("group", list(sub.should), added)
            else:
                last_unit = "required"
            continue

        boost = 1.0
        rm = _RANGE.match(raw)
        if rm:
            fieldname, lob, lo, hi, hib = rm.groups()
            spec = (
                "range",
                fieldname,
                _range_bound(lo),
                _range_bound(hi),
                lob == "[",
                hib == "]",
            )
            (out.neg_filters if occur == "must_not" else out.filters).append(spec)
            last_unit = "required"
            continue

        m = re.match(r"^(.*)\^(\d+(?:\.\d+)?)$", raw)
        if m:
            raw, boost = m.group(1), float(m.group(2))
            if not raw:
                raise ValueError(
                    f"detached boost token '^{m.group(2)}' — a boost "
                    "attaches to a term, phrase, or group: term^2, (a b)^2"
                )

        rx = _REGEXP_TERM.match(raw)
        if rx:
            out.expansions.append(
                (occur, "regexp", _unescape(rx.group(1)), None, boost)
            )
            last_unit = (
                ("expansion", len(out.expansions) - 1)
                if occur == "should" else "required"
            )
            continue

        pm = re.match(r'^"([^"]*)"(?:~(\d+))?$', raw)
        if pm:
            if occur == "must_not":
                # a silently-required prohibited phrase would invert the
                # caller's intent — reject until ReqExcl-phrase lands
                raise ValueError(
                    "unsupported query: prohibited phrases (-\"...\") are "
                    "not implemented; phrases are always REQUIRED"
                )
            words = []
            for w in pm.group(1).split():
                words.extend(_analyze(w, analyzer))
            if words:
                out.phrases.append((words, int(pm.group(2) or 0)))
            last_unit = "required"
            continue

        fm = _FIELD_TERM.match(raw)
        if fm and fm.group(1) != DEFAULT_FIELD:
            val = fm.group(2)
            if _FUZZY_TERM.match(val) and "*" not in val and "?" not in val:
                raise ValueError(
                    f"unsupported query: fuzzy on stored field "
                    f"{fm.group(1)!r} — only the default text field "
                    "supports fuzzy expansion"
                )
            if "*" in val or "?" in val:
                spec = ("like", fm.group(1), _unescape_pattern(val, "LIKE"))
            else:
                spec = ("eq", fm.group(1), _unescape(val))
            (out.neg_filters if occur == "must_not" else out.filters).append(spec)
            last_unit = "required"
            continue
        if fm:  # text:term — the default field, a normal term clause
            raw = fm.group(2)

        if not raw:
            continue
        if "*" in raw or "?" in raw:
            pat = raw.lower()
            if set(pat) <= {"*", "?"}:
                raise ValueError(
                    "unsupported query: bare wildcard matches every "
                    "document — add at least one literal character"
                )
            # pure trailing star → PrefixQuery fast path (startswith);
            # anything else → WildcardQuery LIKE-pattern expansion
            if pat.endswith("*") and not any(c in "*?" for c in pat[:-1]):
                out.expansions.append(
                    (occur, "prefix", _unescape(pat[:-1]), None, boost)
                )
            else:
                out.expansions.append(
                    (occur, "wildcard", _unescape_pattern(pat, "wildcard"),
                     None, boost)
                )
            last_unit = (
                ("expansion", len(out.expansions) - 1)
                if occur == "should" else "required"
            )
            continue
        fz = _FUZZY_TERM.match(raw)
        if fz:
            # max edits default 2, capped 2 (LevenshteinAutomata
            # .MAXIMUM_SUPPORTED_DISTANCE; FuzzyQuery.java:68-88)
            edits = min(int(fz.group(2) or 2), 2)
            out.expansions.append(
                (occur, "fuzzy", _unescape(fz.group(1)).lower(), edits, boost)
            )
            last_unit = (
                ("expansion", len(out.expansions) - 1)
                if occur == "should" else "required"
            )
            continue
        toks = _analyze(raw, analyzer)
        for tok in toks:
            _add_term(out, occur, tok, boost)
        last_unit = (
            ("opt_term", toks[-1]) if occur == "should" and toks
            else "required"
        )
    if depth > 0:
        raise ValueError("unbalanced '(' in query string")
    return out, i


def parse_query(q: str, analyzer=None) -> ParsedQuery:
    """Parse a classic query string into a ParsedQuery spec.

    ``analyzer``: optional callable(str) -> [token]; defaults to
    lowercasing (terms are assumed pre-tokenized words). ``\\X``
    escapes any character into literal text (``liter\\*al`` is the
    term 'liter*al', never a wildcard — QueryParser.jj
    <_ESCAPED_CHAR>)."""
    tokens = _TOKEN.findall(_encode_escapes(q or ""))
    out, _ = _parse(tokens, 0, analyzer, 0)
    return out


_COMPLEX_UNIT = re.compile(r"\(|\)|[^\s()]+")
_COMPLEX_PHRASE = re.compile(r'^\s*"(.*)"\s*(?:~(\d+))?\s*$', re.DOTALL)


def parse_complex_phrase(q: str, analyzer=None) -> tuple:
    """ComplexPhraseQueryParser: a quoted phrase whose WORDS may be
    multi-term subqueries — ``"(john jon jonath*) peters*"~2`` matches
    docs where any expansion of slot 1 is followed (within slop) by any
    expansion of slot 2 (reference queryparser/.../complexPhrase/
    ComplexPhraseQueryParser.java — phrase-embedded wildcard/fuzzy/
    group clauses rewritten into a SpanNear over per-slot unions; this
    engine executes the expansion as MultiPhraseQuery slot alternatives,
    search/phrase.py search_phrase).

    → (slots, slop): slots is one list per phrase position of
    ('term', t) | ('prefix', p) | ('wildcard', pat) |
    ('fuzzy', t, max_edits) units; slop is the trailing ``~N`` (0
    default). ``\\X`` escaping applies as in parse_query."""
    m = _COMPLEX_PHRASE.match(_encode_escapes(q or ""))
    if not m:
        raise ValueError(
            'a complex phrase is a quoted string with optional slop: '
            '"(a b) c*"~2'
        )
    body, slop = m.group(1), int(m.group(2) or 0)

    def classify(u: str):
        if "*" in u or "?" in u:
            p = u.lower()
            if set(p) <= {"*", "?"}:
                raise ValueError(
                    "unsupported complex phrase: bare wildcard slot"
                )
            if p.endswith("*") and not any(c in "*?" for c in p[:-1]):
                return ("prefix", _unescape(p[:-1]))
            return ("wildcard", _unescape_pattern(p, "wildcard"))
        fz = _FUZZY_TERM.match(u)
        if fz:
            return ("fuzzy", _unescape(fz.group(1)).lower(),
                    min(int(fz.group(2) or 2), 2))
        toks = _analyze(u, analyzer)
        if len(toks) != 1:
            raise ValueError(
                f"complex-phrase word {u!r} analyzed to {len(toks)} tokens; "
                "each slot unit must stay a single token"
            )
        return ("term", toks[0])

    slots, i = [], 0
    units = _COMPLEX_UNIT.findall(body)
    while i < len(units):
        u = units[i]
        i += 1
        if u == ")":
            raise ValueError("unbalanced ')' in complex phrase")
        if u == "(":
            group = []
            while i < len(units) and units[i] != ")":
                if units[i] == "(":
                    raise ValueError(
                        "nested groups are not part of the complex-phrase "
                        "grammar (one group = one phrase slot)"
                    )
                group.append(classify(units[i]))
                i += 1
            if i >= len(units):
                raise ValueError("unbalanced '(' in complex phrase")
            i += 1  # consume ')'
            if not group:
                raise ValueError("empty () slot in complex phrase")
            slots.append(group)
        else:
            slots.append([classify(u)])
    if len(slots) < 2:
        raise ValueError("a complex phrase needs >= 2 slots")
    return slots, slop
