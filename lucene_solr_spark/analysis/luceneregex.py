"""Lucene RegExp -> DFA engine (code-point interval automata).

Re-expresses the reference's regular-expression compiler as a small
interval-automaton library:

- the RegExp grammar (util/automaton/RegExp.java:1030-1167 —
  union `|`, intersection `&`, concatenation, repeats `? * + {n,m}`,
  complement `~`, char classes `[...]` with `^` negation and ranges,
  any-char `.`, empty-language `#`, any-string `@`, quoted strings
  `"..."`, groups `(...)` with `()` = empty string, numeric intervals
  `<min-max>`, and `\\`-escape of any code point), parsed with the
  same recursive-descent precedence and the ALL flag set (the default
  both SimplePattern tokenizers use);
- the automaton constructions those nodes map to
  (RegExp.java:502-607 toAutomatonInternal ->
  util/automaton/{Automata,Operations}.java), including
  makeDecimalInterval's between/atLeast/atMost recursion
  (Automata.java:139-218,452-497) with its leading-zeros initial
  states for the variable-width form;
- subset-construction determinization over code-point intervals and
  language-level complement (determinize + totalize + flip), matching
  Operations.determinize / Operations.complement semantics.

Only the accepted LANGUAGE is contracted to match the reference (the
reference minimizes aggressively for index intersection; a scanner
only needs determinism), which the compiled-reference verification
sweep in scripts/make_simplepattern_fixture.py pins behaviorally.
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Dict, FrozenSet, List, Optional, Tuple

MAX_CP = 0x10FFFF


class NFA:
    """Interval-labeled NFA fragment with epsilon moves."""

    __slots__ = ("trans", "eps", "accept", "initial")

    def __init__(self):
        self.trans: List[List[Tuple[int, int, int]]] = []
        self.eps: List[List[int]] = []
        self.accept: set = set()
        self.initial = 0

    def new_state(self) -> int:
        self.trans.append([])
        self.eps.append([])
        return len(self.trans) - 1

    def add(self, src: int, lo: int, hi: int, dst: int) -> None:
        self.trans[src].append((lo, hi, dst))

    def copy_into(self, other: "NFA") -> int:
        """Append self's states into `other`; returns the offset."""
        off = len(other.trans)
        for row in self.trans:
            other.trans.append([(lo, hi, d + off) for lo, hi, d in row])
        for row in self.eps:
            other.eps.append([d + off for d in row])
        for s in self.accept:
            other.accept.add(s + off)
        return off


def _single() -> Tuple[NFA, int]:
    n = NFA()
    return n, n.new_state()


def make_char_range(lo: int, hi: int) -> NFA:
    n, s0 = _single()
    s1 = n.new_state()
    n.add(s0, lo, hi, s1)
    n.accept.add(s1)
    return n


def make_char(c: int) -> NFA:
    return make_char_range(c, c)


def make_any_char() -> NFA:
    return make_char_range(0, MAX_CP)


def make_empty() -> NFA:
    """The EMPTY LANGUAGE (RegExp '#': Automata.makeEmpty)."""
    n, _ = _single()
    return n


def make_empty_string() -> NFA:
    n, s0 = _single()
    n.accept.add(s0)
    return n


def make_string(s: str) -> NFA:
    n, cur = _single()
    for ch in s:
        nxt = n.new_state()
        n.add(cur, ord(ch), ord(ch), nxt)
        cur = nxt
    n.accept.add(cur)
    return n


def make_any_string() -> NFA:
    n, s0 = _single()
    n.add(s0, 0, MAX_CP, s0)
    n.accept.add(s0)
    return n


def union(parts: List[NFA]) -> NFA:
    n, s0 = _single()
    for p in parts:
        off = p.copy_into(n)
        n.eps[s0].append(p.initial + off)
    return n


def concat(parts: List[NFA]) -> NFA:
    n, s0 = _single()
    tails = {s0}
    for p in parts:
        off = p.copy_into(n)
        n.accept -= {s + off for s in p.accept}   # undo copy_into
        for t in tails:
            n.eps[t].append(p.initial + off)
        tails = {s + off for s in p.accept}
    n.accept = set(tails)
    return n


def optional(a: NFA) -> NFA:
    n, s0 = _single()
    off = a.copy_into(n)
    n.eps[s0].append(a.initial + off)
    n.accept.add(s0)
    return n


def repeat(a: NFA) -> NFA:
    """Kleene star (Operations.repeat(a))."""
    n, s0 = _single()
    off = a.copy_into(n)
    n.eps[s0].append(a.initial + off)
    n.accept.add(s0)
    for s in list(n.accept):
        if s != s0:
            n.eps[s].append(a.initial + off)
    return n


def repeat_min(a: NFA, min_n: int) -> NFA:
    """a^min a*  (Operations.repeat(a, min))."""
    return concat([a] * min_n + [repeat(a)])


def repeat_minmax(a: NFA, min_n: int, max_n: int) -> NFA:
    """{a^k : min<=k<=max} (Operations.repeat(a, min, max))."""
    if max_n < min_n:
        return make_empty()
    parts = [a] * min_n + [optional(a)] * (max_n - min_n)
    return concat(parts) if parts else make_empty_string()


class DFA:
    """Determinized automaton: per-state sorted interval transitions."""

    __slots__ = ("starts", "ends", "dests", "accept", "n_states")

    def __init__(self, rows: List[List[Tuple[int, int, int]]],
                 accept: FrozenSet[int]):
        self.n_states = len(rows)
        self.starts: List[List[int]] = []
        self.ends: List[List[int]] = []
        self.dests: List[List[int]] = []
        for row in rows:
            row = sorted(row)
            self.starts.append([r[0] for r in row])
            self.ends.append([r[1] for r in row])
            self.dests.append([r[2] for r in row])
        self.accept = accept

    def step(self, state: int, cp: int) -> int:
        """CharacterRunAutomaton.step: -1 = no transition."""
        if state < 0:
            return -1
        ss = self.starts[state]
        i = bisect_right(ss, cp) - 1
        if i >= 0 and cp <= self.ends[state][i]:
            return self.dests[state][i]
        return -1

    def is_accept(self, state: int) -> bool:
        return state in self.accept

    def run(self, s: str) -> bool:
        st = 0
        for ch in s:
            st = self.step(st, ord(ch))
            if st < 0:
                return False
        return st in self.accept

    def to_nfa(self) -> NFA:
        n = NFA()
        for _ in range(self.n_states):
            n.new_state()
        for st in range(self.n_states):
            for lo, hi, d in zip(self.starts[st], self.ends[st],
                                 self.dests[st]):
                n.add(st, lo, hi, d)
        n.accept = set(self.accept)
        return n


def _eps_closure(nfa: NFA, states: FrozenSet[int]) -> FrozenSet[int]:
    seen = set(states)
    stack = list(states)
    while stack:
        s = stack.pop()
        for d in nfa.eps[s]:
            if d not in seen:
                seen.add(d)
                stack.append(d)
    return frozenset(seen)


def determinize(nfa: NFA) -> DFA:
    """Subset construction over code-point intervals."""
    init = _eps_closure(nfa, frozenset([nfa.initial]))
    ids: Dict[FrozenSet[int], int] = {init: 0}
    rows: List[List[Tuple[int, int, int]]] = [[]]
    accept = set()
    work = [init]
    while work:
        cur = work.pop()
        cid = ids[cur]
        if cur & nfa.accept:
            accept.add(cid)
        # interval partition points from all outgoing transitions
        arcs = [(lo, hi, d) for s in cur for lo, hi, d in nfa.trans[s]]
        if not arcs:
            continue
        points = sorted({lo for lo, _, _ in arcs}
                        | {hi + 1 for _, hi, _ in arcs})
        row = []
        for i, plo in enumerate(points):
            phi = (points[i + 1] - 1) if i + 1 < len(points) else MAX_CP
            if plo > MAX_CP:
                break
            # by construction every arc either fully covers this
            # cell or misses it, so testing plo suffices
            tgt = _eps_closure(nfa, frozenset(
                d for lo, hi, d in arcs if lo <= plo <= hi))
            if not tgt:
                continue
            if tgt not in ids:
                ids[tgt] = len(rows)
                rows.append([])
                work.append(tgt)
            tid = ids[tgt]
            if (row and row[-1][2] == tid
                    and row[-1][1] == plo - 1):
                row[-1] = (row[-1][0], min(phi, MAX_CP), tid)
            else:
                row.append((plo, min(phi, MAX_CP), tid))
        rows[cid] = row
    return DFA(rows, frozenset(accept))


def complement(a: NFA) -> NFA:
    """Operations.complement: determinize, totalize, flip accepts."""
    dfa = determinize(a)
    n = dfa.to_nfa()
    dead = n.new_state()
    n.add(dead, 0, MAX_CP, dead)
    for st in range(dfa.n_states):
        # fill the gaps of st's sorted intervals with -> dead
        cur = 0
        fills = []
        for lo, hi in zip(dfa.starts[st], dfa.ends[st]):
            if lo > cur:
                fills.append((cur, lo - 1))
            cur = hi + 1
        if cur <= MAX_CP:
            fills.append((cur, MAX_CP))
        for lo, hi in fills:
            n.add(st, lo, hi, dead)
    n.accept = (set(range(dfa.n_states + 1)) - set(dfa.accept))
    return n


def intersection(a: NFA, b: NFA) -> NFA:
    """Product of the two determinized automata."""
    da, db = determinize(a), determinize(b)
    ids: Dict[Tuple[int, int], int] = {(0, 0): 0}
    n, _ = _single()
    work = [(0, 0)]
    while work:
        sa, sb = pair = work.pop()
        pid = ids[pair]
        if da.is_accept(sa) and db.is_accept(sb):
            n.accept.add(pid)
        for lo_a, hi_a, d_a in zip(da.starts[sa], da.ends[sa],
                                   da.dests[sa]):
            for lo_b, hi_b, d_b in zip(db.starts[sb], db.ends[sb],
                                       db.dests[sb]):
                lo, hi = max(lo_a, lo_b), min(hi_a, hi_b)
                if lo > hi:
                    continue
                np = (d_a, d_b)
                if np not in ids:
                    ids[np] = n.new_state()
                    work.append(np)
                n.add(pid, lo, hi, ids[np])
    return n


def make_decimal_interval(min_n: int, max_n: int, digits: int) -> NFA:
    """Automata.makeDecimalInterval recursion (Automata.java:452-497)."""
    x, y = str(min_n), str(max_n)
    if min_n > max_n or (digits > 0 and len(y) > digits):
        raise ValueError("invalid interval")
    d = digits if digits > 0 else len(y)
    x = "0" * (d - len(x)) + x
    y = "0" * (d - len(y)) + y

    n = NFA()
    initials: List[int] = []
    zeros_mode = digits <= 0
    root = n.new_state() if zeros_mode else None

    def any_of_right_length(s: str, k: int) -> int:
        st = n.new_state()
        if len(s) == k:
            n.accept.add(st)
        else:
            n.add(st, ord("0"), ord("9"), any_of_right_length(s, k + 1))
        return st

    def at_least(s: str, k: int, zeros: bool) -> int:
        st = n.new_state()
        if len(s) == k:
            n.accept.add(st)
        else:
            if zeros:
                initials.append(st)
            c = s[k]
            n.add(st, ord(c), ord(c),
                  at_least(s, k + 1, zeros and c == "0"))
            if c < "9":
                n.add(st, ord(c) + 1, ord("9"),
                      any_of_right_length(s, k + 1))
        return st

    def at_most(s: str, k: int) -> int:
        st = n.new_state()
        if len(s) == k:
            n.accept.add(st)
        else:
            c = s[k]
            n.add(st, ord(c), ord(c), at_most(s, k + 1))
            if c > "0":
                n.add(st, ord("0"), ord(c) - 1,
                      any_of_right_length(s, k + 1))
        return st

    def between(sx: str, sy: str, k: int, zeros: bool) -> int:
        st = n.new_state()
        if len(sx) == k:
            n.accept.add(st)
        else:
            if zeros:
                initials.append(st)
            cx, cy = sx[k], sy[k]
            if cx == cy:
                n.add(st, ord(cx), ord(cx),
                      between(sx, sy, k + 1, zeros and cx == "0"))
            else:
                n.add(st, ord(cx), ord(cx),
                      at_least(sx, k + 1, zeros and cx == "0"))
                n.add(st, ord(cy), ord(cy), at_most(sy, k + 1))
                if ord(cx) + 1 < ord(cy):
                    n.add(st, ord(cx) + 1, ord(cy) - 1,
                          any_of_right_length(sx, k + 1))
        return st

    start = between(x, y, 0, zeros_mode)
    if zeros_mode:
        n.add(root, ord("0"), ord("0"), root)
        n.eps[root].append(start)
        for p in initials:
            n.eps[root].append(p)
        n.initial = root
    else:
        n.initial = start
    return n


# --------------------------------------------------------- the parser

class _Parser:
    """RegExp.java recursive descent (lines 1030-1167), ALL flags."""

    def __init__(self, s: str):
        self.s = s
        self.cps = [ord(c) for c in s]   # str iteration = code points
        self.pos = 0

    def more(self) -> bool:
        return self.pos < len(self.cps)

    def peek(self, chars: str) -> bool:
        return self.more() and chr(self.cps[self.pos]) in chars

    def match(self, c: str) -> bool:
        if self.more() and self.cps[self.pos] == ord(c):
            self.pos += 1
            return True
        return False

    def next(self) -> int:
        if not self.more():
            raise ValueError("unexpected end-of-string")
        cp = self.cps[self.pos]
        self.pos += 1
        return cp

    # grammar, highest level first
    def parse_union(self) -> NFA:
        e = self.parse_inter()
        if self.match("|"):
            return union([e, self.parse_union()])
        return e

    def parse_inter(self) -> NFA:
        e = self.parse_concat()
        if self.match("&"):
            return intersection(e, self.parse_inter())
        return e

    def parse_concat(self) -> NFA:
        e = self.parse_repeat()
        if self.more() and not self.peek(")|") and not self.peek("&"):
            return concat([e, self.parse_concat()])
        return e

    def parse_repeat(self) -> NFA:
        e = self.parse_compl()
        while self.peek("?*+{"):
            if self.match("?"):
                e = optional(e)
            elif self.match("*"):
                e = repeat(e)
            elif self.match("+"):
                e = repeat_min(e, 1)
            elif self.match("{"):
                start = self.pos
                while self.peek("0123456789"):
                    self.next()
                if start == self.pos:
                    raise ValueError(
                        "integer expected at position %d" % self.pos)
                lo = int(self.s[start:self.pos])
                hi: Optional[int] = None
                if self.match(","):
                    start = self.pos
                    while self.peek("0123456789"):
                        self.next()
                    if start != self.pos:
                        hi = int(self.s[start:self.pos])
                else:
                    hi = lo
                if not self.match("}"):
                    raise ValueError(
                        "expected '}' at position %d" % self.pos)
                e = (repeat_min(e, lo) if hi is None
                     else repeat_minmax(e, lo, hi))
        return e

    def parse_compl(self) -> NFA:
        if self.match("~"):
            return complement(self.parse_compl())
        return self.parse_charclass_exp()

    def parse_charclass_exp(self) -> NFA:
        if self.match("["):
            negate = self.match("^")
            e = self.parse_charclasses()
            if negate:
                e = intersection(make_any_char(), complement(e))
            if not self.match("]"):
                raise ValueError("expected ']' at position %d" % self.pos)
            return e
        return self.parse_simple()

    def parse_charclasses(self) -> NFA:
        e = self.parse_charclass()
        while self.more() and not self.peek("]"):
            e = union([e, self.parse_charclass()])
        return e

    def parse_charclass(self) -> NFA:
        c = self.parse_char()
        if self.match("-"):
            c2 = self.parse_char()
            if c > c2:
                raise ValueError(
                    "invalid range: from (%d) cannot be > to (%d)"
                    % (c, c2))
            return make_char_range(c, c2)
        return make_char(c)

    def parse_simple(self) -> NFA:
        if self.match("."):
            return make_any_char()
        if self.match("#"):
            return make_empty()
        if self.match("@"):
            return make_any_string()
        if self.match('"'):
            start = self.pos
            while self.more() and not self.peek('"'):
                self.next()
            if not self.match('"'):
                raise ValueError(
                    'expected \'"\' at position %d' % self.pos)
            return make_string(
                "".join(chr(c) for c in self.cps[start:self.pos - 1]))
        if self.match("("):
            if self.match(")"):
                return make_empty_string()
            e = self.parse_union()
            if not self.match(")"):
                raise ValueError("expected ')' at position %d" % self.pos)
            return e
        if self.match("<"):
            start = self.pos
            while self.more() and not self.peek(">"):
                self.next()
            if not self.match(">"):
                raise ValueError("expected '>' at position %d" % self.pos)
            body = "".join(chr(c) for c in self.cps[start:self.pos - 1])
            i = body.find("-")
            if i == -1:
                raise ValueError(
                    "named automata are not supported: %r" % body)
            if (i == 0 or i == len(body) - 1
                    or i != body.rfind("-")):
                raise ValueError(
                    "interval syntax error at position %d"
                    % (self.pos - 1))
            smin, smax = body[:i], body[i + 1:]
            try:
                imin, imax = int(smin), int(smax)
            except ValueError:
                raise ValueError(
                    "interval syntax error at position %d"
                    % (self.pos - 1))
            digits = len(smin) if len(smin) == len(smax) else 0
            if imin > imax:
                imin, imax = imax, imin
            return make_decimal_interval(imin, imax, digits)
        return make_char(self.parse_char())

    def parse_char(self) -> int:
        self.match("\\")
        return self.next()


def compile_regexp(pattern: str) -> DFA:
    """Parse a Lucene RegExp and return its determinized DFA."""
    p = _Parser(pattern)
    nfa = p.parse_union()
    if p.more():
        raise ValueError("end-of-string expected at position %d" % p.pos)
    return determinize(nfa)


def mandatory_prefix(dfa: DFA) -> str:
    """The common prefix every accepted string starts with (the seek
    prefix AutomatonTermsEnum derives via Operations.getCommonPrefix —
    used to push a range/startswith predicate into the term scan)."""
    out = []
    state = 0
    seen = set()
    while state not in seen:
        seen.add(state)
        if dfa.is_accept(state):
            break
        ss = dfa.starts[state]
        if len(ss) != 1 or ss[0] != dfa.ends[state][0]:
            break
        out.append(chr(ss[0]))
        state = dfa.dests[state][0]
    return "".join(out)


def regexp_match_udf(term_col, pattern: str):
    """Arrow-batched full-match of a Lucene RegExp over a term column
    (RegexpQuery semantics: the whole term must be accepted)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    dfa = compile_regexp(pattern)

    def _run(terms):
        return pd.Series([
            t is not None and dfa.run(t) for t in terms])

    return pandas_udf(_run, "boolean")(term_col)
