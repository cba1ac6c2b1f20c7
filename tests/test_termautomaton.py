"""TermAutomatonQuery semantics: the accepted-sequence-sum freq used
by search/termautomaton.py must equal a LITERAL transcription of the
reference scorer's NFA-thread walk (TermAutomatonScorer.countMatches,
lucene/sandbox/.../search/TermAutomatonScorer.java:230-345 — multiset
thread states, per-pop new-thread starts, ANY arcs advanced across
every intermediate position, freq++ per accept arrival)."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from lucene_solr_spark.search.termautomaton import ANY, TermAutomaton


def count_matches_literal(auto: TermAutomaton, token_stream) -> int:
    """Direct port of TermAutomatonScorer.countMatches over a token
    stream [(pos, label), ...] restricted to query terms (the scorer
    only ever pops postings of the automaton's terms)."""
    dfa, acc, start = auto._dfa, auto._dfa_accept, auto._dfa_start

    def step(state, label):
        return dfa.get(state, {}).get(label)

    labels = {lab for m in dfa.values() for lab in m}
    has_any = ANY in labels
    positions = defaultdict(list)  # pos -> multiset of DFA states
    freq = 0
    last_pos = -1
    for pos, lab in sorted(token_stream):
        if last_pos != -1 and has_any:
            lp = last_pos
            start_lp = lp
            while lp < pos:
                ps = positions[lp]
                if not ps and lp > start_lp:
                    break
                for st in ps:
                    ns = step(st, ANY)
                    if ns is not None:
                        positions[lp + 1].append(ns)
                lp += 1
        for st in list(positions[pos]):
            ns = step(st, lab)
            if ns is not None:
                positions[pos + 1].append(ns)
                if ns in acc:
                    freq += 1
        ns = step(start, lab)
        if ns is not None:
            positions[pos + 1].append(ns)
            if ns in acc:
                freq += 1
        last_pos = pos
    return freq


def seq_sum(sequences, token_stream) -> int:
    """The closed-form this rebuild evaluates distributively: per
    sequence and start position, the PRODUCT of anchor-occurrence
    multiplicities (duplicate tokens at one position are separate
    NFA threads — PosState is a multiset — and separate join rows in
    the Spark/SQL evaluation), summed."""
    mult = defaultdict(int)
    for p, t in token_stream:
        mult[(p, t)] += 1
    total = 0
    for seq in sequences:
        anchors = [(i, t) for i, t in enumerate(seq) if t != ANY]
        i0, t0 = anchors[0]
        starts = {p - i0 for (p, t) in mult if t == t0}
        for start in starts:
            prod = 1
            for i, t in anchors:
                prod *= mult[(start + i, t)]
            total += prod
    return total


def _phrase_auto():
    a = TermAutomaton()
    s1, s2 = a.create_state(), a.create_state()
    a.add_transition(0, s1, "x")
    a.add_transition(s1, s2, "y")
    a.set_accept(s2)
    return a


def _synonym_any_auto():
    # x (ANY|y) y — the gate's shape: accepts [x, y] and [x, ANY, y]
    a = TermAutomaton()
    s1, s2, s3 = a.create_state(), a.create_state(), a.create_state()
    a.add_transition(0, s1, "x")
    a.add_any_transition(s1, s2)
    a.add_transition(s2, s3, "y")
    a.add_transition(s1, s3, "y")
    a.set_accept(s3)
    return a


def _prefix_accept_auto():
    # accepts [x] and [x, y] — intermediate accept state
    a = TermAutomaton()
    s1, s2 = a.create_state(), a.create_state()
    a.add_transition(0, s1, "x")
    a.add_transition(s1, s2, "y")
    a.set_accept(s1)
    a.set_accept(s2)
    return a


def _branchy_auto():
    # (x|y) ANY ANY x, plus direct x z
    a = TermAutomaton()
    s1, s2, s3, s4 = (a.create_state() for _ in range(4))
    a.add_transition(0, s1, "x")
    a.add_transition(0, s1, "y")
    a.add_any_transition(s1, s2)
    a.add_any_transition(s2, s3)
    a.add_transition(s3, s4, "x")
    a.add_transition(s1, s4, "z")
    a.set_accept(s4)
    return a


AUTOS = [_phrase_auto, _synonym_any_auto, _prefix_accept_auto,
         _branchy_auto]


def test_sequences_enumerated():
    assert _synonym_any_auto().finish() == [("x", ANY, "y"), ("x", "y")]
    assert set(_prefix_accept_auto().finish()) == {("x",), ("x", "y")}


def test_validation():
    a = TermAutomaton()
    s1 = a.create_state()
    a.add_any_transition(0, s1)
    a.set_accept(s1)
    with pytest.raises(ValueError, match="lead"):
        a.finish()
    b = TermAutomaton()
    s1, s2 = b.create_state(), b.create_state()
    b.add_transition(0, s1, "x")
    b.add_any_transition(s1, s2)
    b.set_accept(s2)
    with pytest.raises(ValueError, match="end"):
        b.finish()
    c = TermAutomaton()
    s1 = c.create_state()
    c.add_transition(0, s1, "x")
    c.add_transition(s1, s1, "y")
    c.set_accept(s1)
    with pytest.raises(ValueError, match="cyclic"):
        c.finish()


def test_seq_sum_matches_literal_scorer():
    rng = random.Random(42)
    vocab = ["x", "y", "z", "w"]
    for make in AUTOS:
        auto = make()
        seqs = auto.finish()
        for _trial in range(300):
            n = rng.randrange(0, 12)
            stream = []
            for p in range(n):
                # occasionally two tokens at one position (graph
                # streams), occasionally a non-query filler term
                for _ in range(1 + (rng.random() < 0.15)):
                    t = rng.choice(vocab)
                    if t in ("x", "y", "z"):
                        stream.append((p, t))
            assert count_matches_literal(auto, stream) == seq_sum(
                seqs, stream
            ), (make.__name__, stream)
