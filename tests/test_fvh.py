"""FastVectorHighlighter analog tests.

Golden cases transcribed from the reference's own unit tests
(FieldPhraseListTest.java, SimpleFragListBuilderTest.java — queries,
corpus strings, and expected phrase/fragment tuples), plus snippet
assembly, weighted scoring float32 math, and the Spark narrow-plan
contract.
"""

import math

import numpy as np
import pytest

from lucene_solr_spark.search.fvh import (
    FvhQuery,
    field_phrase_list,
    frag_list,
    fvh_highlight,
    highlight_doc,
    idf_weights,
    make_fragment,
    tokenize_offsets,
)


def _phrases(text, query):
    return [
        (p[3], p[4], p[2])
        for p in field_phrase_list(tokenize_offsets(text), query)
    ]


TQ_A = FvhQuery(singles={"a": 1.0}, phrases=())
PQ_AB = FvhQuery(singles={}, phrases=((("a", "b"), 1.0),))


# ------------------------- FieldPhraseListTest.java transcriptions


def test_1term_index():
    assert _phrases("a", TQ_A) == [("a", 1.0, ((0, 1),))]
    assert _phrases("b", TQ_A) == []


def test_2terms_index():
    assert _phrases("a a", TQ_A) == [
        ("a", 1.0, ((0, 1),)), ("a", 1.0, ((2, 3),))
    ]


def test_1phrase_index():
    # consecutive positions merge into ONE highlight span (0,3)
    assert _phrases("a b", PQ_AB) == [("ab", 1.0, ((0, 3),))]
    assert _phrases("a b", FvhQuery(singles={"b": 1.0}, phrases=())) == [
        ("b", 1.0, ((2, 3),))
    ]


def test_2terms_1phrase_index():
    # phraseHighlight=true: the lone 'a' is NOT highlighted
    assert _phrases("c a a b", PQ_AB) == [("ab", 1.0, ((4, 7),))]
    # phraseHighlight=false ≡ singles for each term as well
    loose = FvhQuery(
        singles={"a": 1.0, "b": 1.0}, phrases=((("a", "b"), 1.0),)
    )
    assert _phrases("c a a b", loose) == [
        ("a", 1.0, ((2, 3),)), ("ab", 1.0, ((4, 7),))
    ]


def test_3terms_phrase():
    q = FvhQuery(singles={}, phrases=((("a", "b", "c"), 1.0),))
    assert _phrases("d a b a b c d", q) == [("abc", 1.0, ((6, 11),))]


def test_search_longest_phrase():
    q = FvhQuery(
        singles={}, phrases=((("a", "b"), 1.0), (("a", "b", "c"), 1.0))
    )
    assert _phrases("d a b d c a b c", q) == [
        ("ab", 1.0, ((2, 5),)), ("abc", 1.0, ((10, 15),))
    ]


def test_longest_fails_falls_back_to_prefix():
    # candidate [a,b] walked toward abc fails at 'd'; push-back retries
    # the [a,b] prefix which IS valid (FieldPhraseList.java:103-112)
    q = FvhQuery(
        singles={}, phrases=((("a", "b"), 1.0), (("a", "b", "c"), 2.0))
    )
    assert _phrases("a b d", q) == [("ab", 1.0, ((0, 3),))]


# ---------------------- SimpleFragListBuilderTest.java transcriptions


def _frags(text, query, frag_size):
    return [
        (f[0], f[1], f[2], [(p[3], p[2]) for p in f[3]])
        for f in frag_list(
            field_phrase_list(tokenize_offsets(text), query), frag_size
        )
    ]


def test_null_field_frag_list():
    assert _frags("b c d", TQ_A, 100) == []


def test_too_small_frag_size():
    with pytest.raises(ValueError):
        frag_list([], 17)


def test_smaller_frag_size_than_term_query():
    q = FvhQuery(singles={"abcdefghijklmnopqrs": 1.0}, phrases=())
    assert _frags("abcdefghijklmnopqrs", q, 18) == [
        (0, 19, 1.0, [("abcdefghijklmnopqrs", ((0, 19),))])
    ]


def test_smaller_frag_size_than_phrase_query():
    q = FvhQuery(singles={}, phrases=((("abcdefgh", "jklmnopqrs"), 1.0),))
    assert _frags("abcdefgh   jklmnopqrs", q, 18) == [
        (0, 21, 1.0, [("abcdefghjklmnopqrs", ((0, 21),))])
    ]


def test_1term_1frag():
    assert _frags("a", TQ_A, 100) == [(0, 100, 1.0, [("a", ((0, 1),))])]


def test_2terms_1frag():
    assert _frags("a a", TQ_A, 100) == [
        (0, 100, 2.0, [("a", ((0, 1),)), ("a", ((2, 3),))])
    ]
    assert _frags("a b b b b b b b b a", TQ_A, 20) == [
        (0, 20, 2.0, [("a", ((0, 1),)), ("a", ((18, 19),))])
    ]
    assert _frags("b b b b a b b b b a", TQ_A, 20) == [
        (4, 24, 2.0, [("a", ((8, 9),)), ("a", ((18, 19),))])
    ]


def test_2terms_2frags():
    assert _frags("a b b b b b b b b b b b b b a", TQ_A, 20) == [
        (0, 20, 1.0, [("a", ((0, 1),))]),
        (20, 40, 1.0, [("a", ((28, 29),))]),
    ]
    assert _frags("a b b b b b b b b b b b b a", TQ_A, 20) == [
        (0, 20, 1.0, [("a", ((0, 1),))]),
        (20, 40, 1.0, [("a", ((26, 27),))]),
    ]
    assert _frags("a b b b b b b b b b a", TQ_A, 20) == [
        (0, 20, 1.0, [("a", ((0, 1),))]),
        (20, 40, 1.0, [("a", ((20, 21),))]),
    ]


def test_2terms_query():
    q = FvhQuery(singles={"a": 1.0, "b": 1.0}, phrases=())
    assert _frags("c d e", q, 20) == []
    assert _frags("d b c", q, 20) == [(0, 20, 1.0, [("b", ((2, 3),))])]


def test_phrase_longer_than_frag_discarded():
    # acceptPhrase: multi-span phrases with matchLength > fragCharSize
    # are dropped; a single-span phrase always accepted
    q = FvhQuery(singles={"z": 1.0}, phrases=())
    long_text = "z " + "q " * 40 + "z"
    frags = frag_list(
        field_phrase_list(tokenize_offsets(long_text), q), 20
    )
    assert [f[2] for f in frags] == [1.0, 1.0]


# ----------------------------------------------- fragments + snippets


def test_make_fragment_basic():
    text = "b b b b a b b b b a"
    out = highlight_doc(text, TQ_A, frag_char_size=20)
    assert out == [
        (0, 4, 24, 2.0, "b b <b>a</b> b b b b <b>a</b>")
    ]


def test_make_fragment_phrase_merged_tag():
    out = highlight_doc("c a a b d", PQ_AB, frag_char_size=18)
    # one merged tag across the whole phrase text "a b"
    assert out == [(0, 0, 18, 1.0, "c a <b>a b</b> d")]


def test_score_order_and_max_frags():
    text = "a " * 1 + "b " * 12 + "a a a " + "b " * 12 + "a"
    out = highlight_doc(text, TQ_A, frag_char_size=20, max_frags=2)
    assert len(out) == 2
    # highest-scoring fragment first (3 a's beat 1 a)
    assert out[0][3] >= out[1][3]
    assert out[0][0] == 0 and out[1][0] == 1


def test_weighted_score_float32_math():
    # two 'a' occurrences, weight(a)=1.5, boost 1.0:
    # distinct-term boost = 1.5 once; norm = 2/sqrt(2); total = 1.5*sqrt(2)
    q = FvhQuery(singles={"a": 1.0}, phrases=())
    frags = frag_list(
        field_phrase_list(tokenize_offsets("a b a"), q),
        20, weighted=True, term_weights={"a": 1.5},
    )
    want = float(
        np.float32(np.float32(1.5) * np.float32(2.0 / math.sqrt(2.0)))
    )
    assert len(frags) == 1
    assert frags[0][2] == pytest.approx(want, abs=0)


def test_idf_weights_formula():
    w = idf_weights({"a": 3}, 100)
    assert w["a"] == pytest.approx(
        float(np.float32(math.log(100 / 4.0) + 1.0)), abs=0
    )


def test_snippet_clips_to_text_length():
    out = highlight_doc("x a", TQ_A, frag_char_size=30)
    assert out == [(0, 0, 30, 1.0, "x <b>a</b>")]


# ----------------------------------------------------- Spark contract


def test_fvh_spark_matches_local_and_is_narrow(spark):
    q = FvhQuery(
        singles={"merge": 1.0, "vector": 1.0},
        phrases=((("table", "merge"), 2.0),),
    )
    rows = [
        (0, "table merge merge vector b b b b b b b b b b b b vector"),
        (1, "no hits here"),
        (2, "vector " + "x " * 60 + "table merge"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.frag): (r.span_start, r.span_end, r.score, r.snippet)
        for r in fvh_highlight(df, q, frag_char_size=30, max_frags=3).collect()
    }
    want = {}
    for doc_id, text in rows:
        for rank, s, t, score, snip in highlight_doc(
            text, q, frag_char_size=30, max_frags=3
        ):
            want[(doc_id, rank)] = (s, t, score, snip)
    assert got == want
    plan = fvh_highlight(df, q)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: pure narrow pipeline


# --------------------------------- FieldQuery.expand transcriptions


def test_expand_overlapping_phrases():
    from lucene_solr_spark.search.fvh import expand_phrases

    # FieldQuery.java:172-174 javadoc: {a,"b c","c d"} -> + "b c d"
    got = expand_phrases(((("b", "c"), 1.0), (("c", "d"), 1.0)))
    assert (("b", "c", "d"), 1.0) in got
    # both directions: {"a b","b c"} -> "a b c"
    got = expand_phrases(((("a", "b"), 1.0), (("b", "c"), 1.0)))
    assert (("a", "b", "c"), 1.0) in got
    # no overlap: {"a b","c d"} adds nothing
    got = expand_phrases(((("a", "b"), 1.0), (("c", "d"), 1.0)))
    assert len(got) == 2


def test_2phrases_overlap_end_to_end():
    from lucene_solr_spark.search.fvh import expand_phrases

    # FieldPhraseListTest.test2PhrasesOverlap: pq(a,b) + pq(b,c) over
    # "d a b c d" highlights ONE span "abc((2,7))"
    q = FvhQuery(
        singles={},
        phrases=expand_phrases(((("a", "b"), 1.0), (("b", "c"), 1.0))),
    )
    assert _phrases("d a b c d", q) == [("abc", 1.0, ((2, 7),))]


# --------------------------- SimpleBoundaryScannerTest transcription

BSCAN_TEXT = ("Apache Lucene(TM) is a high-performance, full-featured\n"
              "text search engine library written entirely in Java.")


def test_boundary_scanner_vectors():
    from lucene_solr_spark.search.fvh import (find_end_offset,
                                              find_start_offset)

    n = len(BSCAN_TEXT)
    assert find_start_offset(BSCAN_TEXT, n + 1) == n + 1
    assert find_start_offset(BSCAN_TEXT, 0) == 0
    assert find_start_offset(
        BSCAN_TEXT, BSCAN_TEXT.index("formance")
    ) == BSCAN_TEXT.index("high-performance")
    assert find_start_offset(
        BSCAN_TEXT, BSCAN_TEXT.index("che")
    ) == BSCAN_TEXT.index("Apache")
    assert find_end_offset(BSCAN_TEXT, n + 1) == n + 1
    assert find_end_offset(BSCAN_TEXT, -1) == -1
    assert find_end_offset(
        BSCAN_TEXT, BSCAN_TEXT.index("full-")
    ) == BSCAN_TEXT.index("\ntext")


def test_snippet_snaps_to_boundaries():
    # fragment centering puts span_start at 1 (mid-"hello"); the
    # scanner walks back to offset 0, so the snippet keeps the whole
    # first word instead of starting at "ello"
    text = "hello world a good day here friend"
    q = FvhQuery(singles={"a": 1.0}, phrases=())
    out = highlight_doc(text, q, frag_char_size=24)
    (rank, s, t, score, snip) = out[0]
    assert s == 1  # raw span offset is unchanged by the scanner
    assert snip.startswith("hello world <b>a</b>")
    # end snapped forward to the next boundary after span_end
    from lucene_solr_spark.search.fvh import find_end_offset

    # the source buffer carries the reference's trailing separator
    eo = find_end_offset(text + " ", t)
    assert snip.replace("<b>", "").replace("</b>", "") == text[0:eo]
    assert eo == t or (text + " ")[eo] in ".,!? \t\n"


def test_phrase_slop():
    # FieldPhraseListTest.testPhraseSlop: pq(2.0, slop=1, a, c) over
    # "c a a b c" -> "ac(2.0)((4,5)(8,9))", start 4 end 9 — the slop
    # phrase skips the intervening non-query token and keeps separate
    # toffs for the non-consecutive positions
    q = FvhQuery(singles={}, phrases=((("a", "c"), 2.0, 1),))
    got = field_phrase_list(tokenize_offsets("c a a b c"), q)
    assert [(p[3], p[4], p[2], p[0], p[1]) for p in got] == [
        ("ac", 2.0, ((4, 5), (8, 9)), 4, 9)
    ]
    # gap 2 exceeds slop 1: "c a a b d c" has a@4(pos2), c@10(pos5)
    got = field_phrase_list(tokenize_offsets("c a a b d c"), q)
    assert got == []


def test_multi_colored_tags_by_seqnum():
    # tag arrays cycle by clause seqnum (BaseFragmentsBuilder
    # getPreTag(preTags, seqnum) — multi-colored highlighting)
    q = FvhQuery(singles={"a": 1.0, "b": 1.0}, phrases=())
    out = highlight_doc(
        "a x b x a", q, frag_char_size=20,
        pre_tag=["<R>", "<G>"], post_tag=["</R>", "</G>"],
    )
    assert out[0][4] == "<R>a</R> x <G>b</G> x <R>a</R>"


# --------------------------- randomized greedy-scan property test


def _stack_machine_phrase_list(tokens, query):
    """Independent reimplementation of the FieldPhraseList loop as a
    literal stack machine (pop / push-back on a deque), used as the
    property-test oracle for field_phrase_list's trie-walk version."""
    from collections import deque

    def node_for(terms):
        level, node = query.trie(), None
        for t in terms:
            node = level.get(t)
            if node is None:
                return None
            level = node[1]
        return node

    def valid(terms_tokens):
        node = node_for([t[0] for t in terms_tokens])
        if node is None or node[0] is None:
            return None
        if len(terms_tokens) > 1:
            slop = node[0][1]
            pos = terms_tokens[0][1]
            for t in terms_tokens[1:]:
                if abs(t[1] - pos - 1) > slop:
                    return None
                pos = t[1]
        return node[0]

    term_set = query.term_set()
    stack = deque(t for t in tokens if t[0] in term_set)
    out = []
    while stack:
        first = stack.popleft()
        cur = node_for([first[0]])
        if cur is None:
            continue
        cand = [first]
        while True:
            ti = stack.popleft() if stack else None
            nxt = None
            if ti is not None:
                nxt = cur[1].get(ti[0])
            if ti is None or nxt is None:
                if ti is not None:
                    stack.appendleft(ti)
                meta = valid(cand)
                if meta is not None:
                    out.append((cand, meta))
                else:
                    while len(cand) > 1:
                        stack.appendleft(cand.pop())
                        meta = valid(cand)
                        if meta is not None:
                            out.append((cand, meta))
                            break
                break
            cand = cand + [ti]
            cur = nxt
    # addIfNoOverlap: keep (start, end, boost) of non-overlapping
    # matches in scan order
    res, kept = [], []
    for cand, meta in out:
        s, e = cand[0][2], cand[-1][3]
        if not any(
            (s <= o[0] < e) or (s < o[1] <= e)
            or (o[0] <= s < o[1]) or (o[0] < e <= o[1])
            for o in kept
        ):
            kept.append((s, e))
            res.append((s, e, meta[0]))
    return res


def test_greedy_scan_matches_stack_machine_randomized():
    import random

    rng = random.Random(424242)
    vocab = ["a", "b", "c", "d", "e"]
    for trial in range(400):
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))
        n_singles = rng.randint(0, 2)
        singles = {t: 1.0 + i for i, t in enumerate(
            rng.sample(vocab, n_singles))}
        phrases = []
        for _ in range(rng.randint(0, 3)):
            ln = rng.randint(2, 3)
            terms = tuple(rng.choice(vocab) for _ in range(ln))
            phrases.append((terms, 2.0, rng.randint(0, 2)))
        q = FvhQuery(singles=singles, phrases=tuple(phrases))
        got = [
            (p[0], p[1], p[4])
            for p in field_phrase_list(tokenize_offsets(text), q)
        ]
        want = _stack_machine_phrase_list(tokenize_offsets(text), q)
        assert got == want, (trial, text, singles, phrases, got, want)


# ------------------- multi-valued fields (JUnit-transcribed vectors)

from lucene_solr_spark.search.fvh import (  # noqa: E402
    discrete_split,
    highlight_doc_mv,
    idf_weights,
    tokenize_offsets_mv,
)

_SPAN_VALUES = [
    "one two three five",
    "two three four",
    "five six five",
    "six seven eight nine eight nine eight nine eight nine eight nine "
    "eight nine",
    "eight nine",
    "ten eleven",
    "twelve thirteen",
]


def _mv_snips(values, query, frag_char_size=1000, max_frags=1000,
              weighted=False, tw=None, score_order=False):
    return [
        r[4]
        for r in highlight_doc_mv(
            values, query, frag_char_size, margin=6, weighted=weighted,
            term_weights=tw, max_frags=max_frags, discrete=True,
            score_order=score_order,
        )
    ]


def test_mv_phrase_spanning_field_value():
    # FastVectorHighlighterTest.testPhrasesSpanningFieldValues:651-657
    q = FvhQuery(singles={}, phrases=((("four", "five"), 1.0),))
    assert _mv_snips(_SPAN_VALUES, q) == [
        "two three <b>four</b>",
        "<b>five</b> six five",
    ]


def test_mv_phrase_ending_at_field_value():
    # :659-664
    q = FvhQuery(singles={}, phrases=((("three", "five"), 1.0),))
    assert _mv_snips(_SPAN_VALUES, q) == ["one two <b>three five</b>"]


def test_mv_phrase_across_three_values():
    # :666-673
    q = FvhQuery(
        singles={}, phrases=((("nine", "ten", "eleven", "twelve"), 1.0),)
    )
    assert _mv_snips(_SPAN_VALUES, q) == [
        "eight <b>nine</b>",
        "<b>ten eleven</b>",
        "<b>twelve</b> thirteen",
    ]


def test_mv_term_in_multiple_values():
    # :675-681
    q = FvhQuery(singles={"two": 1.0}, phrases=())
    assert _mv_snips(_SPAN_VALUES, q) == [
        "one <b>two</b> three five",
        "<b>two</b> three four",
    ]


def test_mv_sort_by_score():
    # FastVectorHighlighterTest.testMultiValuedSortByScore:481-527 —
    # the bottom "naught of hero" values total a higher score than the
    # top pair; the best single fragment is the all-three-terms value.
    values = [
        "zero if naught",
        "hero of legend",
        "naught of hero",
        "naught of hero",
    ]
    q = FvhQuery(
        singles={"hero": 1.0, "of": 1.0, "legend": 1.0}, phrases=()
    )
    # one-document index: docFreq is 1 for every term present
    tw = idf_weights({"hero": 1, "of": 1, "legend": 1}, 1)
    for weighted in (False, True):
        for fcs in (20, 28, 30000):
            snips = _mv_snips(
                values, q, frag_char_size=fcs, max_frags=1,
                weighted=weighted, tw=tw, score_order=True,
            )
            assert snips == ["<b>hero</b> <b>of</b> <b>legend</b>"], (
                weighted, fcs, snips,
            )


def test_mv_single_value_equals_single_valued_path():
    """A one-element values list must be EXACTLY the single-valued
    pipeline (incl. the virtual trailing-separator end-boundary)."""
    import random

    rng = random.Random(11)
    words = ["a", "b", "c", "dd", "eee", "ffff"]
    q = FvhQuery(
        singles={"a": 1.0, "c": 2.0},
        phrases=((("b", "c"), 1.5), (("dd", "eee", "ffff"), 2.0)),
    )
    for _ in range(200):
        text = " ".join(
            rng.choice(words) for _ in range(rng.randint(1, 30))
        )
        mv = highlight_doc_mv([text], q, 40, score_order=True)
        sv = highlight_doc(text, q, 40)
        assert mv == sv, text


def test_mv_gap_zero_matches_joined_single_value():
    """With posIncGap=0 and the default (non-discrete) builder the MV
    pipeline matches the single-valued pipeline over ' '.join(values)
    in spans and scores ALWAYS; the snippet may only be clipped
    earlier, because getFragmentSourceMSO stops growing its buffer at
    endOffset and then cuts at the last appended value's end
    (bufferLength < endOffset branch) — a reference quirk the joined
    single value cannot reproduce."""
    import random

    rng = random.Random(7)
    words = ["a", "b", "c", "dd", "eee", "ffff"]
    q = FvhQuery(
        singles={"a": 1.0, "c": 2.0},
        phrases=((("b", "c"), 1.5), (("dd", "eee", "ffff"), 2.0)),
    )

    def detag(s):
        return s.replace("<b>", "").replace("</b>", "")

    for _ in range(300):
        values = [
            " ".join(
                rng.choice(words) for _ in range(rng.randint(1, 12))
            )
            for _ in range(rng.randint(1, 4))
        ]
        mv = highlight_doc_mv(
            values, q, 40, discrete=False, score_order=True
        )
        sv = highlight_doc(" ".join(values), q, 40)
        assert [r[:4] for r in mv] == [r[:4] for r in sv], values
        for a, b in zip(mv, sv):
            assert detag(b[4]).startswith(detag(a[4])), (values, a, b)


def test_mv_gap_blocks_cross_value_phrases():
    """positionIncrementGap > slop prevents a phrase from matching
    across the value boundary (the Solr schema convention)."""
    q = FvhQuery(singles={}, phrases=((("four", "five"), 1.0),))
    toks = tokenize_offsets_mv(["two three four", "five six"], 100)
    from lucene_solr_spark.search.fvh import field_phrase_list

    assert field_phrase_list(toks, q) == []
    toks0 = tokenize_offsets_mv(["two three four", "five six"], 0)
    assert len(field_phrase_list(toks0, q)) == 1


def test_mv_discrete_split_empty_value():
    """Empty values consume exactly one separator position
    (discreteMultiValueHighlighting:226-233)."""
    values = ["one two", "", "two three"]
    q = FvhQuery(singles={"two": 1.0}, phrases=())
    snips = _mv_snips(values, q)
    assert snips == ["one <b>two</b>", "<b>two</b> three"]


# ------------------- index-time synonym rings (JUnit-transcribed)

from lucene_solr_spark.search.fvh import fvh_synonym_stack  # noqa: E402


def test_synonym_query_highlight():
    # FastVectorHighlighterTest.testWithSynonym:529-553 — query-side
    # SynonymQuery(quick, fast): both terms become singles
    q = FvhQuery(singles={"quick": 1.0, "fast": 1.0}, phrases=())
    out = highlight_doc("the quick brown fox", q, 54, max_frags=1)
    assert out[0][4] == "the <b>quick</b> brown fox"
    q2 = FvhQuery(
        singles={"quick": 1.0, "fast": 1.0, "fox": 1.0}, phrases=()
    )
    out = highlight_doc("the quick brown fox", q2, 54, max_frags=1)
    assert out[0][4] == "the <b>quick</b> brown <b>fox</b>"


_FB_TEXT = "Test: http://www.facebook.com"
# the CannedTokenStream from testBooleanPhraseWithSynonym:585-602:
# the synonym token sits at the SAME position as 'http' with the
# match-wide offsets — a 2-member TermInfo ring
_FB_TOKENS = [
    ("test", 0, 0, 4),
    ("http", 1, 6, 10),
    ("httpwwwfacebookcom", 1, 6, 29),
    ("www", 2, 13, 16),
    ("facebook", 3, 17, 25),
    ("com", 4, 26, 29),
]


def _fb(query):
    out = highlight_doc(
        _FB_TEXT, query, 54, max_frags=1, tokens=_FB_TOKENS
    )
    return out[0][4]


def test_boolean_phrase_with_synonym_ring():
    # FastVectorHighlighterTest.testBooleanPhraseWithSynonym:604-620
    pq = FvhQuery(
        singles={},
        phrases=((("test", "http", "www", "facebook", "com"), 1.0),),
    )
    assert _fb(pq) == "<b>Test: http://www.facebook.com</b>"
    pq2 = FvhQuery(
        singles={},
        phrases=(
            (("test", "httpwwwfacebookcom", "www", "facebook", "com"),
             1.0),
        ),
    )
    assert _fb(pq2) == "<b>Test: http://www.facebook.com</b>"
    both = FvhQuery(
        singles={},
        phrases=(
            (("test", "http", "www", "facebook", "com"), 1.0),
            (("test", "httpwwwfacebookcom", "www", "facebook", "com"),
             1.0),
        ),
    )
    assert _fb(both) == "<b>Test: http://www.facebook.com</b>"


def test_synonym_stack_from_syngraph_rules():
    """End-to-end: index-time SynonymGraphFilter rules -> flattened
    FieldTermStack with rings -> FVH highlights the synonym's
    match-wide span when the query uses the synonym term."""
    from lucene_solr_spark.analysis.syngraph import parse_synonym_rules

    rules = parse_synonym_rules(["merge join => mergejoin"])
    text = "a fast merge join wins"
    stack = fvh_synonym_stack(text, rules)
    # ring at the 'merge' position holds {merge, mergejoin}
    pos_terms = {}
    for t in stack:
        pos_terms.setdefault(t[1], set()).add(t[0])
    assert pos_terms[2] == {"merge", "mergejoin"}
    q = FvhQuery(singles={"mergejoin": 1.0}, phrases=())
    out = highlight_doc(text, q, 100, max_frags=1, tokens=stack)
    assert out[0][4] == "a fast <b>merge join</b> wins"
    # original-path phrase still matches over the same stack
    q2 = FvhQuery(singles={}, phrases=((("merge", "join"), 1.0),))
    out = highlight_doc(text, q2, 100, max_frags=1, tokens=stack)
    assert out[0][4] == "a fast <b>merge join</b> wins"
