"""Surround query parser: grammar shapes + execution vs composed oracle.

Reference: lucene/queryparser/.../surround/parser/QueryParser.jj and
surround/query/DistanceQuery.java (slop = opDistance - 1).
"""

import pytest

from lucene_solr_spark.search.surround import execute_surround, parse_surround


# ---------------- grammar ----------------

def test_precedence_or_and_not_n_w():
    # OR < AND < NOT < N < W, each left-associative
    q = parse_surround("a OR b AND c NOT d")
    assert q["k"] == "or"
    a, rhs = q["cs"]
    assert a["t"] == "a" and rhs["k"] == "and"
    b, nt = rhs["cs"]
    assert b["t"] == "b" and nt["k"] == "not"
    assert [c["t"] for c in nt["cs"]] == ["c", "d"]


def test_infix_distance_defaults_and_numbers():
    q = parse_surround("a 3w b")
    assert (q["k"], q["d"], q["ordered"]) == ("dist", 3, True)
    q2 = parse_surround("a n b")
    assert (q2["d"], q2["ordered"]) == (1, False)
    # infix chains nest left-associatively and BINARY (QueryParser.jj
    # WQuery re-wraps the running query)
    q3 = parse_surround("a w b w c")
    assert q3["cs"][0]["k"] == "dist" and q3["cs"][1]["t"] == "c"
    # W binds tighter than N
    q4 = parse_surround("a n b w c")
    assert q4["k"] == "dist" and not q4["ordered"]
    assert q4["cs"][1]["k"] == "dist" and q4["cs"][1]["ordered"]


def test_prefix_operators_and_weights():
    q = parse_surround("3W(fast, or(query, merge))^2")
    assert (q["d"], q["ordered"], q["w"]) == (3, True, 2.0)
    assert q["cs"][1]["k"] == "or"
    assert [c["t"] for c in q["cs"][1]["cs"]] == ["query", "merge"]
    # left-associative weight multiplication
    assert parse_surround("abc^2^3")["w"] == 6.0
    with pytest.raises(ValueError, match="boost"):
        parse_surround("abc^0")


def test_operator_words_case_and_quoting():
    assert parse_surround("a AnD b")["k"] == "and"
    # bare 'w' lexes as the operator; quoted it is a term
    assert parse_surround('"w"')["t"] == "w"
    assert parse_surround('"and"')["t"] == "and"


def test_truncation_minimums():
    assert parse_surround("sor*")["k"] == "pre"
    assert parse_surround("s?an")["k"] == "wild"
    assert parse_surround('"sor"*') == {"k": "pre", "t": "sor", "w": 1.0}
    for bad in ("ab*", "s?n", '"ab"*'):
        with pytest.raises(ValueError, match="truncation"):
            parse_surround(bad)


def test_parse_errors():
    for bad in ("", "a AND", "(a", "or(a)", "a b", "notafield:x"):
        with pytest.raises(ValueError):
            parse_surround(bad)


def test_field_prefix_text_only():
    assert parse_surround("text:spark")["t"] == "spark"
    with pytest.raises(ValueError, match="field"):
        parse_surround("title:spark")


# ---------------- execution ----------------

@pytest.fixture(scope="module")
def pos_index(spark, tiny_corpus, tmp_path_factory):
    from lucene_solr_spark.index.builder import transcripts_from_pandas
    from lucene_solr_spark.index.segments import build_segmented_index

    df = transcripts_from_pandas(spark, tiny_corpus)
    return build_segmented_index(
        df,
        str(tmp_path_factory.mktemp("surround_idx")),
        num_segments=4,
        seg_group_size=2,
        n_buckets=8,
        index_positions=True,
    )


def _scores(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


def test_and_not_composition(spark, tiny_index):
    """a AND b NOT c == intersection summing scores, minus c-docs,
    composed from single-term runs."""
    from lucene_solr_spark.search.bruteforce import search_bruteforce

    got = _scores(execute_surround("the AND a NOT data", tiny_index))
    ta = _scores(search_bruteforce(tiny_index, ["the"], k=None))
    tb = _scores(search_bruteforce(tiny_index, ["a"], k=None))
    tc = set(_scores(search_bruteforce(tiny_index, ["data"], k=None)))
    want = {
        d: ta[d] + tb[d] for d in ta.keys() & tb.keys() if d not in tc
    }
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-6)


def test_or_sums_and_weight_scales(spark, tiny_index):
    from lucene_solr_spark.search.bruteforce import search_bruteforce

    got = _scores(execute_surround("(the OR data)^2", tiny_index))
    ta = _scores(search_bruteforce(tiny_index, ["the"], k=None))
    tb = _scores(search_bruteforce(tiny_index, ["data"], k=None))
    for d, s in got.items():
        assert s == pytest.approx(
            2.0 * (ta.get(d, 0.0) + tb.get(d, 0.0)), rel=1e-5
        )


def test_w_matches_span_engine(spark, tiny_index, pos_index):
    """3W(a, b) == search_phrase(slop=2, ordered); N == unordered."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.index.builder import standard_tokens
    from lucene_solr_spark.search.phrase import search_phrase

    tok = pos_index.stored.select(
        "doc_id", F.posexplode(standard_tokens("text")).alias("pos", "term")
    )
    pair = (
        tok.alias("x")
        .join(
            tok.alias("y"),
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("y.pos") == F.col("x.pos") + 1),
        )
        .groupBy(F.col("x.term").alias("t1"), F.col("y.term").alias("t2"))
        .agg(F.count_distinct("x.doc_id").alias("nd"))
        .filter(F.col("nd") >= 3)
        .orderBy(F.desc("nd"), "t1", "t2")
        .first()
    )
    t1, t2 = pair["t1"], pair["t2"]
    got = _scores(
        execute_surround(f"3w({t1}, {t2})", tiny_index, pos_index)
    )
    want = _scores(search_phrase(pos_index, [t1, t2], slop=2))
    assert got == want
    gn = _scores(execute_surround(f"{t1} 2N {t2}", tiny_index, pos_index))
    wn = _scores(search_phrase(pos_index, [t1, t2], slop=1, ordered=False))
    assert gn == wn


def test_truncation_expands_scored(spark, tiny_index):
    """pre* == OR of every dictionary term with the prefix, scored."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.search.bruteforce import search_bruteforce

    terms = [
        r["term"]
        for r in tiny_index.dictionary.filter(
            F.col("term").startswith("ster")
        ).select("term").collect()
    ]
    assert len(terms) > 1, "corpus should have several ster* terms"
    got = _scores(execute_surround("ster*", tiny_index))
    per = [_scores(search_bruteforce(tiny_index, [t], k=None)) for t in terms]
    for d, s in got.items():
        assert s == pytest.approx(
            sum(p.get(d, 0.0) for p in per), rel=1e-5
        )


def test_dist_operand_restrictions(tiny_index, pos_index):
    with pytest.raises(ValueError, match="distance operands"):
        execute_surround("w(and(a, b), c)", tiny_index, pos_index)
    with pytest.raises(ValueError, match="pos_index"):
        execute_surround("a w b", tiny_index)
