"""XML query parser (CoreParser): element mapping + scoring semantics."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.xmlparser import execute_xml


@pytest.fixture(scope="module")
def pos_index(spark, tiny_corpus, tmp_path_factory):
    from lucene_solr_spark.index.builder import transcripts_from_pandas
    from lucene_solr_spark.index.segments import build_segmented_index

    df = transcripts_from_pandas(spark, tiny_corpus)
    return build_segmented_index(
        df,
        str(tmp_path_factory.mktemp("xml_idx")),
        num_segments=4,
        seg_group_size=2,
        n_buckets=8,
        index_positions=True,
    )


def _scores(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


def test_term_and_boolean_clauses(spark, tiny_index):
    from lucene_solr_spark.search.bruteforce import search_bruteforce

    q = """<BooleanQuery>
      <Clause occurs="must"><TermQuery>the</TermQuery></Clause>
      <Clause occurs="should"><TermQuery boost="2">data</TermQuery></Clause>
      <Clause occurs="mustNot"><TermQuery>guide</TermQuery></Clause>
    </BooleanQuery>"""
    got = _scores(execute_xml(q, tiny_index))
    ta = _scores(search_bruteforce(tiny_index, ["the"], k=None))
    tb = _scores(search_bruteforce(tiny_index, ["data"], k=None))
    tc = set(_scores(search_bruteforce(tiny_index, ["guide"], k=None)))
    want = {
        d: s + 2.0 * tb.get(d, 0.0)
        for d, s in ta.items()
        if d not in tc
    }
    assert got.keys() == want.keys()
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-5)


def test_terms_query_msm(spark, tiny_index):
    from lucene_solr_spark.search.bruteforce import search_bruteforce

    q = '<TermsQuery minimumNumberShouldMatch="2">the a data</TermsQuery>'
    got = _scores(execute_xml(q, tiny_index))
    per = [
        _scores(search_bruteforce(tiny_index, [t], k=None))
        for t in ("the", "a", "data")
    ]
    for d, s in got.items():
        n = sum(1 for p in per if d in p)
        assert n >= 2
        assert s == pytest.approx(
            sum(p.get(d, 0.0) for p in per), rel=1e-5
        )


def test_filter_clause_restricts_without_scoring(spark, tiny_index):
    from lucene_solr_spark.search.bruteforce import search_bruteforce

    q = """<BooleanQuery>
      <Clause occurs="must"><TermQuery>the</TermQuery></Clause>
      <Clause occurs="filter"><TermQuery>data</TermQuery></Clause>
    </BooleanQuery>"""
    got = _scores(execute_xml(q, tiny_index))
    ta = _scores(search_bruteforce(tiny_index, ["the"], k=None))
    tb = set(_scores(search_bruteforce(tiny_index, ["data"], k=None)))
    assert got.keys() == {d for d in ta if d in tb}
    for d, s in got.items():  # filter adds NO score
        assert s == pytest.approx(ta[d], rel=1e-6)


def test_dismax_and_constant_score(spark, tiny_index):
    from lucene_solr_spark.search.bruteforce import search_bruteforce

    q = """<DisjunctionMaxQuery tieBreaker="0.1">
      <TermQuery>the</TermQuery>
      <TermQuery>data</TermQuery>
    </DisjunctionMaxQuery>"""
    got = _scores(execute_xml(q, tiny_index))
    ta = _scores(search_bruteforce(tiny_index, ["the"], k=None))
    tb = _scores(search_bruteforce(tiny_index, ["data"], k=None))
    for d, s in got.items():
        a, b = ta.get(d, 0.0), tb.get(d, 0.0)
        assert s == pytest.approx(max(a, b) + 0.1 * min(a, b), rel=1e-5)
    cs = _scores(execute_xml(
        '<ConstantScoreQuery boost="1.5"><TermQuery>the</TermQuery>'
        "</ConstantScoreQuery>", tiny_index
    ))
    assert cs.keys() == ta.keys()
    assert all(v == pytest.approx(1.5) for v in cs.values())


def test_span_family(spark, tiny_index, pos_index):
    from lucene_solr_spark.index.builder import standard_tokens
    from lucene_solr_spark.search.phrase import search_phrase, span_or

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
    q = f"""<SpanNear slop="1" inOrder="true">
      <SpanTerm>{t1}</SpanTerm><SpanTerm>{t2}</SpanTerm>
    </SpanNear>"""
    got = _scores(execute_xml(q, tiny_index, pos_index))
    want = _scores(search_phrase(pos_index, [t1, t2], slop=1))
    assert got == want
    go = _scores(execute_xml(
        f"<SpanOrTerms>{t1} {t2}</SpanOrTerms>", tiny_index, pos_index
    ))
    wo = _scores(span_or(pos_index, [t1, t2], precision="float32"))
    assert go == wo


def test_range_and_match_all(spark, tiny_index, pos_index):
    stored = pos_index.stored.select(
        "doc_id", F.length("text").alias("text_len")
    )
    q = '<PointRangeQuery fieldName="text_len" lowerTerm="50" upperTerm="200"/>'
    got = _scores(execute_xml(q, tiny_index, stored=stored))
    want = {
        r["doc_id"]
        for r in stored.filter(F.col("text_len").between(50, 200)).collect()
    }
    assert got.keys() == want
    assert all(v == pytest.approx(1.0) for v in got.values())
    all_ = _scores(execute_xml(
        '<MatchAllDocsQuery/>', tiny_index, stored=stored
    ))
    assert all_.keys() == {r["doc_id"] for r in stored.collect()}


def test_user_query_and_errors(spark, tiny_index, pos_index):
    from lucene_solr_spark.search.executor import execute_parsed

    got = _scores(execute_xml(
        "<UserQuery>the data</UserQuery>", tiny_index, pos_index
    ))
    want = _scores(execute_parsed("the data", tiny_index, pos_index, k=None))
    assert got == want
    with pytest.raises(ValueError, match="parse error"):
        execute_xml("<TermQuery>unclosed", tiny_index)
    with pytest.raises(ValueError, match="unsupported"):
        execute_xml("<NoSuchQuery>x</NoSuchQuery>", tiny_index)
    with pytest.raises(ValueError, match="occurs"):
        execute_xml(
            '<BooleanQuery><Clause occurs="bogus">'
            "<TermQuery>x</TermQuery></Clause></BooleanQuery>",
            tiny_index,
        )
