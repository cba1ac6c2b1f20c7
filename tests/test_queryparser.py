"""Classic query-string parser (subset of QueryParser.jj grammar)."""

from lucene_solr_spark.search.queryparser import parse_query


def test_bare_terms_are_should():
    p = parse_query("spark merge window")
    assert p.mode == "disjunctive"
    assert p.terms == ["spark", "merge", "window"]
    assert p.exclude == []


def test_and_promotes_to_must():
    p = parse_query("spark AND merge")
    assert p.mode == "conjunctive"
    assert p.terms == ["spark", "merge"]


def test_plus_minus_prefixes():
    p = parse_query("+spark +merge -vector")
    assert p.mode == "conjunctive"
    assert p.terms == ["spark", "merge"]
    assert p.exclude == ["vector"]


def test_not_keyword():
    p = parse_query("spark NOT vector")
    assert p.terms == ["spark"]
    assert p.exclude == ["vector"]


def test_mixed_and_minus():
    p = parse_query("spark AND merge -vector")
    assert p.mode == "conjunctive"
    assert p.terms == ["spark", "merge"]
    assert p.exclude == ["vector"]


def test_boost_suffix():
    p = parse_query("spark^2.5 merge")
    assert p.should == [("spark", 2.5), ("merge", 1.0)]


def test_phrase():
    p = parse_query('"slow query" fast')
    assert p.phrases == [(["slow", "query"], 0)]
    assert p.terms == ["fast"]


def test_phrase_slop():
    p = parse_query('"slow query"~2 fast')
    assert p.phrases == [(["slow", "query"], 2)]
    assert p.terms == ["fast"]


def test_lowercasing_and_dedup():
    p = parse_query("Spark spark SPARK")
    assert p.terms == ["spark"]


def test_match_none_normalization():
    p = parse_query("+spark -spark")
    assert p.is_match_none()


def test_empty_query():
    p = parse_query("")
    assert p.terms == [] and not p.is_match_none()
