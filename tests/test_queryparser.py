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


# ---------------------------------------------------- full-grammar parsing

def test_parse_field_term_and_default_field():
    from lucene_solr_spark.search.queryparser import parse_query

    p = parse_query("spark lang:en text:merge")
    assert p.filters == [("eq", "lang", "en")]
    assert ("merge", 1.0) in p.should and ("spark", 1.0) in p.should


def test_parse_range_inclusive_exclusive_and_open():
    from lucene_solr_spark.search.queryparser import parse_query

    p = parse_query("doc_id:[100 TO 4999] price:{1.5 TO 2.5} ts:[* TO 10]")
    assert ("range", "doc_id", 100.0, 4999.0, True, True) in p.filters
    assert ("range", "price", 1.5, 2.5, False, False) in p.filters
    assert ("range", "ts", None, 10.0, True, True) in p.filters
    n = parse_query("-doc_id:[0 TO 9]")
    assert n.neg_filters == [("range", "doc_id", 0.0, 9.0, True, True)]


def test_parse_group_promotion_and_must_group():
    from lucene_solr_spark.search.queryparser import parse_query

    p = parse_query("(window OR merge) AND spark")
    assert p.groups == [[("window", 1.0), ("merge", 1.0)]]
    assert p.must == [("spark", 1.0)]
    q = parse_query("+(alpha beta) gamma")
    assert q.groups == [[("alpha", 1.0), ("beta", 1.0)]]
    assert q.should == [("gamma", 1.0)]
    r = parse_query("-(bad worse) good")
    assert r.must_not == ["bad", "worse"] and r.should == [("good", 1.0)]


def test_parse_mixed_must_should_not_simple():
    from lucene_solr_spark.search.queryparser import parse_query

    p = parse_query("+spark merge window")
    assert p.must == [("spark", 1.0)]
    assert p.should == [("merge", 1.0), ("window", 1.0)]
    assert not p.is_simple()
    assert parse_query("spark merge").is_simple()


def test_parse_rejects_unbalanced_and_unsupported():
    import pytest as _pytest

    from lucene_solr_spark.search.queryparser import parse_query

    with _pytest.raises(ValueError, match="unbalanced"):
        parse_query("(a b")
    with _pytest.raises(ValueError, match="unbalanced"):
        parse_query("a b)")
    with _pytest.raises(ValueError, match="unsupported"):
        parse_query("(a AND b) c")  # non-disjunctive group in SHOULD position


# --------------------------------------------- property: render-parse
# Random structured specs rendered to classic query strings must parse
# back to the same structure (the grammar's round-trip contract).

from hypothesis import given, settings
from hypothesis import strategies as st

_KEYWORDS = {"and", "or", "not", "to"}
_WORD = st.from_regex(r"[a-z]{2,8}", fullmatch=True).filter(
    lambda w: w not in _KEYWORDS
)


def _distinct_words(n):
    return st.lists(_WORD, min_size=n, max_size=n, unique=True)


@st.composite
def _spec(draw):
    words = draw(_distinct_words(8))
    it = iter(words)
    n_must = draw(st.integers(0, 2))
    n_should = draw(st.integers(0, 2))
    n_not = draw(st.integers(0, 2))
    grp = draw(st.booleans())
    must = [next(it) for _ in range(n_must)]
    should = [next(it) for _ in range(n_should)]
    must_not = [next(it) for _ in range(n_not)]
    group = [next(it), next(it)] if grp else []
    rng = draw(
        st.one_of(
            st.none(),
            st.tuples(st.integers(0, 50), st.integers(51, 99)),
        )
    )
    return must, should, must_not, group, rng


@given(_spec())
@settings(max_examples=200, deadline=None)
def test_render_parse_roundtrip(spec):
    from lucene_solr_spark.search.queryparser import parse_query

    must, should, must_not, group, rng = spec
    parts = [f"+{t}" for t in must]
    parts += list(should)
    parts += [f"-{t}" for t in must_not]
    if group:
        parts.append("+(" + " ".join(group) + ")")
    if rng is not None:
        parts.append(f"doc_id:[{rng[0]} TO {rng[1]}]")
    p = parse_query(" ".join(parts))
    assert [t for t, _ in p.must] == must
    assert [t for t, _ in p.should] == should
    assert p.must_not == must_not
    assert p.groups == ([[(w, 1.0) for w in group]] if group else [])
    if rng is not None:
        assert p.filters == [
            ("range", "doc_id", float(rng[0]), float(rng[1]), True, True)
        ]
    else:
        assert p.filters == []


def test_prohibited_phrase_rejected():
    import pytest as _pytest

    from lucene_solr_spark.search.queryparser import parse_query

    with _pytest.raises(ValueError, match="prohibited phrases"):
        parse_query('spark -"slow query"')
    # required-phrase forms still parse
    assert parse_query('+"slow query" spark').phrases == [
        (["slow", "query"], 0)
    ]


# ---------------------------------------------- multi-term expansions


def test_prefix_and_wildcard_terms():
    p = parse_query("spa* s?a*k")
    assert p.expansions == [
        ("should", "prefix", "spa", None, 1.0),
        ("should", "wildcard", "s?a*k", None, 1.0),
    ]
    assert not p.is_simple()


def test_fuzzy_term_default_and_explicit_edits():
    p = parse_query("roam~ merge~1 deep~9")
    # default 2 edits; explicit value honored; capped at 2
    # (LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE)
    assert p.expansions == [
        ("should", "fuzzy", "roam", 2, 1.0),
        ("should", "fuzzy", "merge", 1, 1.0),
        ("should", "fuzzy", "deep", 2, 1.0),
    ]


def test_regexp_term_may_contain_parens():
    p = parse_query("/(jo|gr)[a-z]+n/ spark")
    assert p.expansions == [("should", "regexp", "(jo|gr)[a-z]+n", None, 1.0)]
    assert p.terms == ["spark"]


def test_expansion_boost_occur_and_promotion():
    p = parse_query("+win* -vect* scan~1^3")
    assert ("must", "prefix", "win", None, 1.0) in p.expansions
    assert ("must_not", "prefix", "vect", None, 1.0) in p.expansions
    assert ("should", "fuzzy", "scan", 1, 3.0) in p.expansions
    # AND promotes a preceding SHOULD expansion (same rule as terms)
    q = parse_query("spa* AND merge")
    assert q.expansions == [("must", "prefix", "spa", None, 1.0)]
    assert q.must == [("merge", 1.0)]


def test_prohibited_group_of_expansions():
    p = parse_query("-(foo* bar) spark")
    assert ("must_not", "prefix", "foo", None, 1.0) in p.expansions
    assert p.must_not == ["bar"]


def test_wildcard_on_stored_field_is_like_filter():
    p = parse_query("role:us*r spark")
    assert p.filters == [("like", "role", "us*r")]


def test_bare_wildcard_and_stored_fuzzy_rejected():
    import pytest

    for bad in ("*", "?*", "role:term~1"):
        with pytest.raises(ValueError):
            parse_query(bad)


# ------------------------------------- fielded groups and group boosts


def test_fielded_group_becomes_in_filter():
    p = parse_query("lang:(en OR fr) spark")
    assert p.filters == [("in", "lang", ["en", "fr"])]
    assert p.terms == ["spark"]
    n = parse_query("-lang:(en fr) spark")
    assert n.neg_filters == [("in", "lang", ["en", "fr"])]


def test_fielded_group_on_default_field_is_disjunction():
    p = parse_query("text:(spark merge)^2 +window")
    assert p.must == [("window", 1.0)]
    assert ("spark", 2.0) in p.should and ("merge", 2.0) in p.should


def test_fielded_group_rejects_boolean_structure():
    import pytest

    with pytest.raises(ValueError):
        parse_query("lang:(en AND fr)")
    with pytest.raises(ValueError):
        parse_query("lang:(+en fr)")
    with pytest.raises(ValueError):
        parse_query("lang:")  # dangling field prefix


def test_group_boost_distributes():
    p = parse_query("(merge window)^2 +spark")
    assert ("merge", 2.0) in p.should and ("window", 2.0) in p.should
    # MUST-position group keeps the boost on the required disjunction
    q = parse_query("(merge window)^2 AND spark")
    assert q.groups == [[("merge", 2.0), ("window", 2.0)]]


def test_detached_boost_raises():
    import pytest

    with pytest.raises(ValueError):
        parse_query("spark ^2")


def test_escaped_specials_are_literal_terms():
    r"""\X makes any special char literal text (QueryParser.jj
    <_ESCAPED_CHAR>): escaped wildcard/fuzzy/colon/paren syntax must
    parse as plain terms, never expansions or field clauses."""
    p = parse_query(r"+spark liter\*al merge\~1 a\:b \(x\)")
    assert p.must == [("spark", 1.0)]
    assert p.should == [
        ("liter*al", 1.0), ("merge~1", 1.0), ("a:b", 1.0), ("(x)", 1.0)
    ]
    assert p.expansions == [] and p.filters == []


def test_escaped_space_stays_in_term():
    p = parse_query(r"new\ york hotel")
    assert ("new york", 1.0) in p.should and ("hotel", 1.0) in p.should


def test_escapes_in_field_values_and_ranges():
    p = parse_query(r"role:us\*r lang:(en\ us fr)")
    assert ("eq", "role", "us*r") in p.filters
    assert ("in", "lang", ["en us", "fr"]) in p.filters


def test_escaped_wildcard_inside_live_pattern_rejected():
    import pytest

    # prefix of the literal 'te*st' is fine (no live wildcard left of *)
    p = parse_query(r"te\*st*")
    assert p.expansions == [("should", "prefix", "te*st", None, 1.0)]
    # but a LIVE wildcard pattern with an escaped one inside is ambiguous
    with pytest.raises(ValueError):
        parse_query(r"te\*s?t")


def test_trailing_backslash_raises():
    import pytest

    with pytest.raises(ValueError):
        parse_query("bad\\")


def test_parse_complex_phrase_grammar():
    from lucene_solr_spark.search.queryparser import parse_complex_phrase
    import pytest

    slots, slop = parse_complex_phrase('"(john jon jonath*) peters~1 s?m"~2')
    assert slop == 2
    assert slots[0] == [
        ("term", "john"), ("term", "jon"), ("prefix", "jonath")
    ]
    assert slots[1] == [("fuzzy", "peters", 1)]
    assert slots[2] == [("wildcard", "s?m")]
    # escaped wildcard inside a complex phrase is a literal term
    s2, _ = parse_complex_phrase(r'"a\* b"')
    assert s2[0] == [("term", "a*")]
    for bad in ('no quotes', '"one"', '"(a (b)) c"', '"() c"', '"(a c"'):
        with pytest.raises(ValueError):
            parse_complex_phrase(bad)


def test_extendable_parser_rewrites():
    from lucene_solr_spark.search.extparser import rewrite_extended

    q = "+spark n_chars:range:120-180 text:pre:mer -vector lang:en"
    assert rewrite_extended(q) == (
        "+spark n_chars:[120 TO 180] mer* -vector lang:en"
    )
    # unregistered extension key falls through untouched
    assert rewrite_extended("a field:unknown:v") == "a field:unknown:v"
    # occur prefix stays outside the rewrite
    assert rewrite_extended("-n:range:1-2") == "-n:[1 TO 2]"


def test_extendable_parser_parses():
    from lucene_solr_spark.search.extparser import parse_extended

    p = parse_extended("+spark text:pre:mer")
    assert "spark" in p.terms
