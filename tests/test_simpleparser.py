"""SimpleQueryParser: syntax mapping + the never-throws contract."""

import random
import string

from lucene_solr_spark.search.simpleparser import parse_simple_query as p


def test_operators_map_to_spec():
    q = p("spark + merge | vector -slow")
    assert q.must == [("spark", 1.0)]
    assert q.groups == [[("merge", 1.0), ("vector", 1.0)]]
    assert q.must_not == ["slow"]


def test_default_operator():
    assert p("spark merge").should == [("spark", 1.0), ("merge", 1.0)]
    assert p("spark merge", default_operator="and").must == [
        ("spark", 1.0), ("merge", 1.0)
    ]


def test_phrase_prefix_fuzzy():
    q = p('"fast query"~1 + spark')
    assert q.phrases == [(["fast", "query"], 1)]
    assert q.must == [("spark", 1.0)]
    q2 = p("merg* | vect~1")
    assert ("should", "prefix", "merg", None, 1.0) in q2.expansions
    assert ("should", "fuzzy", "vect", 1, 1.0) in q2.expansions
    # single-word "phrase" is a plain term
    assert p('"solo"').should == [("solo", 1.0)]


def test_paren_group_and_negated_prefix():
    q = p("(merge | vector) + spark")
    assert q.groups == [[("merge", 1.0), ("vector", 1.0)]]
    assert q.must == [("spark", 1.0)]
    q2 = p("-slow* spark")
    assert ("must_not", "prefix", "slow", None, 1.0) in q2.expansions
    assert q2.should == [("spark", 1.0)]


def test_degradation_never_raises():
    """The parser contract: garbage in, SOMETHING parseable out —
    never an exception (SimpleQueryParser.java javadoc)."""
    for bad in ("bad\\", '"unbalanced spark', "+ | ( )", ")((", "~~",
                "**", "a + + b", "| | |", '-"x y"', "", None and ""):
        p(bad)  # must not raise
    assert p('"unbalanced spark').should == [
        ("unbalanced", 1.0), ("spark", 1.0)
    ]
    rng = random.Random(5)
    alphabet = string.ascii_lowercase + '+|-*~"()\\ '
    for _ in range(500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        p(s)  # never raises
