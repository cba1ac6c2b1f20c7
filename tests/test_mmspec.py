"""Solr mm-spec parser vs SolrPluginUtils.calculateMinShouldMatch.

The expectations replicate the Solr reference guide's dismax `mm`
examples and TestSolrPluginUtils.testMinShouldMatchCalculator cases
(solr/core/src/test/org/apache/solr/util/SolrPluginUtilsTest.java).
"""

import pytest

from lucene_solr_spark.search.mmspec import calculate_min_should_match as mm


def test_absolute():
    assert mm(5, "3") == 3
    assert mm(2, "3") == 2          # clamped to clause count
    assert mm(5, "0") == 0
    assert mm(5, "5") == 5


def test_negative_absolute():
    assert mm(5, "-2") == 3
    assert mm(2, "-3") == 0         # clamped at zero
    assert mm(5, "-0") == 0        # parses as integer 0, not negative


def test_percent():
    assert mm(4, "75%") == 3
    assert mm(5, "75%") == 3        # int(3.75) truncates
    assert mm(10, "50%") == 5
    assert mm(3, "101%") == 3       # clamped
    assert mm(5, "0%") == 0


def test_negative_percent():
    assert mm(5, "-25%") == 4       # 5 + int(-1.25) = 5 - 1
    assert mm(4, "-25%") == 3
    assert mm(10, "-50%") == 5


def test_conditional():
    # "2<-25%": <=2 clauses -> all required, else all but 25%
    assert mm(1, "2<-25%") == 1
    assert mm(2, "2<-25%") == 2
    assert mm(3, "2<-25%") == 3     # 3 + int(-0.75) = 3
    assert mm(5, "2<-25%") == 4
    assert mm(100, "2<-25%") == 75


def test_multiple_conditionals():
    # Solr ref guide: "2<-25% 9<-3" — <=2 all, 3..9 all-but-25%,
    # >9 all-but-3 (the early return yields the RUNNING result)
    spec = "2<-25% 9<-3"
    assert mm(2, spec) == 2
    assert mm(5, spec) == 4         # from -25%, returned at 9-bound
    assert mm(9, spec) == 7         # int(9*-0.25) = -2 -> 9-2
    assert mm(10, spec) == 7
    assert mm(20, spec) == 17


def test_whitespace_and_invalid():
    assert mm(5, "  3  ") == 3
    with pytest.raises(ValueError):
        mm(5, "abc")


def test_whitespace_normalization():
    """Solr normalizes all whitespace before splitting conditionals."""
    assert mm(5, "2<-25%\t9<-3") == 4
    assert mm(10, "2<-25%   9<-3") == 7


def test_space_around_less_than():
    """Solr's spaceAroundLessThanPattern strips spaces around '<'
    BEFORE whitespace-splitting conditionals, so "2 < -25%" is one
    clause (SolrPluginUtils.java calculateMinShouldMatch)."""
    assert mm(5, "2 < -25%") == mm(5, "2<-25%")
    assert mm(9, "2 <-25% 9< -3") == mm(9, "2<-25% 9<-3")
    assert mm(3, " 2 < 2 ") == 2
