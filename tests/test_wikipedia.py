"""WikipediaTokenizer — every reference JUnit vector replayed
(lucene/analysis/common/src/test/org/apache/lucene/analysis/
wikipedia/WikipediaTokenizerTest.java)."""

import pytest

from lucene_solr_spark.analysis.wikipedia import (
    BOTH,
    TOKENS_ONLY,
    UNTOKENIZED_ONLY,
    UNTOKENIZED_TOKEN_FLAG,
    wikipedia_tokenize,
)

LINK_PHRASES = ("click [[link here again]] click "
                "[http://lucene.apache.org here again] "
                "[[Category:a b c d]]")


def test_simple():
    text = "This is a [[Category:foo]]"
    toks = wikipedia_tokenize(text)
    assert [t.term for t in toks] == ["This", "is", "a", "foo"]
    assert [t.start for t in toks] == [0, 5, 8, 21]
    assert [t.end for t in toks] == [4, 7, 9, 24]
    assert [t.type for t in toks] == [
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "c"]
    assert [t.pos_inc for t in toks] == [1, 1, 1, 1]


def test_handwritten():
    test = (
        "[[link]] This is a [[Category:foo]] Category  This is a linked "
        "[[:Category:bar none withstanding]] "
        "Category This is (parens) This is a [[link]]  This is an "
        "external URL [http://lucene.apache.org] "
        "Here is ''italics'' and ''more italics'', '''bold''' and "
        "'''''five quotes''''' "
        " This is a [[link|display info]]  This is a period.  Here is "
        "$3.25 and here is 3.50.  Here's Johnny.  "
        "==heading== ===sub head=== followed by some text  "
        "[[Category:blah| ]] "
        "''[[Category:ital_cat]]''  here is some that is ''italics "
        "[[Category:foo]] but is never closed."
        "'''same [[Category:foo]] goes for this '''''and2 "
        "[[Category:foo]] and this"
        " [http://foo.boo.com/test/test/ Test Test] "
        "[http://foo.boo.com/test/test/test.html Test Test]"
        " [http://foo.boo.com/test/test/test.html?g=b&c=d Test Test] "
        "<ref>Citation</ref> <sup>martian</sup> "
        "<span class=\"glue\">code</span>")
    toks = wikipedia_tokenize(test)
    assert [t.term for t in toks] == [
        "link", "This", "is", "a",
        "foo", "Category", "This", "is", "a", "linked", "bar", "none",
        "withstanding", "Category", "This", "is", "parens", "This",
        "is", "a", "link", "This", "is", "an", "external", "URL",
        "http://lucene.apache.org", "Here", "is", "italics", "and",
        "more", "italics", "bold", "and", "five", "quotes", "This",
        "is", "a", "link", "display", "info", "This", "is", "a",
        "period", "Here", "is", "3.25", "and", "here", "is", "3.50",
        "Here's", "Johnny", "heading", "sub", "head", "followed", "by",
        "some", "text", "blah", "ital", "cat", "here", "is", "some",
        "that", "is", "italics", "foo", "but", "is", "never", "closed",
        "same", "foo", "goes", "for", "this", "and2", "foo", "and",
        "this", "http://foo.boo.com/test/test/", "Test", "Test",
        "http://foo.boo.com/test/test/test.html", "Test", "Test",
        "http://foo.boo.com/test/test/test.html?g=b&c=d", "Test",
        "Test", "Citation", "martian", "code"]
    assert [t.type for t in toks] == [
        "il", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "c",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", "c", "c", "c", "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", "il", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "elu", "<ALPHANUM>", "<ALPHANUM>",
        "i", "<ALPHANUM>", "i", "i", "b", "<ALPHANUM>", "bi", "bi",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "il", "il", "il",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<NUM>", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<NUM>", "<APOSTROPHE>",
        "<ALPHANUM>", "h", "sh", "sh", "<ALPHANUM>", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "c", "c", "c", "<ALPHANUM>",
        "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "i",
        "c", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>",
        "b", "c", "<ALPHANUM>", "<ALPHANUM>", "<ALPHANUM>", "bi", "c",
        "<ALPHANUM>", "<ALPHANUM>", "elu", "el", "el", "elu", "el",
        "el", "elu", "el", "el", "ci", "<ALPHANUM>", "<ALPHANUM>"]


def test_link_phrases():
    toks = wikipedia_tokenize(LINK_PHRASES)
    assert [t.term for t in toks] == [
        "click", "link", "here", "again", "click",
        "http://lucene.apache.org", "here", "again", "a", "b", "c",
        "d"]
    assert [t.pos_inc for t in toks] == [1, 1, 1, 1, 1, 1, 0, 1, 1, 1,
                                         1, 1]


def test_links():
    test = ("[http://lucene.apache.org/java/docs/index.html#news here] "
            "[http://lucene.apache.org/java/docs/index.html?b=c here] "
            "[https://lucene.apache.org/java/docs/index.html?b=c here]")
    toks = wikipedia_tokenize(test)
    assert [t.term for t in toks] == [
        "http://lucene.apache.org/java/docs/index.html#news", "here",
        "http://lucene.apache.org/java/docs/index.html?b=c", "here",
        "https://lucene.apache.org/java/docs/index.html?b=c", "here"]
    assert [t.type for t in toks] == ["elu", "el"] * 3


def test_lucene1133_tokens_only_unaffected():
    untoks = {"c", "i"}
    toks = wikipedia_tokenize(LINK_PHRASES, TOKENS_ONLY, untoks)
    assert [t.term for t in toks] == [
        "click", "link", "here", "again", "click",
        "http://lucene.apache.org", "here", "again", "a", "b", "c",
        "d"]
    assert [t.pos_inc for t in toks] == [1, 1, 1, 1, 1, 1, 0, 1, 1, 1,
                                         1, 1]


UNTOK_TEST = ("[[Category:a b c d]] [[Category:e f g]] [[link here]] "
              "[[link there]] ''italics here'' something "
              "''more italics'' [[Category:h   i   j]]")


def test_lucene1133_untokenized_only():
    toks = wikipedia_tokenize(UNTOK_TEST, UNTOKENIZED_ONLY, {"c", "i"})
    assert [t.term for t in toks] == [
        "a b c d", "e f g", "link", "here", "link", "there",
        "italics here", "something", "more italics", "h   i   j"]
    assert [t.start for t in toks] == [11, 32, 42, 47, 56, 61, 71, 86,
                                       98, 124]
    assert [t.end for t in toks] == [18, 37, 46, 51, 60, 66, 83, 95,
                                     110, 133]
    assert [t.pos_inc for t in toks] == [1] * 10


def test_both():
    toks = wikipedia_tokenize(UNTOK_TEST, BOTH, {"c", "i"})
    assert [t.term for t in toks] == [
        "a b c d", "a", "b", "c", "d", "e f g", "e", "f", "g", "link",
        "here", "link", "there", "italics here", "italics", "here",
        "something", "more italics", "more", "italics", "h   i   j",
        "h", "i", "j"]
    assert [t.start for t in toks] == [
        11, 11, 13, 15, 17, 32, 32, 34, 36, 42, 47, 56, 61, 71, 71, 79,
        86, 98, 98, 103, 124, 124, 128, 132]
    assert [t.end for t in toks] == [
        18, 12, 14, 16, 18, 37, 33, 35, 37, 46, 51, 60, 66, 83, 78, 83,
        95, 110, 102, 110, 133, 125, 129, 133]
    assert [t.pos_inc for t in toks] == [
        1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 0, 1, 1,
        0, 1, 1]
    assert [t.flags for t in toks] == [
        UNTOKENIZED_TOKEN_FLAG, 0, 0, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0,
        0, 0, 0, 0, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0, 0, 0,
        UNTOKENIZED_TOKEN_FLAG, 0, 0, UNTOKENIZED_TOKEN_FLAG, 0, 0, 0]


def test_invalid_mode():
    with pytest.raises(ValueError):
        wikipedia_tokenize("x", 7)
