"""JVM fast-path parity for the default-config HTML strip.

The dispatching ``html_strip_udf`` must be bit-identical to the exact
Python machine (itself 0-mismatch vs the reference's compiled JFlex
scanner) on EVERY input — eligible rows prove the JVM chain mirrors
the scanner's common-case rules, ineligible rows prove the dispatch
routes them to the machine.  Reference:
lucene/analysis/common/src/java/org/apache/lucene/analysis/charfilter/
HTMLStripCharFilter.jflex.
"""

import random

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.charfilter import (
    HTML_FAST_INELIGIBLE_RX,
    html_strip,
    html_strip_udf,
)

FIXTURE = "lucene_solr_spark/fixtures_data/charfilter_cases.parquet"


def _compare(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    ).repartition(8)
    got = {
        r["i"]: r["o"]
        for r in df.select(
            "i", html_strip_udf(F.col("t")).alias("o")
        ).collect()
    }
    bad = []
    for i, t in enumerate(texts):
        want = None if t is None else html_strip(t)
        if got[i] != want:
            bad.append((t, want, got[i]))
    assert not bad, bad[:5]


def test_fixture_corpus_parity(spark):
    rows = (
        spark.read.parquet(FIXTURE)
        .filter(F.col("case") == "html_strip")
        .select("input_s")
        .collect()
    )
    texts = [r["input_s"] for r in rows]
    assert len(texts) > 400
    _compare(spark, texts)


# construct pool: tags (inline/block/mixed-case/self-closing/ws/attrs,
# incl. quoted attrs hiding '>'), end tags, entities fast + non-fast +
# numeric + unknown + unterminated, comments/CDATA/PI/script/style,
# bare delimiters, non-ASCII names, pushback-glue '<' sequences
_PIECES = [
    "plain text ", "words and more words ", "x", " ",
    "<p>", "</p>", "<P>", "<div>", "</div>", "<em>", "</em>",
    "<EM>", "<a>", "</a>", "<A HREF=x>", '<a href="u.html">',
    '<a href="x>y">', "<br>", "<br/>", "<br />", "</br>",
    "<img src=i.png/>", "<input type=text>", "<span class='c'>",
    "<td>", "<ul>", "<li>", "<h1>", "</h1>", "<foo>", "</foo>",
    "<foo bar=baz qux>", "<p =>", "<p=>", "<p%>", "< p>", "</ p >",
    "<3", "<>", "< >", "</>", "<<p>", "< <em>", "<p attr",
    "<namespace:tag>", "<tag-with-dash a=1>", "<ember>", "<strong>",
    "</strong>", "<tt>", "<q>", "<s>", "<u>", "<sub>", "<sup>",
    "&amp;", "&AMP;", "&lt;", "&gt;", "&quot;", "&apos;", "&nbsp;",
    "&Amp;", "&aMp;", "&unknown;", "&eacute;", "&ltri;", "&copy;",
    "&#65;", "&#x41;", "&amp", "&lt", "&", "&;", "&#",
    "<!-- comment -->", "<!--#ssi -->", "<!DOCTYPE html>",
    "<![CDATA[raw <b> text]]>", "<?xml version='1'?>",
    "<script>var x=1;</script>", "<style>.c{}</style>",
    "<SCRIPT>x</SCRIPT>", "< script>",
    '<p onclick="a>b">', "<p onload='x'>", "onclick=never a tag",
    "<taég>", "<á>", "<_под>", "héllo wörld", "中文 текст",
    "a < b and c > d", "5 > 3", "x\ny", "x\r\ny", "x\ty", "x y",
    "<p\nmultiline='y'>", "<p attr<em>", "<p attr<div>",
    # EOF-truncation pieces (only meaningful as the final piece, but
    # mid-string they exercise the pushback paths too)
    "<p", "</a", "<y", "<em", "< p", "</ p", "<p ", "<p=", "<br",
    "<", "< ", "</", "</ ", "<p attr", "<foo.bar", "<_:",
]


def test_randomized_construct_mix_parity(spark):
    rng = random.Random(20260821)
    texts = []
    for _ in range(4000):
        k = rng.randint(1, 12)
        texts.append("".join(rng.choice(_PIECES) for _ in range(k)))
    # every piece alone, too
    texts.extend(_PIECES)
    texts.append(None)
    texts.append("")
    _compare(spark, texts)


def test_clean_text_is_eligible(spark):
    """The whole point: ordinary web-ish prose (incl. simple markup
    and the common entities) must take the JVM path."""
    texts = [
        "Just a plain sentence with no markup at all.",
        "<p>Simple paragraph</p> with <em>emphasis</em> &amp; more.",
        '<div class="post"><h2>Title</h2>Body text here.</div>',
        "Tom &amp; Jerry &lt;3 &gt; everyone&nbsp;else.",
        "多语言 plain text mixed 中文",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    n_fallback = df.filter(
        F.col("t").rlike(HTML_FAST_INELIGIBLE_RX)
    ).count()
    assert n_fallback == 0
    _compare(spark, texts)


def test_rare_constructs_fall_back(spark):
    texts = [
        "<!-- c -->", "<![CDATA[x]]>", "<script>x</script>",
        "<?pi?>", "&#65;", "&eacute;", "<taég>", "<<p>x",
        '<p onclick="a>b">x',
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    n_fallback = df.filter(
        F.col("t").rlike(HTML_FAST_INELIGIBLE_RX)
    ).count()
    assert n_fallback == len(texts)
    _compare(spark, texts)
