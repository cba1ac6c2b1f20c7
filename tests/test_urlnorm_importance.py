"""URL canonicalization / dedup + DSIR importance-weight operators."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators import urlnorm as un
from lucene_solr_spark.operators.importance import importance_weights


def _canon(spark, url):
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(un.url_canonicalize(F.col("url")).alias("c"))
        .collect()[0]["c"]
    )


@pytest.mark.parametrize("raw,want", [
    ("HTTP://WWW.Example.COM:80/a//b/?utm_source=x&b=2&a=1#frag",
     "http://example.com/a/b?a=1&b=2"),
    ("http://example.com/a/b?a=1&b=2", "http://example.com/a/b?a=1&b=2"),
    ("https://Sub.Site.ORG:443/path/", "https://sub.site.org/path"),
    ("sub.site.org/path", "http://sub.site.org/path"),       # scheme default
    ("https://x.io:8443/p", "https://x.io:8443/p"),          # non-default port kept
    ("http://a.b/?fbclid=1&gclid=2", "http://a.b"),          # tracking-only query dropped
    ("  http://a.b/c  ", "http://a.b/c"),                    # trimmed
    ("http://a.b", "http://a.b"),
])
def test_url_canonicalize(spark, raw, want):
    assert _canon(spark, raw) == want


def test_url_host_and_domain(spark):
    df = spark.createDataFrame(
        [("HTTP://WWW.News.Example.CO:80/x",)], "url string"
    )
    r = df.select(
        un.url_host(F.col("url")).alias("h"),
        un.registered_domain(F.col("url")).alias("d"),
    ).collect()[0]
    assert r["h"] == "news.example.co"
    assert r["d"] == "example.co"


def test_url_dedup_groups(spark):
    rows = [
        (0, "HTTP://WWW.E.COM:80/p?utm_source=1&a=1"),
        (1, "http://e.com/p?a=1"),
        (2, "http://other.com/q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r.asDict() for r in un.url_dedup(df).collect()}
    assert out[0]["rep_id"] == 0 and out[0]["is_dup"] == 0
    assert out[1]["rep_id"] == 0 and out[1]["is_dup"] == 1
    assert out[1]["group_size"] == 2
    assert out[2]["group_size"] == 1


def test_importance_weights_direction(spark):
    # target docs are all-'x'; raw background mixes in 'y' — docs made
    # of 'x' must outrank docs made of 'y'
    rows = [(i, "x x x" if i % 2 == 0 else "y y y") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in importance_weights(
            df, F.col("doc_id") % 2 == 0, keep_frac=0.5
        ).collect()
    }
    x_li = out[0]["log_importance"]
    y_li = out[1]["log_importance"]
    assert x_li > 0 > y_li
    # hand-check the add-k math: vocab=2, t_raw=24, t_tgt=12
    # p_t(x) = (12+.5)/(12+1); p_r(x) = (12+.5)/(24+1)
    want = round(3 * round(math.log(((12.5) / 13) / (12.5 / 25)), 12), 6)
    assert x_li == pytest.approx(want, abs=1e-6)
    # deterministic top-half keep = the x docs
    assert all(out[i]["imp_keep"] == 1 for i in range(0, 8, 2))
    assert all(out[i]["imp_keep"] == 0 for i in range(1, 8, 2))


def test_importance_all_docs_present(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "")], "doc_id long, text string"
    )
    out = importance_weights(df, F.lit(True)).collect()
    assert {r["doc_id"] for r in out} == {0, 1}
    empty = [r for r in out if r["doc_id"] == 1][0]
    assert empty["n_toks"] == 0 and empty["log_importance"] == 0.0


def test_benchmark_contamination(spark):
    from lucene_solr_spark.operators.dedup import benchmark_contamination

    rows = [
        (0, "a b c d e f g"),          # shares the bench doc's prefix
        (1, "x y z w v u t"),          # disjoint
        (2, "a b c d e"),              # exactly one shingle, contaminated
        (3, "short doc"),              # < 5 tokens -> 0 shingles
        (4, "a b c d e f g h i"),      # the "benchmark" doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = df.filter("doc_id = 4")
    out = {
        r["doc_id"]: r
        for r in benchmark_contamination(df, bench).collect()
    }
    assert out[4]["contam_frac"] == 1.0  # self-overlap
    assert out[3]["n_ngrams"] == 0 and out[3]["contam_frac"] == 0.0
    assert out[1]["n_contam"] == 0
    assert out[2]["n_ngrams"] == 1 and out[2]["n_contam"] == 1
    assert out[0]["n_contam"] == 3  # 'a b c d e','b c d e f','c d e f g'
    assert out[0]["is_contaminated"] == 1
    assert len(out) == 5
