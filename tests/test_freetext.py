"""FreeTextSuggester analog: stupid-backoff semantics on a tiny corpus.

Reference behaviors pinned (lucene/suggest/.../analyzing/
FreeTextSuggester.java): highest-order model first; ALPHA=0.4 backoff
per order; per-completion dedup keeps the highest order; trailing
space = predict the next token; score = backoff * cnt / contextCount.
"""

import pytest

from lucene_solr_spark.search.freetext import (
    ALPHA,
    _backoffs,
    build_freetext_model,
    freetext_lookup,
)

CORPUS = [
    "foo bar baz",
    "foo bar baz",
    "foo bar blue",
    "bar boo",
]


@pytest.fixture(scope="module")
def model(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text: string")
    return build_freetext_model(df, grams=3).cache()


def test_model_counts(model):
    rows = {
        (r.ord, r.context, r.last): r.cnt for r in model.collect()
    }
    assert rows[(3, "foo bar", "baz")] == 2
    assert rows[(3, "foo bar", "blue")] == 1
    assert rows[(2, "bar", "baz")] == 2
    assert rows[(1, "", "bar")] == 4
    assert rows[(1, "", "foo")] == 3


def test_trigram_first_with_backoff(model):
    out = freetext_lookup(model, "foo bar b", grams=3, num=10).collect()
    got = {r.completion: r.score for r in out}
    # trigram completions at backoff 1.0: ctx count('foo bar') = 3
    assert got["foo bar baz"] == pytest.approx(2 / 3, abs=1e-9)
    assert got["foo bar blue"] == pytest.approx(1 / 3, abs=1e-9)
    # 'boo' only exists in the bigram model for ctx 'bar' (cnt 1 of 4
    # 'bar'-context bigrams... context count = count of unigram 'bar'=4)
    assert got["bar boo"] == pytest.approx(ALPHA * 1 / 4, abs=1e-9)
    # dedup: 'baz'/'blue' do NOT reappear from lower orders
    assert len([c for c in got if c.endswith("baz")]) == 1
    # ranked by score desc
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_trailing_space_predicts_next(model):
    out = freetext_lookup(model, "foo bar ", grams=3, num=10).collect()
    # empty fragment: all continuations of 'foo bar'
    comps = [r.completion for r in out]
    assert "foo bar baz" in comps and "foo bar blue" in comps


def test_short_context_skips_high_orders(model):
    # single-token context → bigram is the highest attempted order,
    # at backoff 1.0 (orders the input can't fill are skipped WITHOUT
    # an ALPHA penalty, FreeTextSuggester.java:517-521)
    out = freetext_lookup(model, "bar b", grams=3, num=10).collect()
    got = {r.completion: r.score for r in out}
    assert got["bar baz"] == pytest.approx(2 / 4, abs=1e-9)
    assert got["bar boo"] == pytest.approx(1 / 4, abs=1e-9)


def test_backoff_constants():
    assert _backoffs(3) == [1.0, 0.4, 0.4 * 0.4]


def test_blended_infix_hand_computed(spark):
    """BlendedInfixSuggester semantics pinned by hand-computed values
    (independent of the gate's mirrored oracle): POSITION_LINEAR
    coefficient 1-0.10*pos over the FIRST matching token, small
    weights pre-scaled x10 (BlendedInfixSuggester.java:62,230,315)."""
    from lucene_solr_spark.search.suggest import blended_infix_suggest

    sugg = spark.createDataFrame(
        [
            ("star wars", "star wars", 12),   # match at pos 0
            ("the star", "the star", 12),     # match at pos 1
            ("a war story", "a war story", 5),  # no 'star*' match
            ("dark star rising", "dark star rising", 4),  # pos 1, small w
        ],
        "key: string, surface: string, weight: long",
    )
    out = {r.key: r for r in blended_infix_suggest(sugg, "star", 10).collect()}
    assert "a war story" not in out
    # weight 12 >= 10: no pre-scale. pos 0 -> coef 1.0; pos 1 -> 0.9
    assert out["star wars"].score == pytest.approx(12.0)
    assert out["the star"].score == pytest.approx(12 * 0.9)
    # weight 4 < 10: pre-scaled x10 -> 40 * 0.9 = 36
    assert out["dark star rising"].score == pytest.approx(36.0)
    assert out["dark star rising"].position == 1
