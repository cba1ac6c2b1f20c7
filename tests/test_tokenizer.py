"""Tokenizer golden cases (pinned StandardAnalyzer-subset semantics)."""

from lucene_solr_spark.analysis.tokenizer import (
    MAX_TOKEN_LENGTH,
    token_count,
    tokenize,
    tokenize_with_positions,
)


def test_basic_lowercase():
    assert tokenize("Hello World") == ["hello", "world"]


def test_alnum_mix():
    assert tokenize("abc 4221b x9y") == ["abc", "4221b", "x9y"]


def test_camelcase_single_token():
    assert tokenize("camelCase PowerShot") == ["camelcase", "powershot"]


def test_hyphen_splits():
    assert tokenize("hyphen-ated") == ["hyphen", "ated"]


def test_midnum_decimal():
    assert tokenize("pi is 3.14, ok") == ["pi", "is", "3.14", "ok"]


def test_midletter_apostrophe():
    assert tokenize("can't stop") == ["can't", "stop"]


def test_trailing_punct_dropped():
    assert tokenize("end. stop!") == ["end", "stop"]


def test_underscore_extendnumlet():
    assert tokenize("foo_bar baz") == ["foo_bar", "baz"]


def test_unicode_accents():
    assert tokenize("Café au lait") == ["café", "au", "lait"]


def test_han_single_char_tokens():
    assert tokenize("日本語") == ["日", "本", "語"]


def test_katakana_run():
    assert tokenize("テスト abc") == ["テスト", "abc"]


def test_hangul_run():
    assert tokenize("한국어 test") == ["한국어", "test"]


def test_emoji_token():
    assert tokenize("hi 😀 there") == ["hi", "😀", "there"]


def test_empty_and_none():
    assert tokenize("") == []
    assert token_count("") == 0


def test_max_token_length_skip():
    long_tok = "x" * (MAX_TOKEN_LENGTH + 45)
    toks = tokenize(f"{long_tok} after")
    assert toks == ["after"]
    # skipped token still consumes a position
    assert tokenize_with_positions(f"{long_tok} after") == [("after", 1)]
    assert token_count(f"{long_tok} after") == 1


def test_positions():
    assert tokenize_with_positions("a b a") == [("a", 0), ("b", 1), ("a", 2)]


def test_duplicates_kept():
    assert tokenize("x x x") == ["x", "x", "x"]


def test_jvm_tokenizer_matches_python(spark):
    """The production JVM-regex tokenizer must be token-for-token equal
    to this module's Python reference implementation over the fixture
    corpus (incl. CJK, emoji, case-folding edges)."""
    from lucene_solr_spark import fixtures
    from lucene_solr_spark.analysis.tokenizer import tokenize
    from lucene_solr_spark.index.builder import standard_tokens

    texts = fixtures.make_transcripts(n_convs=100)["text"].tolist() + [
        "İstanbul ẞtraße MixedCASE ß",
        "can't 3.14 a,b 'quote' x" + "y" * 300 + " tail",
        "日本語テスト 한글 ひらがな 😀🎉",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["t"] for r in df.select(standard_tokens("text").alias("t")).collect()]
    for t, g in zip(texts, got):
        assert g == tokenize(t), repr(t[:80])
