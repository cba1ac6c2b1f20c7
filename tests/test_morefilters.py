"""TokenFilter family completion — reference JUnit vectors replayed.

Every vector below is lifted verbatim from the reference test suite
(lucene/analysis/common/src/test/.../Test*.java, file noted per test).
"""

import pytest

from lucene_solr_spark.analysis.morefilters import (
    MORE_FILTERS, apostrophe_filter, capitalization_filter, cjk_width,
    codepoint_count, decimal_digit, delimited_term_frequency,
    elision_filter, fingerprint_filter, hyphenated_words, keep_word,
    limit_token_count, protected_term, reverse_string,
    scandinavian_folding, scandinavian_normalization, truncate_token,
    turkish_lowercase, upper_case,
)

MAXI = 2 ** 31 - 1


# TestScandinavianFoldingFilter
@pytest.mark.parametrize("inp,out", [
    ("aeäaeeea", "aaaeea"), ("aeäaeeeae", "aaaeea"), ("aeaeeeae", "aaeea"),
    ("bøen", "boen"), ("åene", "aene"),
    ("blåbærsyltetøj", "blabarsyltetoj"),
    ("blaabaarsyltetoej", "blabarsyltetoj"),
    ("blåbärsyltetöj", "blabarsyltetoj"),
    ("raksmorgas", "raksmorgas"), ("räksmörgås", "raksmorgas"),
    ("ræksmørgås", "raksmorgas"), ("raeksmoergaas", "raksmorgas"),
    ("ræksmörgaos", "raksmorgas"),
    ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
    ("å", "a"), ("aa", "a"), ("aA", "a"), ("ao", "a"), ("aO", "a"),
    ("AA", "A"), ("Aa", "A"), ("Ao", "A"), ("AO", "A"),
    ("æ", "a"), ("ä", "a"), ("Æ", "A"), ("Ä", "A"),
])
def test_scandinavian_folding_junit(inp, out):
    assert scandinavian_folding([inp]) == [out]


# TestScandinavianNormalizationFilter
@pytest.mark.parametrize("inp,out", [
    ("aeäaeeea", "æææeea"), ("aeäaeeeae", "æææeeæ"), ("aeaeeeae", "ææeeæ"),
    ("bøen", "bøen"), ("bOEen", "bØen"), ("åene", "åene"),
    ("blåbærsyltetøj", "blåbærsyltetøj"),
    ("blaabaersyltetöj", "blåbærsyltetøj"),
    ("räksmörgås", "ræksmørgås"), ("raeksmörgaos", "ræksmørgås"),
    ("raeksmörgaas", "ræksmørgås"), ("raeksmoergås", "ræksmørgås"),
    ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
    ("å", "å"), ("aa", "å"), ("aA", "å"), ("ao", "å"), ("aO", "å"),
    ("AA", "Å"), ("Aa", "Å"), ("Ao", "Å"), ("AO", "Å"),
])
def test_scandinavian_normalization_junit(inp, out):
    assert scandinavian_normalization([inp]) == [out]


# TestTurkishLowerCaseFilter
def test_turkish_lowercase_junit():
    assert turkish_lowercase(["İSTANBUL", "İZMİR", "ISPARTA"]) == [
        "istanbul", "izmir", "ısparta"]
    # decomposed I + combining dot above folds to plain i
    assert turkish_lowercase(["İSTANBUL"]) == ["istanbul"]
    assert turkish_lowercase([""]) == [""]


# TestCJKWidthFilter
def test_cjk_width_junit():
    assert cjk_width(["Ｔｅｓｔ", "１２３４"]) == ["Test", "1234"]
    assert cjk_width(["ｶﾀｶﾅ"]) == ["カタカナ"]
    assert cjk_width(["ｳﾞｨｯﾂ"]) == ["ヴィッツ"]
    assert cjk_width(["ﾊﾟﾅｿﾆｯｸ"]) == ["パナソニック"]
    assert cjk_width([""]) == [""]


# TestElision: "l'embrouille" / "M'enfin" stripped, "O'brian" kept
def test_elision_junit():
    assert elision_filter(["l'embrouille", "O'brian", "M'enfin"]) == [
        "embrouille", "O'brian", "enfin"]


def test_apostrophe_filter():
    # tr/ApostropheFilter: strip the suffix from the first apostrophe
    assert apostrophe_filter(["Türkiye'de", "2003'te", "plain"]) == [
        "Türkiye", "2003", "plain"]


# TestDecimalDigitFilter
def test_decimal_digit_junit():
    assert decimal_digit(["١٢٣٤"]) == ["1234"]
    assert decimal_digit(["৭০৬"]) == ["706"]
    assert decimal_digit(["abc123"]) == ["abc123"]


# TestCapitalizationFilter.testCapitalization (params inline)
def test_capitalization_junit():
    keep = ["and", "the", "it", "BIG"]

    def cap(t, **kw):
        return capitalization_filter([t], keep=keep, **kw)[0]

    assert cap("kiTTEN") == "Kitten"
    assert cap("and") == "And"
    assert cap("AnD") == "And"
    assert cap("AnD", force_first_letter=False) == "And"
    assert cap("big") == "Big"
    assert cap("BIG") == "BIG"
    assert cap("Hello thEre my Name is Ryan") == "Hello there my name is ryan"
    assert capitalization_filter(
        ["Hello", "thEre", "my", "Name", "is", "Ryan"],
        only_first_word=False, keep=keep) == [
        "Hello", "There", "My", "Name", "Is", "Ryan"]
    assert capitalization_filter(
        ["Hello", "thEre", "my", "Name", "is", "Ryan"],
        only_first_word=False, keep=keep, min_word_length=3) == [
        "Hello", "There", "my", "Name", "is", "Ryan"]
    assert cap("McKinley") == "Mckinley"
    assert cap("McKinley", ok_prefix=["McK"]) == "McKinley"
    assert capitalization_filter(
        ["1st", "2nd", "third"], only_first_word=False, keep=keep,
        force_first_letter=False) == ["1st", "2nd", "Third"]
    assert capitalization_filter(
        ["the The the"], only_first_word=False, keep=keep) == ["The The the"]


# TestFingerprintFilter
def test_fingerprint_junit():
    assert fingerprint_filter(["B", "A", "B", "E"]) == ["A B E"]
    assert fingerprint_filter(["B2", "B2"]) == ["B2"]
    assert fingerprint_filter(
        ["B2", "A1", "C3", "D4", "E5", "F6", "G7", "H1"],
        max_output_token_size=4) == []
    assert fingerprint_filter(["B2", "A1", "C3", "B2"],
                              separator="_") == ["A1_B2_C3"]
    assert fingerprint_filter(["A1"]) == ["A1"]
    assert fingerprint_filter([]) == []


# TestHyphenatedWordsFilter
def test_hyphenated_words_junit():
    toks = "ecologi- cal devel- op compre- hensive-hands-on and ecologi- cal"
    assert hyphenated_words(toks.split(" ")) == [
        "ecological", "develop", "comprehensive-hands-on", "and",
        "ecological"]
    toks2 = "ecologi- cal devel- op compre- hensive-hands-on and ecology-"
    assert hyphenated_words(toks2.split(" ")) == [
        "ecological", "develop", "comprehensive-hands-on", "and",
        "ecology-"]
    assert hyphenated_words(["abc-", "def", "geh", "1234-", "5678-"]) == [
        "abcdef", "geh", "12345678-"]


def test_small_filters():
    assert keep_word(["a", "b", "c"], ["b"]) == ["b"]
    assert keep_word(["A", "b"], ["a"], ignore_case=True) == ["A"]
    assert truncate_token(["abcdefg", "ab"], 3) == ["abc", "ab"]
    assert codepoint_count(["a", "ab", "abc"], 2, 2) == ["ab"]
    assert codepoint_count(["😀"], 1, 1) == ["😀"]
    assert limit_token_count(["a", "b", "c"], 2) == ["a", "b"]
    assert reverse_string(["abc"]) == ["cba"]
    assert upper_case(["straße"]) == ["STRAßE"]  # ß keeps (single-cp)
    assert protected_term(["foo", "bar"], ["foo"],
                          lambda ts: upper_case(ts)) == ["foo", "BAR"]
    assert delimited_term_frequency(["sol|5", "r"]) == [("sol", 5), ("r", 1)]


def test_udf_dispatch(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.morefilters import more_filter_udf

    rows = [("cjk_width", ["ﾊﾟﾅｿﾆｯｸ"]),
            ("scandinavian_folding", ["räksmörgås"]),
            ("turkish_lowercase", ["İSTANBUL"]),
            ("fingerprint", ["B", "A", "B", "E"])]
    df = spark.createDataFrame(rows, "name string, toks array<string>")
    out = {r.name: r.res for r in df.select(
        "name", more_filter_udf(F.col("name"), F.col("toks")).alias("res")
    ).collect()}
    assert out["cjk_width"] == ["パナソニック"]
    assert out["scandinavian_folding"] == ["raksmorgas"]
    assert out["turkish_lowercase"] == ["istanbul"]
    assert out["fingerprint"] == ["A B E"]


# TestCJKBigramFilter (tokens produced by the StandardTokenizer rules:
# han/hiragana per char)
def test_cjk_bigram_junit():
    from lucene_solr_spark.analysis.morefilters import cjk_bigram

    toks = list("多くの学生が試験に落ちた")  # per-char han/hiragana tokens
    assert cjk_bigram(toks) == [
        "多く", "くの", "の学", "学生", "生が", "が試", "試験", "験に",
        "に落", "落ち", "ちた"]
    # HAN only: hiragana passes through, han pairs/singles
    assert cjk_bigram(toks, hiragana=False, katakana=False,
                      hangul=False) == [
        "多", "く", "の", "学生", "が", "試験", "に", "落", "ち", "た"]
    # unigrams + bigrams, HAN only
    assert cjk_bigram(toks, hiragana=False, katakana=False, hangul=False,
                      output_unigrams=True) == [
        "多", "く", "の", "学", "学生", "生", "が", "試", "試験", "験",
        "に", "落", "ち", "た"]
    # katakana runs bigram across the run's characters
    assert cjk_bigram(["カタカナ"]) == ["カタ", "タカ", "カナ"]
    # non-CJK tokens flush the buffer and pass through
    assert cjk_bigram(["学", "abc", "生"]) == ["学", "abc", "生"]
