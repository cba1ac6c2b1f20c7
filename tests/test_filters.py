"""TokenFilter analogs (analysis/filters.py) — unit checks.

Reference: analysis/core/StopFilter.java, shingle/ShingleFilter.java,
ngram/NGramTokenFilter.java, ngram/EdgeNGramTokenFilter.java,
synonym/SynonymGraphFilter.java, miscellaneous/ASCIIFoldingFilter.java,
miscellaneous/LengthFilter.java.
"""

from pyspark.sql import functions as F

from lucene_solr_spark.analysis.filters import (
    ascii_fold_filter,
    edge_ngram_filter,
    length_filter,
    ngram_filter,
    shingle_filter,
    stop_filter,
    synonym_filter,
)


def _apply(spark, toks, fn):
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    return df.select(fn(F.col("toks")).alias("out")).collect()[0]["out"]


def test_stop_filter(spark):
    assert _apply(
        spark, ["the", "fast", "a", "query"], lambda c: stop_filter(c, ["the", "a"])
    ) == ["fast", "query"]


def test_shingle_filter(spark):
    assert _apply(spark, ["a", "b", "c"], lambda c: shingle_filter(c, 2)) == [
        "a b",
        "b c",
    ]
    assert _apply(spark, ["a", "b", "c"], lambda c: shingle_filter(c, 3)) == [
        "a b c"
    ]
    assert _apply(spark, ["a"], lambda c: shingle_filter(c, 2)) == []


def test_ngram_filters(spark):
    assert _apply(spark, ["abcd"], lambda c: ngram_filter(c, 3)) == ["abc", "bcd"]
    assert _apply(spark, ["ab"], lambda c: ngram_filter(c, 3)) == []
    assert _apply(
        spark, ["abcd"], lambda c: edge_ngram_filter(c, 1, 3)
    ) == ["a", "ab", "abc"]
    assert _apply(spark, ["ab"], lambda c: edge_ngram_filter(c, 1, 3)) == [
        "a",
        "ab",
    ]


def test_synonym_and_fold(spark):
    assert _apply(
        spark, ["fast", "rapid"], lambda c: synonym_filter(c, {"rapid": "fast"})
    ) == ["fast", "fast"]
    assert _apply(spark, ["café", "naïve"], ascii_fold_filter) == [
        "cafe",
        "naive",
    ]


def test_length_filter(spark):
    assert _apply(
        spark, ["a", "abc", "abcdef"], lambda c: length_filter(c, 2, 5)
    ) == ["abc"]


def test_damerau_levenshtein_counts_transposition_once(spark):
    """FuzzyQuery default metric: 'jion'->'join' is ONE edit (adjacent
    transposition); classic Levenshtein says two."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.functions.editdist import (
        damerau_levenshtein, dl_distance_py,
    )

    assert dl_distance_py("jion", "join") == 1
    assert dl_distance_py("abc", "abc") == 0
    assert dl_distance_py("", "abc") == 3
    assert dl_distance_py("ca", "abc") == 3  # restricted-DL (OSA) value
    df = spark.createDataFrame(
        [("join",), ("joint",), ("coin",)], "term string"
    ).select(
        "term",
        damerau_levenshtein(F.col("term"), "jion").alias("dl"),
        F.levenshtein(F.col("term"), F.lit("jion")).alias("lev"),
    )
    got = {r["term"]: (r["dl"], r["lev"]) for r in df.collect()}
    assert got["join"] == (1, 2)
    assert got["joint"][0] == 2
