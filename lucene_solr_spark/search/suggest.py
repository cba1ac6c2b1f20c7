"""Suggest / spellcheck over the term dictionary + analyzed suggesters.

Re-expresses the reference suggest module as dictionary-table queries:

- prefix suggester — terms completing a prefix, weighted by document
  frequency (reference lucene/suggest/src/java/org/apache/lucene/search/
  suggest/analyzing/AnalyzingSuggester.java javadoc: "completions …
  returned by weight"; Solr wires df as the default weight via
  solr/core/src/java/org/apache/solr/spelling/suggest/Suggester.java).
- direct spellcheck — candidate terms within max_edits Levenshtein
  distance, ranked by (distance asc, df desc) (reference
  lucene/suggest/src/java/org/apache/lucene/search/spell/
  DirectSpellChecker.java:42-60 — default maxEdits=2, scores by edit
  distance then docFreq).
- analyzing suggester — full multi-token suggestions keyed by their
  ANALYZED form; the query is analyzed with the same chain before
  prefix-matching, so "Key  AGG!" completes "key agg row scan …"
  (reference .../suggest/analyzing/AnalyzingSuggester.java:59-107:
  "analyzes the input text … and then suggests matching query terms",
  weight-ordered, surface forms deduped keeping the max weight).
- fuzzy suggester — analyzing suggester that tolerates typos in the
  typed prefix (reference .../suggest/analyzing/FuzzySuggester.java:
  38-77 defaults: maxEdits=1, nonFuzzyPrefix=1 chars matched exactly,
  minFuzzyLength=3 below which matching is exact).

Scale shape: all are filters + top-k over a dictionary/suggestion table
— at 100 TB that table is orders of magnitude smaller than postings,
the prefix filter is pushdown-able, and the result is a
TakeOrderedAndProject (no full sort). The fuzzy path's edit-distance
filter runs on the length-bounded typed prefix only, JVM-side.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest_prefix(tables, prefix: str, k: int = 10) -> DataFrame:
    """(term, weight) — top-k completions of prefix by df desc, term asc."""
    return (
        tables.dictionary.filter(F.col("term").startswith(prefix))
        .select("term", F.col("df").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(k)
    )


def spellcheck(
    tables, word: str, max_edits: int = 2, k: int = 5
) -> DataFrame:
    """(term, distance, df) — nearest dictionary terms to a (possibly
    misspelled) word, within max_edits; excludes the exact word itself
    (DirectSpellChecker suggests only alternatives)."""
    return (
        tables.dictionary.filter(
            (F.length("term") >= F.lit(len(word) - max_edits))
            & (F.length("term") <= F.lit(len(word) + max_edits))
        )
        .withColumn("distance", F.levenshtein(F.col("term"), F.lit(word)))
        .filter((F.col("distance") <= max_edits) & (F.col("distance") > 0))
        .select("term", "distance", "df")
        .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def analyze_key(s: str) -> str:
    """The suggester's query-side analysis chain: lowercase, keep
    alnum runs, single-space-join — identical to the simple analyzer
    used on the index side (AnalyzingSuggester analyzes the lookup key
    with the same analyzer as the stored suggestions)."""
    return " ".join(re.findall(r"[a-z0-9]+", s.lower()))


def build_suggestions(
    docs: DataFrame,
    text_col: str = "text",
    n_tokens: int = 4,
) -> DataFrame:
    """(key, surface, weight) suggestion table from a document corpus:
    surface = the doc's first ``n_tokens`` analyzed tokens joined (a
    title-ish completion target), key = its analyzed form, weight = the
    max doc length over docs sharing the surface (AnalyzingSuggester
    dedups identical surface forms keeping the highest weight —
    reference .../analyzing/AnalyzingSuggester.java:88-96 "If true,
    the returned results … only return unique surface forms").

    One narrow scan + one hash-agg on the (short) surface key — scales.
    """
    from ..index.builder import simple_tokens

    toks = simple_tokens(text_col)
    surface = F.array_join(F.slice(toks, 1, n_tokens), " ")
    return (
        docs.select(surface.alias("surface"), F.size(toks).alias("dl"))
        .filter(F.col("surface") != "")
        .groupBy("surface")
        .agg(F.max("dl").alias("weight"))
        .withColumn("key", F.col("surface"))  # simple chain: key==surface
        .select("key", "surface", "weight")
    )


def analyzing_suggest(
    suggestions: DataFrame, query: str, k: int = 10
) -> DataFrame:
    """(key, surface, weight) — top-k suggestions whose ANALYZED key
    completes the analyzed query, by weight desc then key asc.
    (AnalyzingSuggester.lookup: analyzed-prefix automaton intersect,
    results by weight.)"""
    q = analyze_key(query)
    return (
        suggestions.filter(F.col("key").startswith(q))
        .orderBy(F.desc("weight"), F.asc("key"))
        .limit(k)
    )


def fuzzy_suggest(
    suggestions: DataFrame,
    query: str,
    k: int = 10,
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
) -> DataFrame:
    """(key, surface, weight, distance) — analyzing suggester tolerant
    of typos in the typed prefix (FuzzySuggester.java:38-77 defaults:
    maxEdits=1, nonFuzzyPrefix=1, minFuzzyLength=3).

    Semantics: the first ``non_fuzzy_prefix`` chars must match exactly;
    the key's first len(query) chars must be within ``max_edits``
    Levenshtein edits of the analyzed query; queries shorter than
    ``min_fuzzy_length`` fall back to exact prefix match. Deviation
    from the reference noted: Lucene counts a transposition as one edit
    (LevenshteinAutomata with transpositions=true); plain Levenshtein
    counts it as two — documented, and bounded in the same way."""
    q = analyze_key(query)
    if len(q) < min_fuzzy_length:
        cand = suggestions.filter(F.col("key").startswith(q)).withColumn(
            "distance", F.lit(0)
        )
    else:
        typed = F.substring("key", 1, len(q))
        cand = (
            suggestions.filter(
                F.substring("key", 1, non_fuzzy_prefix)
                == q[:non_fuzzy_prefix]
            )
            .withColumn("distance", F.levenshtein(typed, F.lit(q)))
            .filter(F.col("distance") <= max_edits)
        )
    return (
        cand.select("key", "surface", "weight", "distance")
        .orderBy(F.desc("weight"), F.asc("key"))
        .limit(k)
    )


def word_breaks(
    tables,
    words,
    min_break_length: int = 2,
    min_freq: int = 1,
    k: int | None = 20,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordBreaks, single split (reference
    lucene/suggest/src/java/org/apache/lucene/search/spell/
    WordBreakSpellChecker.java:73-107 — maxChanges=1): every split of
    each input word into (left, right) where BOTH parts are dictionary
    terms with df >= min_freq and length >= min_break_length, ranked by
    summed frequency desc (BreakSuggestionSortMethod
    NUM_CHANGES_THEN_SUMMED_FREQUENCY with a single change count).

    → (input, lft, rgt, df_left, df_right, freq_sum). Plan: the split
    candidates are a tiny broadcast side; the dictionary (the big side
    at scale) is probed twice by equi-join — prefix/term pushdown, no
    corpus scan."""
    spark = tables.dictionary.sparkSession
    pairs = [
        (w, w[:i], w[i:])
        for w in words
        for i in range(min_break_length, len(w) - min_break_length + 1)
    ]
    if not pairs:
        return spark.createDataFrame(
            [], "input string, lft string, rgt string, df_left long, "
                "df_right long, freq_sum long"
        )
    cand = spark.createDataFrame(
        pairs, "input string, lft string, rgt string"
    )
    d = tables.dictionary.filter(F.col("df") >= min_freq).select("term", "df")
    out = (
        d.withColumnRenamed("term", "lft")
        .withColumnRenamed("df", "df_left")
        .join(F.broadcast(cand), "lft")
        .join(
            d.withColumnRenamed("term", "rgt").withColumnRenamed(
                "df", "df_right"
            ),
            "rgt",
        )
        .select(
            "input", "lft", "rgt", "df_left", "df_right",
            (F.col("df_left") + F.col("df_right")).alias("freq_sum"),
        )
        .orderBy(F.desc("freq_sum"), F.asc("input"), F.asc("lft"))
    )
    return out.limit(k) if k is not None else out


def word_combinations(
    tables,
    terms,
    max_combine_length: int = 20,
    min_freq: int = 1,
    k: int | None = 10,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordCombinations (reference
    WordBreakSpellChecker.java:109-145): adjacent query terms whose
    concatenation is a dictionary term with df >= min_freq and length
    <= max_combine_length, ranked by df desc.

    → (w1, w2, combined, df)."""
    spark = tables.dictionary.sparkSession
    pairs = [
        (terms[i], terms[i + 1], terms[i] + terms[i + 1])
        for i in range(len(terms) - 1)
        if len(terms[i] + terms[i + 1]) <= max_combine_length
    ]
    if not pairs:
        return spark.createDataFrame(
            [], "w1 string, w2 string, combined string, df long"
        )
    cand = spark.createDataFrame(pairs, "w1 string, w2 string, combined string")
    out = (
        tables.dictionary.filter(F.col("df") >= min_freq)
        .withColumnRenamed("term", "combined")
        .join(F.broadcast(cand), "combined")
        .select("w1", "w2", "combined", "df")
        .orderBy(F.desc("df"), F.asc("combined"))
    )
    return out.limit(k) if k is not None else out


def build_suggestions_with_contexts(
    docs: DataFrame,
    text_col: str = "text",
    context_col: str = "lang",
    n_tokens: int = 4,
) -> DataFrame:
    """(key, surface, weight, contexts) suggestion table: like
    build_suggestions but each suggestion carries the SET of context
    values of the docs it came from (the suggester's contexts field —
    reference lucene/suggest/.../document/SuggestField.java,
    ContextSuggestField.java)."""
    from ..index.builder import simple_tokens

    toks = simple_tokens(text_col)
    surface = F.array_join(F.slice(toks, 1, n_tokens), " ")
    return (
        docs.select(
            surface.alias("surface"),
            F.size(toks).alias("dl"),
            F.col(context_col).alias("ctx"),
        )
        .filter(F.col("surface") != "")
        .groupBy("surface")
        .agg(
            F.max("dl").alias("weight"),
            F.array_sort(F.collect_set("ctx")).alias("contexts"),
        )
        .withColumn("key", F.col("surface"))
        .select("key", "surface", "weight", "contexts")
    )


def context_suggest(
    suggestions: DataFrame, query: str, contexts, k: int = 10
) -> DataFrame:
    """ContextQuery: analyzing-suggester lookup restricted to
    suggestions carrying at least one of the given contexts (reference
    lucene/suggest/.../document/ContextQuery.java — 'completions ...
    boosted/filtered by contexts'; the filter form). Context overlap is
    arrays_overlap — a codegen predicate on the (small) suggestion
    table."""
    if not contexts:
        raise ValueError("ContextQuery needs at least one context value")
    q = analyze_key(query)
    want = F.array(*[F.lit(c) for c in contexts])
    return (
        suggestions.filter(
            F.col("key").startswith(q)
            & F.arrays_overlap(F.col("contexts"), want)
        )
        .orderBy(F.desc("weight"), F.asc("key"))
        .limit(k)
    )


def blended_infix_suggest(
    suggestions: DataFrame,
    prefix: str,
    k: int = 10,
    linear_coef: float = 0.10,
) -> DataFrame:
    """BlendedInfixSuggester (reference lucene/suggest/.../analyzing/
    BlendedInfixSuggester.java): match the typed token ANYWHERE in the
    suggestion (infix, startsWith on any token), then blend the weight
    by the FIRST matching token's position — POSITION_LINEAR default:
    coefficient = 1 − LINEAR_COEF·position (:315-317, LINEAR_COEF=0.10
    at :62), with small weights pre-scaled ×1/LINEAR_COEF so the blend
    survives integer truncation (:230-231). Scores are emitted as the
    raw double (the reference truncates to long — ordering identical).

    → (key, weight, position, score) by score desc, key asc."""
    if not prefix.isalnum():
        raise ValueError(f"prefix must be alphanumeric: {prefix!r}")
    pos = F.expr(
        "array_min(filter(transform(split(key, ' '), (t, i) -> "
        f"IF(startswith(t, '{prefix}'), i, cast(null as int))), "
        "x -> x is not null))"
    )
    w = F.col("weight").cast("double")
    w_scaled = F.when(
        (w < 1.0 / linear_coef) & (w > -1.0 / linear_coef),
        w / F.lit(linear_coef),
    ).otherwise(w)
    out = suggestions.select(
        "key",
        F.col("weight").cast("long").alias("weight"),
        pos.alias("position"),
        F.round(
            w_scaled * (F.lit(1.0) - F.lit(linear_coef) * pos), 6
        ).alias("score"),
    ).filter(F.col("position").isNotNull())
    return out.orderBy(F.desc("score"), F.asc("key")).limit(k)
