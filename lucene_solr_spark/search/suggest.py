"""Suggest / spellcheck over the term dictionary.

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

Scale shape: both are filters + top-k over the dictionary table — at
100 TB the dictionary is orders of magnitude smaller than postings, the
prefix filter is pushdown-able, and the result is a
TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

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
