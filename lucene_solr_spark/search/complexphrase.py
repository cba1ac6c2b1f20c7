"""ComplexPhraseQueryParser execution: multi-term subqueries inside a
quoted phrase.

Reference: lucene/queryparser/.../complexPhrase/
ComplexPhraseQueryParser.java — ``"(john jon jonath*) peters*"~2``
parses each phrase word as a full subquery, rewrites the multi-term
clauses against the index, and runs the result as a SpanNear of
per-slot unions. This engine expresses the same thing as a
MultiPhraseQuery: each slot's units are expanded against the index
dictionary into a deterministic alternative set, then the positional
leaf runner (search/phrase.py search_phrase, the UnionPostingsEnum
analog) matches and scores.

Distributed shape: ONE dictionary scan per query resolves every slot's
expansions (bucket/predicate-pushed, bounded by ``max_expansions`` per
slot with a deterministic term-asc cut, TopTermsRewrite-style), then
the usual partition-pruned positional-block phrase plan — expansion
cost scales with the dictionary, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import bm25
from .queryparser import parse_complex_phrase

__all__ = ["complex_phrase", "expand_slots"]


def _unit_cond(unit):
    from ..functions.editdist import damerau_levenshtein
    from .executor import _like_pattern

    kind = unit[0]
    if kind == "term":
        return F.col("term") == unit[1]
    if kind == "prefix":
        return F.col("term").startswith(unit[1])
    if kind == "wildcard":
        return F.col("term").like(_like_pattern(unit[1]))
    if kind == "fuzzy":
        return damerau_levenshtein(F.col("term"), unit[1]) <= int(unit[2])
    raise ValueError(f"unknown complex-phrase unit {unit!r}")


def expand_slots(index, slots, max_expansions: int = 50) -> list:
    """Resolve every slot's units to concrete index terms in ONE
    dictionary pass: per slot, the union of its units' matching terms,
    cut deterministically at ``max_expansions`` terms ascending (the
    rewrite-cap role of IndexSearcher maxClauseCount / TopTermsRewrite,
    with a SQL-reproducible tie-free order). → [[term, ...], ...]."""
    slot_cols = [
        F.coalesce(*[
            F.when(_unit_cond(u), F.lit(True)) for u in slot
        ]).alias(f"s{i}")
        for i, slot in enumerate(slots)
    ]
    d = index.dictionary.select("term", *slot_cols)
    matched = d.filter(
        F.coalesce(*[F.col(f"s{i}") for i in range(len(slots))], F.lit(False))
    ).collect()
    out = [[] for _ in slots]
    for r in sorted(matched, key=lambda r: r["term"]):
        for i in range(len(slots)):
            if r[f"s{i}"] and len(out[i]) < max_expansions:
                out[i].append(r["term"])
    return out


def complex_phrase(
    index,
    query: str,
    k: int | None = None,
    analyzer=None,
    max_expansions: int = 50,
    boost: float = 1.0,
    k1=bm25.K1,
    b=bm25.B,
    precision: str = "float32",
) -> DataFrame:
    """Parse and execute a complex phrase query string against a
    positional SegmentedIndex. → DataFrame(doc_id, phrase_freq, score)
    per search_phrase's MultiPhraseQuery contract (idf summed over every
    surviving alternative, slop'd ordered matching)."""
    from .phrase import search_phrase

    slots, slop = parse_complex_phrase(query, analyzer)
    alts = expand_slots(index, slots, max_expansions)
    if any(not a for a in alts):
        # a slot with zero expansions can never match (phrase is
        # conjunctive across slots) — same contract as search_phrase
        # with an absent term
        spark = index.blocks.sparkSession
        score_type = "double" if precision == "double" else "float"
        return spark.createDataFrame(
            [], f"doc_id long, phrase_freq long, score {score_type}"
        )
    return search_phrase(
        index, alts, slop=slop, k=k, boost=boost, k1=k1, b=b,
        precision=precision,
    )
