"""PhrasesIdentificationComponent — Solr's query-time phrase detector.

The reference analyzes the input string into a token graph of
unigrams + query-time shingles (posLen 1..maxQueryPositionLength),
marks tokens of posLen <= maxIndexedPositionLength as indexed, pulls
per-shingle ttf/df plus per-phrase conjunction doc counts from the
index, and scores every candidate with a Bayesian
"words-as-a-phrase" model (reference solr/core/src/java/org/apache/
solr/handler/component/PhrasesIdentificationComponent.java —
computeFieldScore:950-1085):

  for each largest indexed sub-phrase `words` of the input:
    P(words|phrase)      = phrase_ttf / min(word_ttf)
    P(words|not phrase)  = phrase_ttf / max(word_ttf)
    phrase_prob          = conj(input) / conj(words)
    max_wrapper          = max over indexed super-phrases p of words:
                             df(p) / conj(p)     (0 when conj(p)<=0)
    score += P(words|phrase)     * (phrase_prob - max_wrapper)
           - P(words|not phrase) * (1 - (phrase_prob - max_wrapper))
  score *= 1 / (1 + maxQueryPositionLength - maxIndexedPositionLength)
  score *= conj(input) / max(conj(input), conj(words)...)

with hard gates: any query word absent from the index, or
conj(input) == 0, scores -1; single words score 0. The final response
keeps phrases with score > 0, sorted descending, greedily selecting
non-overlapping position spans (scoreAndAddResultsToResponse:283-309).

Spark shape: candidate enumeration and the closed-form scoring are
driver-side over a HANDFUL of per-candidate scalars (exactly the
reference's per-request TermsEnum pulls); ALL corpus statistics —
unigram/shingle ttf, shingle df, conjunction doc counts — come from
three DataFrame aggregations over the term-pushed positional token
relation, so the heavy part scales with the corpus while the driver
only ever sees O(#candidates) numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["enumerate_phrases", "phrases_identification"]


def enumerate_phrases(words, max_indexed: int, max_query: int):
    """All contiguous spans of ``words`` with length 1..max_query —
    the token graph a unigram+shingle query analyzer emits, position
    ascending then length ascending (the component's required token
    order). Each entry: (start, length, words_tuple, is_indexed)."""
    out = []
    n = len(words)
    for start in range(n):
        for length in range(1, min(max_query, n - start) + 1):
            out.append(
                (
                    start,
                    length,
                    tuple(words[start:start + length]),
                    length <= max_indexed,
                )
            )
    out.sort(key=lambda p: (p[0], p[1]))
    return out


def _collect_stats(doc_tokens: DataFrame, words, phrases):
    """One pass each for unigram ttf, n-gram ttf/df (positional offset
    equi-joins, term-pushed), and conjunction doc counts (single
    conditional hash-agg over per-doc word flags)."""
    vocab = sorted(set(words))
    toks = doc_tokens.filter(F.col("term").isin(vocab)).select(
        "doc_id", "pos", "term"
    )

    uni = {
        r["term"]: r["ttf"]
        for r in toks.groupBy("term")
        .agg(F.count("*").alias("ttf"))
        .collect()
    }

    ngrams = sorted(
        {p[2] for p in phrases if p[3] and p[1] >= 2}
    )
    ngram_stats = {}
    for g in ngrams:
        m = toks.filter(F.col("term") == g[0]).select(
            "doc_id", F.col("pos").alias("p0")
        )
        for i in range(1, len(g)):
            nxt = toks.filter(F.col("term") == g[i]).select(
                "doc_id", (F.col("pos") - i).alias(f"q{i}")
            )
            m = m.join(
                nxt,
                (m["doc_id"] == nxt["doc_id"])
                & (F.col("p0") == F.col(f"q{i}")),
            ).select(m["doc_id"], "p0")
        row = m.agg(
            F.count("*").alias("ttf"),
            F.countDistinct("doc_id").alias("df"),
        ).collect()[0]
        ngram_stats[g] = (row["ttf"], row["df"])

    sets = sorted({tuple(sorted(set(p[2]))) for p in phrases})
    flags = toks.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("term") == w, 1).otherwise(0)).alias(
                f"w_{i}"
            )
            for i, w in enumerate(vocab)
        ]
    )
    conj_aggs = []
    for si, s in enumerate(sets):
        cond = F.lit(True)
        for w in s:
            cond = cond & (F.col(f"w_{vocab.index(w)}") == 1)
        conj_aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"c_{si}")
        )
    crow = flags.agg(*conj_aggs).collect()[0]
    conj = {s: crow[f"c_{si}"] or 0 for si, s in enumerate(sets)}
    return uni, ngram_stats, conj


def _score_phrase(
    phrase, phrases, uni, ngram_stats, conj, max_indexed, max_query
):
    start, length, ws, _ = phrase
    if any(uni.get(w, 0) <= 0 for w in ws):
        return -1.0
    phrase_conj = conj[tuple(sorted(set(ws)))]
    if phrase_conj <= 0:
        return -1.0
    if length <= 1:
        return 0.0

    # largest indexed sub-phrases: itself when indexed, else every
    # contiguous max_indexed-length sub-span
    if length <= max_indexed:
        subs = [(start, length, ws)]
    else:
        subs = [
            (start + i, max_indexed, ws[i:i + max_indexed])
            for i in range(length - max_indexed + 1)
        ]

    field_score = 0.0
    max_sub_conj = phrase_conj
    for s_start, s_len, s_ws in subs:
        ttf, _df = ngram_stats[s_ws]
        words_conj = conj[tuple(sorted(set(s_ws)))]
        max_sub_conj = max(max_sub_conj, words_conj)

        # indexed super-phrases of this sub-phrase among the query's
        # candidates: longer, indexed, fully containing its span
        wrapper = 0.0
        for o_start, o_len, o_ws, o_idx in phrases:
            if (
                o_idx
                and o_len > s_len
                and o_start <= s_start
                and s_start + s_len <= o_start + o_len
            ):
                o_conj = conj[tuple(sorted(set(o_ws)))]
                if o_conj > 0:
                    wrapper = max(
                        wrapper, ngram_stats[o_ws][1] / o_conj
                    )

        ttfs = [uni[w] for w in s_ws]
        words_phrase_prob = ttf / min(ttfs)
        words_not_phrase_prob = ttf / max(ttfs)
        phrase_prob = phrase_conj / words_conj

        phrase_score = words_phrase_prob * (phrase_prob - wrapper)
        not_phrase_score = words_not_phrase_prob * (
            1 - (phrase_prob - wrapper)
        )
        field_score += phrase_score - not_phrase_score

    field_score *= 1.0 / (1 + max_query - max_indexed)
    field_score *= phrase_conj / max_sub_conj
    return field_score


def select_phrases(scored):
    """The response's greedy non-overlap pass: phrases with score > 0,
    best first, each claiming its positions; later phrases touching a
    claimed position are dropped (scoreAndAddResultsToResponse:
    283-309)."""
    covered = set()
    keep = []
    for start, length, ws, score in sorted(
        (p for p in scored if p[3] > 0.0),
        key=lambda p: (-p[3], p[0], p[1]),
    ):
        span = set(range(start, start + length))
        if span & covered:
            continue
        covered |= span
        keep.append((start, length, ws, score))
    return keep


def phrases_identification(
    doc_tokens: DataFrame,
    words,
    max_indexed: int = 3,
    max_query: int = 4,
) -> DataFrame:
    """Score every candidate phrase of the analyzed query ``words``.

    → DataFrame (phrase, pos_start, pos_len, score, selected) —
    every candidate with its raw score and whether the greedy
    non-overlap response pass keeps it."""
    spark = doc_tokens.sparkSession
    phrases = enumerate_phrases(words, max_indexed, max_query)
    uni, ngram_stats, conj = _collect_stats(doc_tokens, words, phrases)
    scored = [
        (
            p[0],
            p[1],
            p[2],
            _score_phrase(
                p, phrases, uni, ngram_stats, conj, max_indexed,
                max_query,
            ),
        )
        for p in phrases
    ]
    kept = {(s, l) for s, l, _, _ in select_phrases(scored)}
    rows = [
        (
            " ".join(ws),
            int(s),
            int(l),
            float(score),
            (s, l) in kept,
        )
        for s, l, ws, score in scored
    ]
    return spark.createDataFrame(
        rows,
        "phrase string, pos_start int, pos_len int, score double, "
        "selected boolean",
    )
