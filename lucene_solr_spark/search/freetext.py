"""FreeTextSuggester: stupid-backoff n-gram language-model completions.

Reference: lucene/suggest/src/java/org/apache/lucene/search/suggest/
analyzing/FreeTextSuggester.java — indexes token shingles of orders
1..grams with their total occurrence counts, then completes the
partially-typed last token of a query from the highest-order model
whose context matched, falling back one order at a time with the
stupid-backoff multiplier ALPHA=0.4 per order (FreeTextSuggester.java
ALPHA at :133, backoff loop at :506-669). Scoring per candidate at
order g (g context tokens + the typed fragment):

    score = ALPHA^(backoffs) * count(gram) / count(context)

with count(context) = totTokens for the unigram model. The reference
scales this by Long.MAX_VALUE into a long (:664); this rebuild emits
the raw backed-off probability — ordering identical, representation
declared. A completion's LAST token is kept only from the highest
order that produced it (the ``seen`` set, :512-657); final order is
score desc then completion-key asc (:673-683).

Spark shape: the model is one DataFrame ``(ord, context, last, cnt)``
built with a JVM higher-order-function shingle expansion + one
hash-agg (map-side combined — at 100 TB the shuffle carries n-gram
count partials, never raw text). Lookup touches only rows matching the
literal (ord, context) pair — a partition-prunable equi-filter — plus
two one-row denominator frames broadcast by crossJoin; no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["ALPHA", "build_freetext_model", "freetext_lookup"]

ALPHA = 0.4


def _shingles(toks_col: str, n: int):
    """array<string> → array of the order-``n`` shingles, each a
    struct(context, last) — positions via JVM sequence/transform, no
    Python."""
    # NB sequence(1, 0) DESCENDS in Spark, so the position list is
    # filtered rather than bounded (empty/short docs → no shingles)
    return F.expr(
        f"""transform(
              filter(sequence(1, greatest(size({toks_col}), 1)),
                     i -> i + {n - 1} <= size({toks_col})),
              i -> struct(
                array_join(slice({toks_col}, i, {n - 1}), ' ') AS context,
                element_at({toks_col}, i + {n - 1}) AS last))"""
    )


def build_freetext_model(
    docs: DataFrame, text_col: str = "text", grams: int = 3
) -> DataFrame:
    """Build the 1..grams shingle count model:
    ``(ord, context, last, cnt)`` where ``context`` is the ord-1
    preceding tokens space-joined ('' for unigrams) and ``cnt`` the
    total occurrence count (the reference indexes shingle
    totalTermFreq, FreeTextSuggester.java:281-320)."""
    from ..index.builder import simple_tokens

    toks = docs.select(simple_tokens(text_col).alias("toks"))
    out = None
    for n in range(1, grams + 1):
        d = (
            toks.select(F.explode(_shingles("toks", n)).alias("s"))
            .select(
                F.lit(n).alias("ord"),
                F.col("s.context").alias("context"),
                F.col("s.last").alias("last"),
            )
            .groupBy("ord", "context", "last")
            .agg(F.count("*").alias("cnt"))
        )
        out = d if out is None else out.unionByName(d)
    return out


def _backoffs(grams: int) -> list:
    """Exact repeated-multiplication backoff constants (1.0, ALPHA,
    ALPHA*ALPHA, …) — inlined as literals so any engine reproduces the
    identical doubles (power() may differ in ULP)."""
    out, b = [], 1.0
    for _ in range(grams):
        out.append(b)
        b *= ALPHA
    return out


def freetext_lookup(
    model: DataFrame, key: str, grams: int = 3, num: int = 10
) -> DataFrame:
    """Complete ``key`` ("foo bar b" — the final fragment is the token
    being typed; a trailing space means 'predict the next token').
    Returns (completion, score) — completion is the matched model
    token (the order's context + the completed last token), the
    reference LookupResult key with ' ' for the \\x1E separator."""
    ended = key != key.rstrip()
    parts = key.strip().lower().split()
    if ended or not parts:
        ctx_toks, frag = parts, ""
    else:
        ctx_toks, frag = parts[:-1], parts[-1]
    t = len(ctx_toks)
    top = min(t, grams - 1)
    boffs = _backoffs(grams)

    frames = []
    for g in range(top, -1, -1):
        if g == 0 and frag == "" and key.strip():
            # "Don't make unigram predictions from empty string"
            # (FreeTextSuggester.java:517)
            continue
        ctx = " ".join(ctx_toks[t - g:])
        backoff = boffs[top - g]
        cand = model.filter(
            (F.col("ord") == g + 1)
            & (F.col("context") == ctx)
            & F.col("last").startswith(frag)
        )
        if g == 0:
            denom = model.filter(F.col("ord") == 1).agg(
                F.sum("cnt").cast("double").alias("denom")
            )
        else:
            head = " ".join(ctx_toks[t - g: t - 1]) if g > 1 else ""
            tail = ctx_toks[-1]
            denom = (
                model.filter(
                    (F.col("ord") == g)
                    & (F.col("context") == head)
                    & (F.col("last") == tail)
                )
                .select(F.col("cnt").cast("double").alias("denom"))
                .limit(1)
            )
        scored = (
            cand.crossJoin(F.broadcast(denom))
            .select(
                F.lit(g).alias("g"),
                F.col("last"),
                F.trim(F.concat_ws(" ", F.lit(ctx), F.col("last"))).alias(
                    "completion"
                ),
                F.round(
                    F.lit(backoff) * F.col("cnt") / F.col("denom"), 9
                ).alias("score"),
                F.col("cnt"),
            )
            # the reference's per-order TopNSearcher pulls at most num
            .orderBy(F.desc("cnt"), F.asc("last"))
            .limit(num)
        )
        frames.append(scored)

    from functools import reduce

    from pyspark.sql import Window as W

    allc = reduce(lambda a, b: a.unionByName(b), frames)
    # a last-token completion survives only from the highest order that
    # produced it (the reference's `seen` set)
    w = W.partitionBy("last").orderBy(F.desc("g"))
    return (
        allc.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("completion", "score")
        .orderBy(F.desc("score"), F.asc("completion"))
        .limit(num)
    )
