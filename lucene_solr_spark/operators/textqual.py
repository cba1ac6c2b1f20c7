"""Text analysis for training-data curation: language ID, quality
scoring, token counting, document fingerprinting.

All JVM-native column expressions (whole-stage codegen; no Python per
row) and all reproducible in ANSI SQL so the DuckDB oracle verifies them
value-for-value. These are the training-pipeline extensions layered on
the same analysis chain the fulltext engine uses (analysis/tokenizer.py
is the indexing-grade analyzer; here the SQL-reproducible 'simple'
tokenization is used so results are cross-engine checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles, tokens_col
from .hashing import h60

__all__ = [
    "LANG_MARKERS",
    "lang_scores",
    "lang_id",
    "quality_features",
    "token_counts",
    "fingerprint",
    "REDACT_PATTERNS",
    "redact",
]

# Tiny high-frequency marker sets per language. The heuristic is the
# n-gram/stopword-hit-ratio classic; at production quality these lists
# would be larger, but the operator shape (argmax over per-language
# marker-hit counts) is the real deliverable.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "bu"],
}
LANG_ORDER = ["en", "de", "es", "fr", "zh"]  # deterministic tie-break


def _marker_hits(toks: Column, markers: list) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*markers)))


def lang_scores(text_col: str = "text") -> list:
    """[(lang, hit-count Column)] in LANG_ORDER."""
    toks = tokens_col(text_col)
    return [(lang, _marker_hits(toks, LANG_MARKERS[lang])) for lang in LANG_ORDER]


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_hits): argmax of marker-hit counts,
    first-wins tie-break in LANG_ORDER; 'und' when no marker hits."""
    scores = lang_scores(text_col)
    # argmax as one chained CASE: first lang (in LANG_ORDER) whose count
    # >= every other lang's count wins — deterministic, SQL-identical
    hits_total = None
    for _, s in scores:
        hits_total = s if hits_total is None else F.greatest(hits_total, s)
    expr = None
    for lang, s in scores:
        cond = None
        for other, s2 in scores:
            if other == lang:
                continue
            c = s >= s2
            cond = c if cond is None else cond & c
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    pred = F.when(hits_total == 0, F.lit("und")).otherwise(expr)
    return df.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("lang_pred"),
        hits_total.cast("long").alias("lang_hits"),
    )


def quality_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars, n_tokens, alpha_ratio, punct_ratio,
    stop_ratio, mean_tok_len, quality): deterministic heuristic quality
    score in [0,1] from length/punctuation/stopword ratios."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens_col(text_col)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
    punct = F.length(F.regexp_replace(text, "[^.,;:!?]", ""))
    stop = _marker_hits(toks, LANG_MARKERS["en"])
    nz = F.greatest(n_chars, F.lit(1)).cast("double")
    ntz = F.greatest(n_tokens, F.lit(1)).cast("double")
    alpha_ratio = alpha / nz
    punct_ratio = punct / nz
    stop_ratio = stop / ntz
    mean_tok_len = F.aggregate(
        toks, F.lit(0.0), lambda acc, x: acc + F.length(x).cast("double")
    ) / ntz
    # bounded heuristic: reward alpha density + stopword presence +
    # mid-range length; penalize punctuation soup
    len_score = F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0))
    quality = F.round(
        F.least(
            F.greatest(
                F.lit(0.4) * alpha_ratio
                + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0))
                + F.lit(0.3) * len_score
                - F.lit(0.5) * punct_ratio,
                F.lit(0.0),
            ),
            F.lit(1.0),
        ),
        4,
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(mean_tok_len, 4).alias("mean_tok_len"),
        quality.alias("quality"),
    )


BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens): whitespace token count and a
    BPE-ish regex count (letter runs / single digits / single symbols) —
    the cheap proxy used to budget LLM training tokens."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    ws = F.size(
        F.filter(F.split(text, "\\s+"), lambda x: x != F.lit(""))
    )
    bpe = F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
    )


def fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """(doc_id, fp_min, fp_max, n_grams): winnowing-style document
    fingerprint — min/max h60 over k-token rolling shingles. Equal
    fp_min is a strong containment/near-dup signal; (fp_min, fp_max)
    equality approximates full-document identity up to reordering."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(tokens_col(text_col), k)).alias("g"),
    )
    return sh.groupBy("doc_id").agg(
        F.min(h60("g")).alias("fp_min"),
        F.max(h60("g")).alias("fp_max"),
        F.count("*").alias("n_grams"),
    )


# ------------------------------------------------------ PII redaction

# Conservative patterns valid in both Java regex (Spark) and RE2
# (the oracle engine): no lookaround, no backrefs.
REDACT_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("url", r"https?://[A-Za-z0-9./_-]+"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def redact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns=None,
) -> DataFrame:
    """PII / identifier scrub for training-data pipelines: count and
    mask emails, URLs, phone numbers and IPv4 addresses.

    Pure regexp_count / regexp_replace Column expressions (JVM codegen,
    one pass per pattern, no Python) — at 100 TB this is a narrow
    per-row projection with nothing to shuffle. Patterns apply in list
    order; replacement tokens (``<EMAIL>`` …) never re-match later
    patterns.

    Returns (id, n_<name> per pattern, red_len, redacted).
    """
    patterns = REDACT_PATTERNS if patterns is None else patterns
    cols = [F.col(id_col)]
    for name, pat in patterns:
        cols.append(
            F.regexp_count(F.col(text_col), F.lit(pat))
            .cast("long").alias(f"n_{name}")
        )
    red = F.col(text_col)
    for name, pat in patterns:
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.select(
        *cols,
        F.length(red).cast("long").alias("red_len"),
        red.alias("redacted"),
    )


def ngram_lm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.5,
    min_count: int = 1,
) -> DataFrame:
    """Bigram language-model perplexity — the classic training-data
    quality filter (KenLM-style LM scoring, as used by CCNet/Gopher
    data pipelines; complements the reference's SignificantTerms/
    TextLogit statistical-text surface): train an add-k-smoothed word
    bigram LM on the corpus itself, then score every document by
    exp(−mean log P(w_i | w_{i−1})). High perplexity = text unlike the
    corpus (boilerplate, garbled, off-language) — the standard cut
    signal at 100 TB.

    Scale shape: token explode → ONE hash-agg shuffle for bigram
    counts + one for unigram counts, broadcast-joined back (vocabulary
    is bounded); the per-doc aggregation is a map-side-combined
    hash-agg. Per-bigram log-probs are rounded to 12dp and summed as
    DECIMAL so the mean is order-independent (bit-reproducible under
    any partitioning).

    Returns (id_col, n_bigrams, ppl) — docs with < 1 bigram carry
    ppl = 0.0 (no signal).
    """
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    base = df.select(F.col(id_col), toks.alias("toks"))
    pairs = base.select(
        id_col,
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("toks"), i).alias("w1"),
                        F.element_at(F.col("toks"), i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    big_counts = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    if min_count > 1:
        # 100 TB knob: drop rare bigrams before the broadcast so the
        # count table stays vocabulary-bounded (misses smooth to add_k)
        big_counts = big_counts.filter(F.col("c12") >= min_count)
    uni_counts = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = pairs.select(F.col("w2").alias("w")).union(
        pairs.select("w1")).distinct().count()

    k = float(add_k)
    scored = (
        pairs.join(F.broadcast(big_counts), ["w1", "w2"],
                   "left").fillna({"c12": 0})
        .join(F.broadcast(uni_counts), ["w1"])
        .withColumn(
            "logp",
            F.round(
                F.log((F.col("c12") + k) / (F.col("c1") + k * vocab)), 12
            ).cast("decimal(28,12)"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                F.exp(-(F.sum("logp").cast("double")) / F.count("*")), 6
            ).alias("ppl"),
        )
        .join(df.select(id_col), id_col, "right")
        .fillna({"n_bigrams": 0, "ppl": 0.0})
    )
