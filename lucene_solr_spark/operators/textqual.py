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
    "pseudo_lines",
    "line_repetition",
    "ngram_repetition",
    "GOPHER_STOPWORDS",
    "gopher_quality",
    "C4_TERMINAL",
    "c4_line_filter",
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


# --------------------------------------------------------------------
# Gopher/C4-style repetition + quality filtering (the standard web-scale
# pretraining-data filters; definitions pinned below since published
# implementations differ in the details).


def pseudo_lines(
    df: DataFrame,
    width: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, line_id, line, n_words): fixed-``width`` token windows
    reassembled as lines.  Line-level filters need line structure; for
    corpora without newlines (this engine's transcript turns) the pinned
    windowing stands in for physical lines — pass a real
    split-on-newline frame instead when the data has them."""
    toks = tokens_col(text_col)
    n_lines = F.ceil(F.size(toks) / F.lit(width)).cast("int")
    lines = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(
                F.slice(toks, i * width + 1, width), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(lines)
    ).select(
        "doc_id",
        F.col("pos").cast("int").alias("line_id"),
        F.col("col").alias("line"),
    )
    return out.withColumn(
        "n_words", F.size(tokens_col("line")).cast("int")
    )


def line_repetition(
    lines_df: DataFrame, id_col: str = "doc_id", line_col: str = "line"
) -> DataFrame:
    """Gopher repetition signals at line granularity (Rae et al. 2021,
    appendix A1.1 "repetitious text").  Pinned definitions:

    - ``dup_line_frac``  = (n_lines − n_distinct_lines) / n_lines
    - ``dup_line_char_frac`` = chars in occurrences beyond each line's
      first / total line chars

    One partial+final hash-agg per doc — scales like any groupBy."""
    per = lines_df.groupBy(id_col, line_col).agg(
        F.count("*").alias("cnt"),
        F.length(F.first(line_col)).alias("chars"),
    )
    return (
        per.groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_lines"),
            F.count("*").cast("long").alias("n_distinct_lines"),
            F.sum((F.col("cnt") - 1) * F.col("chars")).alias("_dup_chars"),
            F.sum(F.col("cnt") * F.col("chars")).alias("_tot_chars"),
        )
        .select(
            id_col,
            "n_lines",
            "n_distinct_lines",
            F.round(
                (F.col("n_lines") - F.col("n_distinct_lines"))
                / F.col("n_lines").cast("double"),
                6,
            ).alias("dup_line_frac"),
            F.round(
                F.col("_dup_chars")
                / F.greatest(F.col("_tot_chars"), F.lit(1)).cast("double"),
                6,
            ).alias("dup_line_char_frac"),
        )
    )


def ngram_repetition(
    df: DataFrame,
    top_n: int = 2,
    dup_n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher n-gram repetition signals (A1.1).  Pinned definitions
    (the Dolma-style occurrence-sum variant, not position-coverage):

    - ``top{n}gram_char_frac`` = cnt·chars of the most frequent
      ``top_n``-gram / total token chars (ties broken by larger
      cnt·chars);
    - ``dup{n}gram_char_frac`` = Σ over ``dup_n``-grams occurring ≥2×
      of cnt·chars / total token chars.

    Total token chars = length of the space-joined token stream, so the
    fractions are scale-free in the normalized text."""
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(text_col).alias("toks"),
    )
    base = toks.select(
        "doc_id",
        F.length(F.array_join("toks", " ")).cast("long").alias("_tot"),
        F.col("toks"),
    )

    def gram_counts(n):
        return (
            base.select(
                "doc_id", "_tot",
                F.explode(shingles(F.col("toks"), n)).alias("g"),
            )
            .groupBy("doc_id", "_tot", "g")
            .agg(F.count("*").alias("cnt"))
            .withColumn("cov", F.col("cnt") * F.length("g"))
        )

    wt = W.partitionBy("doc_id")
    top = (
        gram_counts(top_n)
        .withColumn("mx", F.max("cnt").over(wt))
        .filter(F.col("cnt") == F.col("mx"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.max("cov") / F.max("_tot").cast("double"), 6
            ).alias(f"top{top_n}gram_char_frac")
        )
    )
    dup = (
        gram_counts(dup_n)
        .filter(F.col("cnt") >= 2)
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum("cov") / F.max("_tot").cast("double"), 6
            ).alias(f"dup{dup_n}gram_char_frac")
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(top, "doc_id", "left")
        .join(dup, "doc_id", "left")
        .fillna(0.0)
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher quality-rule battery (Rae et al. 2021, A1.1): word-count
    window, mean-word-length window, '#'/ellipsis symbol-to-word ratio,
    fraction of words containing an alphabetic character, and the
    ≥2-of-8 required-stopword rule.  Every rule is its own flag column
    plus the conjunction ``gq_keep``; pure Column exprs."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(raw, r"\s+"), lambda x: x != F.lit(""))
    n_words = F.size(words)
    nz = F.greatest(n_words, F.lit(1)).cast("double")
    mean_len = F.aggregate(
        words, F.lit(0.0), lambda acc, w: acc + F.length(w)
    ) / nz
    n_sym = (
        F.size(F.filter(words, lambda w: w.startswith("#")))
        + F.size(F.filter(words, lambda w: w.contains("...")))
    )
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[a-zA-Z]"))
    )
    toks = tokens_col(text_col)
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    )
    flags = {
        "gq_words_ok": (n_words >= min_words) & (n_words <= max_words),
        "gq_mean_len_ok": (mean_len >= min_mean_len)
        & (mean_len <= max_mean_len),
        "gq_symbol_ok": (n_sym / nz) <= max_symbol_ratio,
        "gq_alpha_ok": (n_alpha_words / nz) >= min_alpha_frac,
        "gq_stopword_ok": stop_hits >= min_stop_hits,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("gq_n_words"),
        F.round(mean_len, 6).alias("gq_mean_word_len"),
        F.round(n_sym / nz, 6).alias("gq_symbol_ratio"),
        F.round(n_alpha_words / nz, 6).alias("gq_alpha_frac"),
        stop_hits.cast("long").alias("gq_stop_hits"),
        *[v.cast("int").alias(k) for k, v in flags.items()],
        keep.cast("int").alias("gq_keep"),
    )


C4_TERMINAL = (".", "!", "?", '"')


def c4_line_filter(
    lines_df: DataFrame,
    min_words: int = 5,
    min_kept_lines: int = 3,
    id_col: str = "doc_id",
    line_col: str = "line",
    words_col: str = "n_words",
) -> DataFrame:
    """C4 line-level cleaning rules (Raffel et al. 2020 §2.2): keep a
    line iff it ends in terminal punctuation, has ≥``min_words`` words,
    and contains neither 'lorem ipsum' nor '{'.  Per-doc stats plus the
    C4 document rule ``c4_keep_doc`` (≥``min_kept_lines`` kept lines,
    the ≥3-sentence analog)."""
    line = F.col(line_col)
    terminal = None
    for t in C4_TERMINAL:
        c = line.endswith(t)
        terminal = c if terminal is None else (terminal | c)
    keep = (
        terminal
        & (F.col(words_col) >= min_words)
        & ~F.lower(line).contains("lorem ipsum")
        & ~line.contains("{")
    )
    return (
        lines_df.withColumn("_keep", keep.cast("int"))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("c4_n_lines"),
            F.sum("_keep").cast("long").alias("c4_kept_lines"),
            F.sum(
                F.when(F.col("_keep") == 1, F.length(line)).otherwise(0)
            ).cast("long").alias("c4_kept_chars"),
        )
        .withColumn(
            "c4_keep_doc",
            (F.col("c4_kept_lines") >= min_kept_lines).cast("int"),
        )
    )
