"""Distributed deterministic transcript synthesis (benchmark corpus).

The north rule's input is an Iceberg-style table of multi-turn transcripts
(conv_id, turn_idx, role, text, tool, ts). Tests use the small pandas
generator in fixtures.py; benchmarks need millions of turns, so this
module synthesizes the same shape *distributively*: ``spark.range`` plus
pure JVM expressions (xxhash64-seeded, Zipf-skewed token picks) — zero
Python in the generation path, deterministic for a given (n_turns, seed),
and embarrassingly parallel, so generation itself scales with the
cluster. This mirrors the reference benchmark corpus generators
(lucene/benchmark/.../feeds/LineDocSource.java, ReutersContentSource.java)
which stream synthetic/line docs into the index build.

Zipf skew: rank = floor(V^u) with u uniform in [0,1) gives P(rank) ~ 1/rank
(s=1 Zipf), reproducing the hot-term skew (head term appears in ~1/ln(V)
of all token draws) that the salted posting merge must defuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["synth_transcripts", "synth_term"]

_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "na",
    "pe", "qui", "ra", "so", "tu", "va", "wi", "xo", "yu", "za",
    "ster", "mont", "rell", "vin", "dor", "lan", "tek", "ran", "bel", "cor",
]


def synth_term(rank: int) -> str:
    """The vocabulary term for Zipf rank ``rank`` (1-based): a syllable
    prefix + the rank digits — pronounceable-ish, lowercase-alnum, unique.
    Mirrors the column expression in synth_transcripts exactly."""
    return _SYLLABLES[rank % len(_SYLLABLES)] + str(rank)


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    seed: int = 42,
    vocab_size: int = 5000,
    turns_per_conv: int = 8,
    min_tokens: int = 10,
    max_tokens: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcript corpus of exactly ``n_turns`` rows.

    Every column is derived from the row id via xxhash64 → the output is
    identical regardless of partitioning/parallelism (required so the
    N-core vs 4N-core scaling runs index the *same* corpus).
    """
    v = float(vocab_size)
    syl = F.array(*[F.lit(s) for s in _SYLLABLES])

    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2
    df = spark.range(0, n_turns, 1, num_partitions)

    def u01(*cols):
        """Deterministic uniform [0,1) from hashed columns."""
        return (F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(1_000_000)).cast("double")
                / 1_000_000.0)

    n_tok = (min_tokens
             + F.pmod(F.xxhash64("id", F.lit("ntok"), F.lit(seed)),
                      F.lit(max_tokens - min_tokens)).cast("int"))
    # token i of row id: Zipf rank via inverse-CDF → term string (synth_term)
    def term_of(rank):
        return F.concat(
            F.element_at(syl, (F.pmod(rank, F.lit(len(_SYLLABLES))) + 1).cast("int")),
            rank.cast("string"),
        )

    toks = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: term_of(
            F.least(
                F.lit(vocab_size),
                F.greatest(
                    F.lit(1),
                    F.floor(F.pow(F.lit(v), u01(F.col("id"), i))).cast("int"),
                ),
            )
        ),
    )
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    return df.select(
        F.concat(
            F.lit("conv"),
            F.lpad((F.col("id") / turns_per_conv).cast("long").cast("string"), 10, "0"),
        ).alias("conv_id"),
        F.pmod(F.col("id"), F.lit(turns_per_conv)).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.array_join(toks, " ").alias("text"),
        F.when(role == "tool",
               F.element_at(F.array(F.lit("bash"), F.lit("search"), F.lit("editor")),
                            (F.pmod(F.xxhash64("id", F.lit("tool")), F.lit(3)) + 1).cast("int"))
               ).alias("tool"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id"))).alias("ts"),
    )
