"""Deterministic sampling: the RandomStream analog, pipeline-grade.

Solr's ``random`` streaming expression returns a pseudo-random slice of
a collection (solr/solrj/.../io/stream/RandomStream.java). A training
-data pipeline needs the stronger form: samples that are DETERMINISTIC
(reproducible runs, resumable jobs, auditable lineage) and STRATIFIED
(per-language / per-source quotas). Both come from the engine's
portable h60 hash instead of an RNG:

    keep(row)  ⇔  h60(salt | key) % 1_000_000  <  fraction * 1_000_000

- same salt + key ⇒ same decision on every run, every engine (the
  DuckDB oracle recomputes it exactly — no rand() anywhere),
- changing the salt draws an independent sample,
- the filter is a pure Column predicate: pushed into the scan, no
  shuffle, no sort, no sampling pass (Spark's df.sample is seeded per
  PARTITION and breaks under repartitioning; this is row-content
  seeded and partition-independent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import h60

__all__ = ["sample_predicate", "deterministic_sample", "stratified_sample"]

_M = 1_000_000


def sample_predicate(key_col, fraction: float, salt: str = "s0") -> Column:
    """Boolean keep-predicate for a ``fraction`` sample keyed on
    ``key_col`` (pure expression — composable into any plan)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return (
        h60(F.concat(F.lit(f"{salt}|"), c.cast("string"))) % _M
        < int(fraction * _M)
    )


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = "s0"
) -> DataFrame:
    """Reproducible ``fraction`` sample of ``df`` keyed on ``key_col``."""
    return df.filter(sample_predicate(key_col, fraction, salt))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str,
    salt: str = "s0",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps stratum
    value → keep fraction (strata absent from the map use
    ``default_fraction``). One scan, one CASE over the threshold — the
    per-language / per-source quota downsampler."""
    thr = F.lit(int(default_fraction * _M))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(int(frac * _M))
        ).otherwise(thr)
    c = F.col(key_col)
    return df.filter(
        h60(F.concat(F.lit(f"{salt}|"), c.cast("string"))) % _M < thr
    )
