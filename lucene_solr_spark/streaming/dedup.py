"""Ingest-time streaming deduplication — SignatureUpdateProcessor.

The reference dedupes at update time: SignatureUpdateProcessorFactory
computes a content signature per incoming doc (exact MD5 or fuzzy
TextProfileSignature) and overwrites/drops duplicates (reference
solr/core/src/java/org/apache/solr/update/processor/
SignatureUpdateProcessorFactory.java, Lookup3Signature.java,
TextProfileSignature.java).

Spark-first: a streaming transformation, not a processor chain —
signature is the engine's portable h60 over normalized text (the
same hash every dedup gate uses), and duplicate suppression is
``dropDuplicatesWithinWatermark``: state is bounded by the watermark
delay (Lucene/Solr bound it by the index itself; an unbounded stream
needs the time bound, which is the honest 100 TB semantics — a dup
arriving later than the delay re-enters, exactly like a Solr dedupe
overwrite after a segment merge horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.hashing import h60

__all__ = ["with_signature", "dedup_stream"]


def with_signature(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the content signature column (``sig``): h60 over the
    whitespace-normalized lowercased text — the exact-signature mode
    (MD5Signature analog; the fuzzy TextProfileSignature mode is the
    shingle/minhash path in operators/dedup.py)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.withColumn("sig", h60(F.trim(norm)))


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact-dedup: keep the first arrival of each signature
    within the watermark horizon. A batch DataFrame gets the same
    semantics with an infinite horizon: the EARLIEST ``ts_col`` row per
    signature wins (ties broken by the remaining columns so the result
    is deterministic under any partitioning — plain dropDuplicates
    keeps a partition-order-dependent arbitrary row)."""
    sig = with_signature(stream, text_col)
    if not stream.isStreaming:
        from pyspark.sql import Window as W

        order = [F.asc_nulls_last(ts_col)] + [
            F.asc(c) for c in sig.columns if c not in ("sig", ts_col)
        ]
        w = W.partitionBy("sig").orderBy(*order)
        return (
            sig.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return sig.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["sig"]
    )
