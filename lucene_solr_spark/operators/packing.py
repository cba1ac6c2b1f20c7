"""Sequence packing — GPT-style concat-and-chunk construction of
fixed-length training sequences from a document corpus.

The standard LLM pretraining batch layout concatenates every
document's tokens in a deterministic corpus order and cuts the stream
into ``seq_len``-token sequences; a document therefore occupies the
half-open token interval [offset, offset + n_tokens) and spans the
sequences floor(offset/L) .. floor((offset + n_tokens - 1)/L).
``pack_sequences`` computes, per document: its token count, its
global token offset, the first/last sequence ids and the spanned
sequence count; ``sequence_boundary_stats`` aggregates per-sequence
document counts and boundary-split counts (the numbers a packing
dashboard reports).

Scale design (the index/docid.py pattern): a naive
``sum() OVER (ORDER BY doc_id)`` collapses to a single partition —
unusable at 10^12 turns. Instead:

1. range-repartition on the id (distributed sort),
2. per-partition token SUMS to the driver (one long per partition),
3. driver prefix-sum broadcast back; a narrow Arrow ``mapInPandas``
   adds ``prefix[pid] + local_cumsum``.

Partition boundaries from range sampling don't affect offsets: each
partition holds a contiguous disjoint id range, so local cumsum +
prefix == global cumsum. The driver gate (td_seq_packing member of
td_text_metrics) verifies this distributed plan against DuckDB's
declarative window cumsum over the same corpus.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["pack_sequences", "sequence_boundary_stats"]


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: Optional[str] = None,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Per-document packing positions for fixed ``seq_len`` sequences
    over the whitespace token stream concatenated in ``id_col`` order.

    Returns (doc_id, n_tokens, offset, first_seq, last_seq, n_seqs);
    zero-token documents sit at their offset with n_seqs = 0.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    spark = docs.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions"))

    if n_tokens_col is None:
        text = F.coalesce(F.col(text_col), F.lit(""))
        n_tokens = F.size(
            F.filter(F.split(text, "\\s+"), lambda x: x != F.lit("")))
    else:
        n_tokens = F.col(n_tokens_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.cast("long").alias("n_tokens"),
    )

    ordered = (base.repartitionByRange(n, "doc_id")
               .sortWithinPartitions("doc_id").persist())
    # one long per partition — the driver prefix sum, not a data collect
    part_sums = {
        int(r["pid"]): int(r["s"])
        for r in ordered.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum("n_tokens").alias("s")).collect()
    }
    prefix = np.zeros(max(part_sums, default=-1) + 2, dtype=np.int64)
    for pid in sorted(part_sums):
        prefix[pid + 1] = prefix[pid] + part_sums[pid]
    bc = spark.sparkContext.broadcast(prefix)

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("offset", T.LongType()),
    ])

    def add_offsets(batches):
        pid = TaskContext.get().partitionId()
        start = int(bc.value[pid]) if pid < len(bc.value) else 0
        for pdf in batches:
            tok = pdf["n_tokens"].to_numpy(dtype=np.int64)
            cum = np.cumsum(tok) - tok + start
            start += int(tok.sum())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "offset": cum,
            })

    out = ordered.mapInPandas(add_offsets, schema)
    first = (F.col("offset") / seq_len).cast("long")
    last_tok = F.col("offset") + F.greatest(
        F.col("n_tokens") - 1, F.lit(0))
    last = (last_tok / seq_len).cast("long")
    return out.select(
        "doc_id", "n_tokens", "offset",
        first.alias("first_seq"), last.alias("last_seq"),
        F.when(F.col("n_tokens") == 0, F.lit(0)).otherwise(
            last - first + 1).cast("long").alias("n_seqs"),
    )


def sequence_boundary_stats(packed: DataFrame) -> DataFrame:
    """Per-sequence packing stats from pack_sequences output:
    (seq_id, n_docs_starting, n_docs_spanning_in) — how many documents
    begin in each sequence and how many straddle into it from the
    previous one (boundary splits a continuation-aware loader must
    handle)."""
    starts = (packed.filter(F.col("n_tokens") > 0)
              .groupBy(F.col("first_seq").alias("seq_id"))
              .agg(F.count("*").alias("n_docs_starting")))
    spans = (packed.filter(F.col("last_seq") > F.col("first_seq"))
             .select(F.explode(F.sequence(
                 F.col("first_seq") + 1, F.col("last_seq")))
                 .alias("seq_id"))
             .groupBy("seq_id")
             .agg(F.count("*").alias("n_docs_spanning_in")))
    return (starts.join(spans, "seq_id", "full")
            .select("seq_id",
                    F.coalesce("n_docs_starting", F.lit(0))
                    .alias("n_docs_starting"),
                    F.coalesce("n_docs_spanning_in", F.lit(0))
                    .alias("n_docs_spanning_in")))
