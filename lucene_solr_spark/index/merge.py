"""Segment merge: sort-shuffle with structural salting for hot terms.

Lucene merges segments in the background, remapping docIDs and
concatenating postings per term (reference: index/TieredMergePolicy.java,
index/DocIDMerger.java). Our docIDs are already global, so merging a
term's postings is pure re-blocking — but a Zipf-head term's posting
list at 10^12-doc scale is far too large for one reducer.

The salt is STRUCTURAL, not random: the shuffle key is
``(term, seg_group)`` where ``seg_group = seg_id // seg_group_size``.
Segments hold contiguous disjoint doc-id ranges (range-partitioned), so
each group's postings are a contiguous doc-range slice of the term's
final posting list: reducers re-encode their slice into optimal
128-posting blocks independently, no cross-group coordination, and the
concatenation of groups (ordered by first_doc) IS the merged list.
Per-reducer work is bounded by seg_group_size segments regardless of a
term's total df — hot-term skew is defused by construction (the
explicit analog of AQE skew-split, which stays on as a backstop).

Output layout (the "at-rest" index):
    merged/postings/    parquet, partitioned by term_bucket =
                        pmod(hash(term), n_buckets) → a query for a few
                        terms prunes to a few directories at scan time
    merged/dictionary/  (term, df, cf)
    merged/norms/       (doc_id, dl, norm_byte, seg_id)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codec import decode_block, decode_vints, encode_posting_blocks

__all__ = ["merge_segments", "MERGED_POSTING_SCHEMA"]

MERGED_POSTING_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("seg_group", T.IntegerType()),
        T.StructField("first_doc", T.LongType()),
        T.StructField("last_doc", T.LongType()),
        T.StructField("n_docs", T.IntegerType()),
        T.StructField("sum_freq", T.LongType()),
        T.StructField("docs", T.BinaryType()),
        T.StructField("freqs", T.BinaryType()),
        T.StructField("norms", T.BinaryType()),
        T.StructField("impact_freqs", T.ArrayType(T.IntegerType())),
        T.StructField("impact_norms", T.ArrayType(T.IntegerType())),
    ]
)


def _merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """All blocks of one (term, seg_group): decode, concat in doc order,
    re-encode into 128-posting blocks. Segments are disjoint doc ranges,
    so sorting blocks by first_doc yields globally sorted postings."""
    term = pdf["term"].iloc[0]
    seg_group = int(pdf["seg_group"].iloc[0])
    pdf = pdf.sort_values("first_doc")
    doc_parts, freq_parts, norm_parts = [], [], []
    for r in pdf.itertuples():
        d, f = decode_block(r.docs, r.freqs)
        doc_parts.append(d)
        freq_parts.append(f)
        norm_parts.append(np.frombuffer(r.norms, dtype=np.uint8))
    docs = np.concatenate(doc_parts)
    freqs = np.concatenate(freq_parts)
    norms = np.concatenate(norm_parts).astype(np.int64)
    blocks = encode_posting_blocks(docs, freqs, norms)
    rows = []
    off = 0
    for first, last, nd, db, fb, impf, impn in blocks:
        rows.append(
            (
                term, seg_group, first, last, nd,
                int(freqs[off : off + nd].sum()),
                db, fb, norms[off : off + nd].astype(np.uint8).tobytes(),
                impf.tolist(), impn.tolist(),
            )
        )
        off += nd
    return pd.DataFrame(rows, columns=[f.name for f in MERGED_POSTING_SCHEMA.fields])


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    seg_group_size: int = 8,
    n_buckets: int = 32,
) -> None:
    segs = spark.read.parquet(f"{index_dir}/segments/*/postings.parquet")
    grouped = segs.withColumn(
        "seg_group", (F.col("seg_id") / F.lit(seg_group_size)).cast("int")
    )
    merged = grouped.groupBy("term", "seg_group").applyInPandas(
        _merge_group, schema=MERGED_POSTING_SCHEMA
    )
    (
        merged.withColumn("term_bucket", F.pmod(F.hash("term"), F.lit(n_buckets)))
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{index_dir}/merged/postings")
    )

    final = spark.read.parquet(f"{index_dir}/merged/postings")
    dictionary = final.groupBy("term").agg(
        F.sum("n_docs").cast("long").alias("df"),
        F.sum("sum_freq").cast("long").alias("cf"),
    )
    dictionary.write.mode("overwrite").parquet(f"{index_dir}/merged/dictionary")

    norms = spark.read.parquet(f"{index_dir}/segments/*/norms.parquet")
    norms.write.mode("overwrite").parquet(f"{index_dir}/merged/norms")
