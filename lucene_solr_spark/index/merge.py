"""Segment merge: sort-shuffle with structural salting for hot terms.

Lucene merges segments in the background, remapping docIDs and
concatenating postings per term (reference: index/TieredMergePolicy.java,
index/DocIDMerger.java). Our docIDs are already global, so merging a
term's postings is pure re-blocking — but a Zipf-head term's posting
list at 10^12-doc scale is far too large for one reducer.

The salt is STRUCTURAL, not random: the shuffle key is
``(term_bucket, seg_group)`` where ``seg_group = seg_id //
seg_group_size``. Segments hold contiguous disjoint doc-id ranges
(range-partitioned), so each group's postings are a contiguous doc-range
slice of a term's final posting list: reducers re-encode their slice
into optimal 128-posting blocks independently, no cross-group
coordination, and the concatenation of groups (ordered by first_doc) IS
the merged list. Per-reducer work is bounded by seg_group_size segments
regardless of a term's total df — hot-term skew is defused by
construction (the explicit analog of AQE skew-split, which stays on as a
backstop). Grouping by term_bucket (not term) keeps reducer count
bounded and lets the whole group be re-encoded in one vectorized
multi-term pass (codec.encode_posting_blocks_batch) instead of one
Python invocation per term.

term_bucket = h60(term) mod n_buckets (the md5-derived portable hash) —
computable driver-side with hashlib, so query planning prunes partitions
without running a Spark job.

Output layout (the "at-rest" index):
    merged/postings/    parquet, partitioned by term_bucket → a query
                        for a few terms prunes to a few directories
    merged/dictionary/  (term, df, cf)
    (norms stay in segments/*/norms.parquet — disjoint doc ranges are
    already a valid partitioned table; no rewrite needed)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.hashing import h60
from .codec import decode_vints, encode_posting_blocks_batch

__all__ = ["merge_segments", "MERGED_POSTING_SCHEMA", "term_bucket_col"]

MERGED_POSTING_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("term_bucket", T.IntegerType()),
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


def term_bucket_col(term_col, n_buckets: int):
    """JVM-native portable bucket id: h60(term) mod n_buckets."""
    return F.pmod(h60(term_col), F.lit(n_buckets)).cast("int")


def _merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """All segment blocks of one (term_bucket, seg_group): batch-decode,
    concatenate per term in doc order, batch re-encode into 128-posting
    blocks. Segments are disjoint doc ranges, so sorting blocks by
    (term, first_doc) yields globally sorted postings per term."""
    bucket = int(pdf["term_bucket"].iloc[0])
    seg_group = int(pdf["seg_group"].iloc[0])
    pdf = pdf.sort_values(["term", "first_doc"], kind="mergesort")
    counts = pdf["n_docs"].to_numpy().astype(np.int64)
    codes, uniques = pd.factorize(pdf["term"].to_numpy(), sort=False)
    # varints are self-delimiting → decode all blocks in ONE pass
    gaps = decode_vints(b"".join(pdf["docs"])).astype(np.int64)
    freqs = decode_vints(b"".join(pdf["freqs"])).astype(np.int64)
    norms = np.frombuffer(b"".join(pdf["norms"]), dtype=np.uint8).astype(np.int64)
    # segmented cumsum: absolute doc at each block start
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    cs = np.cumsum(gaps)
    base = np.repeat(cs[starts] - gaps[starts], counts)
    docs = cs - base
    flat_codes = np.repeat(codes, counts)
    (bt, first, last, nd, sf, db, fb, nb, impf, impn) = encode_posting_blocks_batch(
        flat_codes, docs, freqs, norms
    )
    return pd.DataFrame(
        {
            "term": np.asarray(uniques, dtype=object)[bt],
            "term_bucket": np.int32(bucket),
            "seg_group": np.int32(seg_group),
            "first_doc": first,
            "last_doc": last,
            "n_docs": nd.astype(np.int32),
            "sum_freq": sf,
            "docs": db,
            "freqs": fb,
            "norms": nb,
            "impact_freqs": [x.tolist() for x in impf],
            "impact_norms": [x.tolist() for x in impn],
        },
        columns=[f.name for f in MERGED_POSTING_SCHEMA.fields],
    )


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    seg_group_size: int = 8,
    n_buckets: int = 32,
) -> None:
    segs = spark.read.parquet(f"{index_dir}/segments/*/postings.parquet")
    grouped = segs.withColumn(
        "seg_group", (F.col("seg_id") / F.lit(seg_group_size)).cast("int")
    ).withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))
    merged = grouped.groupBy("term_bucket", "seg_group").applyInPandas(
        _merge_group, schema=MERGED_POSTING_SCHEMA
    )
    (
        merged.write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{index_dir}/merged/postings")
    )

    final = spark.read.parquet(f"{index_dir}/merged/postings")
    dictionary = final.groupBy("term").agg(
        F.sum("n_docs").cast("long").alias("df"),
        F.sum("sum_freq").cast("long").alias("cf"),
    ).withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))
    (
        dictionary.write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{index_dir}/merged/dictionary")
    )
    # norms stay in their per-segment files (disjoint doc ranges — already
    # a valid partitioned table); readers glob segments/*/norms.parquet
