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

Output layout (the "at-rest" index, one dir per merge generation —
published atomically by a snapshot commit, see snapshot.py):
    merged-<gen>/postings/    parquet, partitioned by term_bucket → a
                              query for a few terms prunes to a few
                              directories
    merged-<gen>/dictionary/  (term, df, cf)
    (norms stay in segments/*/norms.parquet — disjoint doc ranges are
    already a valid partitioned table; no rewrite needed)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.hashing import h60
from .codec import decode_payloads, decode_vints, encode_posting_blocks_batch

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
        T.StructField("positions", T.BinaryType()),
    ]
)


def term_bucket_col(term_col, n_buckets: int):
    """JVM-native portable bucket id: h60(term) mod n_buckets."""
    return F.pmod(h60(term_col), F.lit(n_buckets)).cast("int")


def _merge_group(tbl: pa.Table) -> pa.Table:
    """All segment blocks of one (term_bucket, seg_group), as an Arrow
    table: batch-decode, concatenate per term in doc order, batch
    re-encode into 128-posting blocks. Segments are disjoint doc ranges,
    so sorting blocks by (term, first_doc) yields globally sorted
    postings per term. Arrow end-to-end — term codes via C++
    dictionary_encode, block payloads batch-decoded per payload class
    (one varint pass over concatenated varint bodies; one
    unpackbits+matmul per distinct FOR bit width — codec.decode_payloads)."""
    bucket = tbl.column("term_bucket")[0].as_py()
    seg_group = tbl.column("seg_group")[0].as_py()
    order = pc.sort_indices(
        tbl, sort_keys=[("term", "ascending"), ("first_doc", "ascending")]
    )
    tbl = tbl.take(order).combine_chunks()
    counts = tbl.column("n_docs").to_numpy().astype(np.int64)
    dict_enc = tbl.column("term").combine_chunks().dictionary_encode()
    codes = dict_enc.indices.to_numpy().astype(np.int64)
    uniques = np.asarray(dict_enc.dictionary.to_pylist(), dtype=object)

    def _concat_bin(col):
        return b"".join(tbl.column(col).to_pylist())

    gaps = decode_payloads(tbl.column("docs").to_pylist()).astype(np.int64)
    freqs = decode_payloads(tbl.column("freqs").to_pylist()).astype(np.int64)
    norms = np.frombuffer(_concat_bin("norms"), dtype=np.uint8).astype(np.int64)
    # segmented cumsum: absolute doc at each block start
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    cs = np.cumsum(gaps)
    base = np.repeat(cs[starts] - gaps[starts], counts)
    docs = cs - base
    flat_codes = np.repeat(codes, counts)
    # positions (if indexed): decode the concatenated per-posting delta
    # streams once, rebuild absolutes per posting, re-encode under the
    # new block boundaries. Input blocks arrive sorted by (term,
    # first_doc) and postings within a block are doc-ascending, so the
    # concatenated occurrence stream is already in final posting order.
    positions = None
    pos_concat = _concat_bin("positions")
    if len(pos_concat):
        pos_gaps = decode_vints(pos_concat).astype(np.int64)
        pstarts = np.zeros(len(freqs), dtype=np.int64)
        np.cumsum(freqs[:-1], out=pstarts[1:])
        pcs = np.cumsum(pos_gaps)
        pbase = np.repeat(pcs[pstarts] - pos_gaps[pstarts], freqs)
        positions = pcs - pbase
    (bt, first, last, nd, sf, db, fb, nb, impf, impn, pb) = encode_posting_blocks_batch(
        flat_codes, docs, freqs, norms, positions=positions
    )
    def _list_arr(parts):
        lens = np.fromiter((len(p) for p in parts), dtype=np.int64, count=len(parts))
        off = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        vals = (
            np.concatenate(parts).astype(np.int32)
            if parts
            else np.empty(0, np.int32)
        )
        return pa.ListArray.from_arrays(
            pa.array(off, pa.int32()), pa.array(vals, pa.int32())
        )

    nblk = len(bt)
    return pa.table(
        {
            "term": pa.array(uniques[bt], pa.string()),
            "term_bucket": pa.array(np.full(nblk, bucket, np.int32), pa.int32()),
            "seg_group": pa.array(np.full(nblk, seg_group, np.int32), pa.int32()),
            "first_doc": pa.array(first, pa.int64()),
            "last_doc": pa.array(last, pa.int64()),
            "n_docs": pa.array(nd.astype(np.int32), pa.int32()),
            "sum_freq": pa.array(sf.astype(np.int64), pa.int64()),
            "docs": pa.array(db, pa.binary()),
            "freqs": pa.array(fb, pa.binary()),
            "norms": pa.array(nb, pa.binary()),
            "impact_freqs": _list_arr(impf),
            "impact_norms": _list_arr(impn),
            "positions": pa.array(pb, pa.binary()),
        }
    )


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    seg_group_size: int = 8,
    n_buckets: int = 32,
    segments: list | None = None,
    merged_name: str = "merged-0000000000",
) -> str:
    """Merge the given committed segments into ``index_dir/<merged_name>``.

    segments: committed segment dir names (defaults to every segment
    with a manifest — NEVER a glob: a crashed builder task can leave an
    orphan postings.parquet with no manifest, and a glob would merge it).
    The output dir is generation-scoped; the caller publishes it by
    committing a snapshot (snapshot.py) AFTER this returns — a killed
    merge leaves an unreferenced directory, not a broken index.
    Returns merged_name."""
    from .snapshot import committed_segments

    if segments is None:
        segments = committed_segments(index_dir)
    paths = [f"{index_dir}/segments/{s}/postings.parquet" for s in segments]
    segs = spark.read.parquet(*paths)
    grouped = segs.withColumn(
        "seg_group", (F.col("seg_id") / F.lit(seg_group_size)).cast("int")
    ).withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))
    merged = grouped.groupBy("term_bucket", "seg_group").applyInArrow(
        _merge_group, schema=MERGED_POSTING_SCHEMA
    )

    # The dictionary aggregates from the PRE-merge segment blocks: block
    # re-encoding is a pure re-blocking, so per-term sum(n_docs) and
    # sum(sum_freq) are invariant under it (verified end-to-end by the
    # fts_bm25_* gates — WAND scores take df from this dictionary and
    # must hash-match the raw-text DuckDB oracle — and by
    # test_segments_wand's float32 parity). Sourcing it from `segs`
    # (a) drops a full re-read
    # of the merged output and (b) makes the dictionary job independent
    # of the postings write, so both jobs are submitted CONCURRENTLY —
    # separate DAG branches sharing the executor pool, the Spark analog
    # of Lucene's merge writing .tim/.doc streams in one pass.
    dictionary = segs.groupBy("term").agg(
        F.sum("n_docs").cast("long").alias("df"),
        F.sum("sum_freq").cast("long").alias("cf"),
    ).withColumn("term_bucket", term_bucket_col(F.col("term"), n_buckets))

    dict_err: list = []

    def _write_dictionary():
        try:
            (
                dictionary.write.mode("overwrite")
                .partitionBy("term_bucket")
                .parquet(f"{index_dir}/{merged_name}/dictionary")
            )
        except BaseException as e:  # propagate into the caller thread
            dict_err.append(e)

    from pyspark import InheritableThread

    dict_thread = InheritableThread(target=_write_dictionary)
    dict_thread.start()
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(f"{index_dir}/{merged_name}/postings")
        )
    finally:
        dict_thread.join()
    if dict_err:
        raise dict_err[0]
    # norms stay in their per-segment files (disjoint doc ranges — already
    # a valid partitioned table); readers take the file list from the
    # snapshot's segment list
    return merged_name
