"""Per-partition segment build — the DWPT analog, resumable.

Lucene builds private per-thread segments with no contention and flushes
them independently (reference: index/DocumentsWriter.java:43-57,
DocumentsWriterPerThread.java). Here each Spark partition of the
doc-id-range-partitioned corpus builds one immutable segment:

    segments/seg-NNNNN/postings.parquet   block-compressed postings
    segments/seg-NNNNN/norms.parquet      (doc_id, dl, norm_byte)
    segments/seg-NNNNN/manifest.json      counters + lineage (commit point)
    stored/                               stored fields (pure-JVM write)

The manifest is written LAST via tmp+rename (the Lucene commit-point /
Solr UpdateLog-replay analog — IndexWriter.java:3407, UpdateLog.java:96):
a rerun skips partitions whose manifest exists, so the build resumes
from per-partition checkpoints. Segment contents are deterministic
(range partitioning over unique doc ids), so resume == fresh build.

Block rows carry the norm byte of every posting inline (norms binary),
making query-time scoring block-local — no norms join per query; this is
the analog of Lucene reading .nvd norms during per-segment scoring.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.smallfloat import int_to_byte4
from .builder import tokenized_docs
from .codec import CODEC_FORMAT

__all__ = [
    "build_segments",
    "build_segmented_index",
    "read_segmented_index",
    "SegmentedIndex",
    "MANIFEST_SCHEMA",
]

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("seg_id", T.IntegerType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("doc_count", T.LongType()),  # docs with >=1 token
        T.StructField("sum_ttf", T.LongType()),
        T.StructField("n_terms", T.LongType()),
        T.StructField("n_postings", T.LongType()),
        T.StructField("posting_bytes", T.LongType()),
        T.StructField("min_doc", T.LongType()),
        T.StructField("max_doc", T.LongType()),
        T.StructField("wall_sec", T.DoubleType()),
        T.StructField("resumed", T.BooleanType()),
    ]
)

_POSTING_COLS = [
    "term", "seg_id", "first_doc", "last_doc", "n_docs",
    "sum_freq", "docs", "freqs", "norms", "impact_freqs", "impact_norms",
    "positions",
]


def _postings_pa_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("term", pa.string()),
            ("seg_id", pa.int32()),
            ("first_doc", pa.int64()),
            ("last_doc", pa.int64()),
            ("n_docs", pa.int32()),
            ("sum_freq", pa.int64()),
            ("docs", pa.binary()),
            ("freqs", pa.binary()),
            ("norms", pa.binary()),
            ("impact_freqs", pa.list_(pa.int32())),
            ("impact_norms", pa.list_(pa.int32())),
            ("positions", pa.binary()),
        ]
    )


def _encode_segment_arrow(tbl, seg_id: int, index_positions: bool = False):
    """One segment's Arrow table (doc_id, tokens, stored…) → (postings
    pa.Table, norms pa.Table, counters). All heavy steps are Arrow C++ /
    numpy whole-array ops — no per-token Python objects:

    - list lengths via offsets diff,
    - term→code via pyarrow dictionary_encode (C++ hash),
    - (code, doc) sort + run-length → freqs,
    - block encode via codec.encode_posting_blocks_batch,
    - impacts emitted as one ListArray built from concatenated buffers.
    """
    import pyarrow as pa

    from ..functions.smallfloat import int_to_byte4
    from .codec import encode_posting_blocks_batch

    doc_ids = tbl.column("doc_id").to_numpy()
    toks = tbl.column("tokens")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy().astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    norm_bytes = int_to_byte4(lengths)
    norms_tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "dl": pa.array(lengths.astype(np.int32), pa.int32()),
            "norm_byte": pa.array(norm_bytes.astype(np.int32), pa.int32()),
            "seg_id": pa.array(np.full(len(doc_ids), seg_id, np.int32), pa.int32()),
        }
    )
    if int(lengths.sum()) == 0:
        empty = _postings_pa_schema().empty_table()
        return empty, norms_tbl, {
            "doc_count": 0, "sum_ttf": 0, "n_terms": 0, "n_postings": 0,
            "posting_bytes": 0,
        }
    flat = toks.flatten()
    dict_enc = flat.dictionary_encode()
    codes = dict_enc.indices.to_numpy().astype(np.int64)
    uniques = np.asarray(dict_enc.dictionary.to_pylist(), dtype=object)
    flat_docs = np.repeat(doc_ids, lengths)
    flat_norms = np.repeat(norm_bytes, lengths)
    # within-doc token index (position); lexsort is stable, so after the
    # (code, doc) sort each posting's occurrences stay position-ascending
    doc_tok_starts = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=doc_tok_starts[1:])
    flat_pos = np.arange(int(lengths.sum()), dtype=np.int64) - np.repeat(
        doc_tok_starts, lengths
    )

    order = np.lexsort((flat_docs, codes))
    c_s, d_s, n_s = codes[order], flat_docs[order], flat_norms[order]
    p_s = flat_pos[order]
    run_start = np.empty(len(c_s), dtype=bool)
    run_start[0] = True
    run_start[1:] = (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])
    rs = np.nonzero(run_start)[0]
    tf_freqs = np.diff(np.append(rs, len(c_s)))

    (bt, first, last, nd, sf, db, fb, nb, impf, impn, pb) = encode_posting_blocks_batch(
        c_s[rs], d_s[rs], tf_freqs, n_s[rs],
        positions=(p_s if index_positions else None),
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

    postings_tbl = pa.table(
        {
            "term": pa.array(uniques[bt], pa.string()),
            "seg_id": pa.array(np.full(len(bt), seg_id, np.int32), pa.int32()),
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
    counters = {
        "doc_count": int((lengths > 0).sum()),
        "sum_ttf": int(lengths.sum()),
        "n_terms": int(len(uniques)),
        "n_postings": int(len(rs)),
        "posting_bytes": int(sum(len(b) for b in db) + sum(len(b) for b in fb)),
    }
    return postings_tbl, norms_tbl, counters


def _segment_postings(
    pdf: pd.DataFrame, seg_id: int, index_positions: bool = False
) -> tuple:
    """One segment's docs (doc_id, tokens) → (postings pdf, norms pdf, counters)."""
    doc_ids = pdf["doc_id"].to_numpy()
    tokens = pdf["tokens"].tolist()
    lengths = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=len(tokens))
    norm_bytes = int_to_byte4(lengths)
    norms_pdf = pd.DataFrame(
        {"doc_id": doc_ids, "dl": lengths.astype(np.int32),
         "norm_byte": norm_bytes.astype(np.int32), "seg_id": np.int32(seg_id)}
    )
    if lengths.sum() == 0:
        return (
            pd.DataFrame(columns=_POSTING_COLS),
            norms_pdf,
            {"doc_count": 0, "sum_ttf": 0, "n_terms": 0, "n_postings": 0},
        )
    flat_docs = np.repeat(doc_ids, lengths)
    flat_norms = np.repeat(norm_bytes, lengths)
    flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in tokens if len(t)])
    doc_tok_starts = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=doc_tok_starts[1:])
    flat_pos = np.arange(int(lengths.sum()), dtype=np.int64) - np.repeat(
        doc_tok_starts, lengths
    )
    # (term, doc) freq: factorize + lexsort + run-length (all C-level)
    codes, uniques = pd.factorize(flat_terms, sort=True)
    order = np.lexsort((flat_docs, codes))
    c_s, d_s, n_s = codes[order], flat_docs[order], flat_norms[order]
    p_s = flat_pos[order]
    run_start = np.empty(len(c_s), dtype=bool)
    run_start[0] = True
    run_start[1:] = (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])
    rs = np.nonzero(run_start)[0]
    tf_codes, tf_docs, tf_norms = c_s[rs], d_s[rs], n_s[rs]
    tf_freqs = np.diff(np.append(rs, len(c_s)))
    postings_pdf = _blocks_to_pdf(
        uniques, tf_codes, tf_docs, tf_freqs, tf_norms, seg_id,
        positions=(p_s if index_positions else None),
    )
    counters = {
        "doc_count": int((lengths > 0).sum()),
        "sum_ttf": int(lengths.sum()),
        "n_terms": int(len(uniques)),
        "n_postings": int(len(rs)),
    }
    return postings_pdf, norms_pdf, counters


def _blocks_to_pdf(
    uniques, tf_codes, tf_docs, tf_freqs, tf_norms, seg_id, positions=None
):
    """Batch-encode (term-sorted) postings into the segment block frame."""
    from .codec import encode_posting_blocks_batch

    (bt, first, last, nd, sf, db, fb, nb, impf, impn, pb) = encode_posting_blocks_batch(
        tf_codes, tf_docs, tf_freqs, tf_norms, positions=positions
    )
    return pd.DataFrame(
        {
            "term": np.asarray(uniques, dtype=object)[bt],
            "seg_id": np.int32(seg_id),
            "first_doc": first,
            "last_doc": last,
            "n_docs": nd.astype(np.int32),
            "sum_freq": sf,
            "docs": db,
            "freqs": fb,
            "norms": nb,
            "impact_freqs": [x.tolist() for x in impf],
            "impact_norms": [x.tolist() for x in impn],
            "positions": pb,
        },
        columns=_POSTING_COLS,
    )


def build_segments(
    docs: DataFrame,
    index_dir: str,
    num_segments: int,
    fail_on_seg: int | None = None,
    already_ranged: bool = False,
    index_positions: bool = False,
    seg_id_base: int = 0,
    manifest_extra: dict | None = None,
) -> list:
    """Range-partition docs (doc_id, tokens, …) into segments and write
    each partition's segment files; resumable via manifests.

    already_ranged: the input partitions are already contiguous disjoint
    doc_id ranges in partition order (the with_doc_ids pipeline) — skip
    the redundant range shuffle and build one segment per partition.
    fail_on_seg: test hook — raise inside that segment (crash injection).
    seg_id_base: offset added to the partition id when naming segments —
    lets an incremental (NRT) build append new segments after existing
    ones (the Lucene SegmentInfos counter analog, index/SegmentInfos.java).
    manifest_extra: extra key/values persisted into each manifest.json
    (e.g. the streaming batch_id for lineage) — not part of the returned
    Arrow manifest rows.
    Returns the list of manifest dicts (one per non-empty partition).

    Each task writes its whole segment in one Arrow pass — postings and
    norms, then the manifest commit point. Only (doc_id, tokens) crosses
    into Python; nothing is cached in executor memory (the Lucene DWPT
    flush analog: DocumentsWriterPerThread builds its private segment
    and flushes its files together).
    """
    os.makedirs(f"{index_dir}/segments", exist_ok=True)
    if already_ranged:
        part = docs.select("doc_id", "tokens")
    else:
        part = docs.select("doc_id", "tokens").repartitionByRange(
            num_segments, "doc_id"
        ).sortWithinPartitions("doc_id")

    def write_segment(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        def manifest_batch(m):
            return pa.RecordBatch.from_pylist(
                [{f.name: m.get(f.name) for f in MANIFEST_SCHEMA.fields}],
                schema=pa.schema(
                    [
                        ("seg_id", pa.int32()),
                        ("n_docs", pa.int64()),
                        ("doc_count", pa.int64()),
                        ("sum_ttf", pa.int64()),
                        ("n_terms", pa.int64()),
                        ("n_postings", pa.int64()),
                        ("posting_bytes", pa.int64()),
                        ("min_doc", pa.int64()),
                        ("max_doc", pa.int64()),
                        ("wall_sec", pa.float64()),
                        ("resumed", pa.bool_()),
                    ]
                ),
            )

        t0 = time.time()
        seg_id = seg_id_base + TaskContext.get().partitionId()
        seg_dir = f"{index_dir}/segments/seg-{seg_id:05d}"
        manifest_path = f"{seg_dir}/manifest.json"
        if os.path.exists(manifest_path):  # checkpoint hit: skip rebuild
            with open(manifest_path) as f:
                m = json.load(f)
            seg_codec = m.pop("codec", "<none: pre-payload varint format>")
            if seg_codec != CODEC_FORMAT:
                raise ValueError(
                    f"segment {seg_id} at {seg_dir} uses codec "
                    f"{seg_codec!r}, this build writes {CODEC_FORMAT!r}; "
                    "delete the index dir and rebuild"
                )
            m["resumed"] = True
            for _ in batches:  # drain without building
                pass
            yield manifest_batch(m)
            return
        if fail_on_seg is not None and seg_id == fail_on_seg:
            # Crash-injection test hook. Wait for at least one sibling
            # segment to commit so the partial-build state is deterministic
            # (the job abort otherwise races the sibling tasks' manifests).
            deadline = time.time() + 60
            while time.time() < deadline:
                others = [
                    s
                    for s in os.listdir(f"{index_dir}/segments")
                    if s != f"seg-{seg_id:05d}"
                    and os.path.exists(f"{index_dir}/segments/{s}/manifest.json")
                ]
                if others:
                    break
                time.sleep(0.2)
            raise RuntimeError(f"injected failure in segment {seg_id}")
        chunks = [pa.Table.from_batches([b]) for b in batches]
        if not chunks:
            return
        tbl = pa.concat_tables(chunks).combine_chunks()
        if tbl.num_rows == 0:
            return
        postings, norms, counters = _encode_segment_arrow(
            tbl, seg_id, index_positions
        )
        os.makedirs(seg_dir, exist_ok=True)
        for name, out in (
            ("postings", postings),
            ("norms", norms),
        ):
            tmp = f"{seg_dir}/.{name}.parquet.tmp"
            pq.write_table(out, tmp)
            os.replace(tmp, f"{seg_dir}/{name}.parquet")
        doc_ids = tbl.column("doc_id").to_numpy()
        m = {
            "seg_id": seg_id,
            "n_docs": int(tbl.num_rows),
            "doc_count": counters["doc_count"],
            "sum_ttf": counters["sum_ttf"],
            "n_terms": counters["n_terms"],
            "n_postings": counters["n_postings"],
            "posting_bytes": counters["posting_bytes"],
            "min_doc": int(doc_ids.min()),
            "max_doc": int(doc_ids.max()),
            "wall_sec": time.time() - t0,
            "resumed": False,
        }
        tmp = f"{seg_dir}/.manifest.json.tmp"
        with open(tmp, "w") as f:
            json.dump({**m, **(manifest_extra or {}), "codec": CODEC_FORMAT}, f)
        os.replace(tmp, manifest_path)  # commit point
        yield manifest_batch(m)

    manifests = part.mapInArrow(write_segment, schema=MANIFEST_SCHEMA).collect()
    return [r.asDict() for r in manifests]


@dataclass
class SegmentedIndex:
    """The merged, at-rest index (SURVEY §7.1 step 4 output)."""

    blocks: DataFrame      # merged posting blocks (term_bucket-partitioned)
    dictionary: DataFrame  # (term, df, cf)
    norms: DataFrame       # (doc_id, dl, norm_byte)
    stored: DataFrame      # source rows + doc_id
    doc_count: int
    sum_total_term_freq: int
    max_doc: int
    n_buckets: int
    has_positions: bool = False
    # resident-searcher term-dictionary cache: term -> df (None =
    # known-absent). Lucene keeps the term dictionary's FST index
    # memory-resident per searcher; the Spark analog memoizes per-term
    # df lookups on the driver so a warm query launches no dictionary
    # job. The index is immutable (appends produce a NEW handle), so
    # entries never invalidate.
    df_cache: dict | None = None


def build_segmented_index(
    transcripts: DataFrame,
    index_dir: str,
    order_cols=("conv_id", "turn_idx"),
    text_col: str = "text",
    num_segments: int | None = None,
    analyzer: str = "standard",
    id_col: str | None = None,
    seg_group_size: int = 8,
    n_buckets: int = 32,
    fail_on_seg: int | None = None,
    index_positions: bool = False,
) -> SegmentedIndex:
    """Full pipeline: tokenize → per-partition segments (checkpointed) →
    salted merge → merged tables on disk → readable index.

    index_positions: also store within-doc token positions in the
    posting blocks (the DOCS_AND_FREQS_AND_POSITIONS IndexOptions analog
    — reference: index/IndexOptions.java, Lucene50PostingsFormat .pos) —
    required for index-backed phrase queries (search/phrase.py)."""
    from .merge import merge_segments  # local import: avoid cycle
    from .snapshot import (
        commit_snapshot,
        committed_segments,
        latest_snapshot,
        merged_dir_name,
    )

    spark = transcripts.sparkSession
    num_segments = num_segments or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    docs, order_cols, ranged = tokenized_docs(
        transcripts, order_cols, text_col, num_segments, analyzer, id_col
    )
    # stored fields: pure-JVM parquet write (no Python, scales linearly);
    # the tokens column never leaves the JVM for this copy (column
    # pruning removes the tokenizer UDF from this branch). The write is
    # independent of segment building — submit it on its own thread so
    # the two DAG branches share the executor pool concurrently, exactly
    # as Lucene's stored-fields writer streams alongside the postings
    # writer within one flush (index/StoredFieldsConsumer.java).
    from pyspark import InheritableThread

    stored_err: list = []

    def _write_stored():
        try:
            docs.drop("tokens").write.mode("overwrite").parquet(
                f"{index_dir}/stored"
            )
        except BaseException as e:
            stored_err.append(e)

    stored_thread = InheritableThread(target=_write_stored)
    stored_thread.start()
    try:
        manifests = build_segments(
            docs, index_dir, num_segments, fail_on_seg, already_ranged=ranged,
            index_positions=index_positions,
        )
    finally:
        stored_thread.join()
    if stored_err:
        raise stored_err[0]

    stats = {
        "doc_count": int(sum(m["doc_count"] for m in manifests)),
        "sum_total_term_freq": int(sum(m["sum_ttf"] for m in manifests)),
        "max_doc": int(sum(m["n_docs"] for m in manifests)),
        "n_segments": len(manifests),
        "n_buckets": n_buckets,
        "analyzer": analyzer,
        "positions": index_positions,
        "codec": CODEC_FORMAT,
    }
    # merge into a generation-scoped dir, THEN publish atomically: a
    # reader opening the index mid-merge resolves the previous snapshot
    # (or nothing) — never a half-written merged table
    prev = latest_snapshot(index_dir)
    gen = (prev["generation"] + 1) if prev else 0
    segments = committed_segments(index_dir)
    merged = merge_segments(
        spark, index_dir, seg_group_size, n_buckets,
        segments=segments, merged_name=merged_dir_name(gen),
    )
    with open(f"{index_dir}/stats.json", "w") as f:  # luke/debug convenience
        json.dump(stats, f)
    commit_snapshot(index_dir, gen, segments, stats, merged=merged)
    return read_segmented_index(spark, index_dir)


def read_segmented_index(spark: SparkSession, index_dir: str) -> SegmentedIndex:
    from .snapshot import latest_snapshot

    snap = latest_snapshot(index_dir)
    if snap is None:
        raise FileNotFoundError(
            f"no committed snapshot under {index_dir}/snapshots — the index "
            "was never published (build_segmented_index commits one after "
            "the merge)"
        )
    stats = snap["stats"]
    found = stats.get("codec", "<none: pre-payload varint format>")
    if found != CODEC_FORMAT:
        # fail loudly: a payload-format mismatch would otherwise decode
        # garbage silently (the header byte reinterprets old raw-varint
        # streams) — rebuild the index with the current code instead
        raise ValueError(
            f"index at {index_dir} uses codec {found!r}, this build reads "
            f"{CODEC_FORMAT!r}; rebuild the index"
        )
    merged = snap["merged"]
    norm_paths = [
        f"{index_dir}/segments/{s}/norms.parquet" for s in snap["segments"]
    ]
    return SegmentedIndex(
        blocks=spark.read.parquet(f"{index_dir}/{merged}/postings"),
        dictionary=spark.read.parquet(f"{index_dir}/{merged}/dictionary"),
        norms=spark.read.parquet(*norm_paths),
        stored=spark.read.parquet(f"{index_dir}/stored"),
        doc_count=stats["doc_count"],
        sum_total_term_freq=stats["sum_total_term_freq"],
        max_doc=stats["max_doc"],
        n_buckets=stats["n_buckets"],
        has_positions=stats.get("positions", False),
    )
