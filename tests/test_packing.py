"""Sequence packing (operators/packing.py): distributed prefix-sum
offsets vs a local reference, boundary stats, partition invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.packing import (
    pack_sequences,
    sequence_boundary_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    rng = np.random.RandomState(7)
    for i in range(200):
        n = int(rng.randint(0, 40))
        rows.append((i, " ".join("tok%d" % k for k in range(n))))
    rows.append((200, ""))       # zero-token doc
    rows.append((201, "   "))    # whitespace-only doc
    return spark.createDataFrame(rows, "doc_id long, text string")


def _reference(rows, L):
    out = {}
    off = 0
    for doc_id, text in sorted(rows):
        n = len([t for t in text.split() if t])
        first = off // L
        last = (off + max(n - 1, 0)) // L
        out[doc_id] = (n, off, first, last,
                       0 if n == 0 else last - first + 1)
        off += n
    return out


def test_pack_matches_reference(spark, docs):
    L = 64
    got = {r["doc_id"]: (r["n_tokens"], r["offset"], r["first_seq"],
                         r["last_seq"], r["n_seqs"])
           for r in pack_sequences(docs, L).collect()}
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    assert got == _reference(rows, L)


def test_partition_invariance(spark, docs):
    L = 50
    a = sorted(pack_sequences(docs, L, num_partitions=1).collect())
    b = sorted(pack_sequences(docs, L, num_partitions=13).collect())
    assert a == b


def test_boundary_stats(spark, docs):
    L = 64
    packed = pack_sequences(docs, L)
    stats = {r["seq_id"]: (r["n_docs_starting"], r["n_docs_spanning_in"])
             for r in sequence_boundary_stats(packed).collect()}
    # every nonempty doc starts exactly once
    total_starts = sum(v[0] for v in stats.values())
    n_nonempty = packed.filter(F.col("n_tokens") > 0).count()
    assert total_starts == n_nonempty
    # spans == sum over docs of (n_seqs - 1) for spanning docs
    total_spans = sum(v[1] for v in stats.values())
    expect_spans = (packed.filter(F.col("n_seqs") > 1)
                    .agg(F.sum(F.col("n_seqs") - 1)).collect()[0][0])
    assert total_spans == (expect_spans or 0)


def test_seq_len_validation(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)
