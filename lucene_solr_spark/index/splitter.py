"""Index-splitting tools — the lucene/misc maintenance utilities that
carve an EXISTING index into parts without re-analyzing any text.

Reference: lucene/misc/src/java/org/apache/lucene/index/
{PKIndexSplitter,MultiPassIndexSplitter}.java.

- PKIndexSplitter (:49-120): two outputs — documents matching a query
  (or a primary-key mid-term range) land in the first index, everything
  else in the second; realized there as delete-the-complement +
  addIndexes.
- MultiPassIndexSplitter (:53-108): N equal parts; ``seq=True`` gives
  sequential docID ranges [i·maxDoc/N, (i+1)·maxDoc/N) with the LAST
  part absorbing the integer-rounding remainder (:78-90), otherwise
  deterministic round-robin — doc j lands in part i iff
  ``(j + numParts - i) % numParts == 0``, i.e. ``j % N == i % N``
  (:93-96).

Spark-first realization: a split never touches text — it filters the
at-rest postings/norms/docmap/stored tables by a doc predicate and
recomputes the derived statistics (dictionary df/cf via one hash
aggregation over the filtered postings; doc_count/sumTTF via one
aggregate over the filtered norms), which is exactly the state the
reference's deletes-then-merge produces. Per-doc data (freq, positions,
norm bytes, stored fields) is carried over untouched.

Scale shape: each part is one filtered scan + one partial/final
aggregation — no re-tokenization, no driver data, and the doc
predicate pushes into the parquet scan of every table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .builder import IndexTables

__all__ = ["filter_index", "pk_index_splitter", "multi_pass_index_splitter", "merge_indexes"]


def filter_index(tables: IndexTables, keep: Column) -> IndexTables:
    """A child IndexTables containing exactly the parent docs where
    ``keep`` (a predicate over doc_id) holds, with statistics
    recomputed to match an index that only ever held those docs."""
    postings = tables.postings.filter(keep)
    norms = tables.norms.filter(keep)
    dictionary = postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("freq").alias("cf")
    )
    stats = norms.select(
        F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("doc_count"),
        F.sum("dl").alias("sum_ttf"),
        F.count("*").alias("max_doc"),
    ).collect()[0]
    child = IndexTables(
        postings=postings,
        dictionary=dictionary,
        norms=norms,
        docmap=tables.docmap.filter(keep),
        stored=tables.stored.filter(keep),
        doc_count=int(stats["doc_count"] or 0),
        sum_total_term_freq=int(stats["sum_ttf"] or 0),
    )
    child.set_max_doc(int(stats["max_doc"] or 0))
    return child


def pk_index_splitter(tables: IndexTables, docs_in_first: Column):
    """PKIndexSplitter: (matching, complement) child indexes."""
    return (
        filter_index(tables, docs_in_first),
        filter_index(tables, ~docs_in_first),
    )


def multi_pass_index_splitter(
    tables: IndexTables, num_parts: int, seq: bool = False
):
    """MultiPassIndexSplitter: ``num_parts`` child indexes by
    sequential docID range (last part takes the rounding remainder) or
    round-robin on docID."""
    if num_parts < 2:
        raise ValueError("num_parts must be >= 2")
    parts = []
    if seq:
        part_len = tables.max_doc // num_parts
        for i in range(num_parts):
            lo = part_len * i
            hi = lo + part_len
            pred = F.col("doc_id") >= lo
            if i < num_parts - 1:
                pred = pred & (F.col("doc_id") < hi)
            parts.append(filter_index(tables, pred))
    else:
        for i in range(num_parts):
            parts.append(
                filter_index(
                    tables, F.col("doc_id") % num_parts == i % num_parts
                )
            )
    return parts


def merge_indexes(shards) -> IndexTables:
    """IndexMergeTool (misc/.../misc/IndexMergeTool.java: addIndexes
    then forceMerge): materialize N shard indexes into ONE index whose
    stats equal a fresh build of the union.  Doc ids are re-based by
    the running max_doc exactly like MultiReader's docBase starts
    (multireader.py), but here the union is MATERIALIZED — postings /
    norms / stored are unioned frames and the dictionary is re-agged,
    so the result needs no composite-reader dispatch at query time.
    Shard id-density is validated the same way multireader validates
    (a shard whose max(doc_id)+1 exceeds its declared max_doc would
    silently collide after re-basing)."""
    if not shards:
        raise ValueError("merge_indexes needs at least one shard")

    def rebase(df, base):
        return df.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(base)).cast("long")
        )

    base = 0
    postings = norms = docmap = stored = None
    for sh in shards:
        top = sh.norms.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
        declared = sh.max_doc
        if top is not None and int(top) >= declared:
            raise ValueError(
                f"shard declares max_doc={declared} but has doc_id={top}; "
                "doc ids are not dense 0-based — rebasing would collide"
            )
        p, n = rebase(sh.postings, base), rebase(sh.norms, base)
        d, s = rebase(sh.docmap, base), rebase(sh.stored, base)
        postings = p if postings is None else postings.unionByName(p)
        norms = n if norms is None else norms.unionByName(n)
        docmap = d if docmap is None else docmap.unionByName(d)
        stored = s if stored is None else stored.unionByName(s)
        base += declared
    dictionary = postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("freq").alias("cf")
    )
    merged = IndexTables(
        postings=postings,
        dictionary=dictionary,
        norms=norms,
        docmap=docmap,
        stored=stored,
        doc_count=sum(sh.doc_count for sh in shards),
        sum_total_term_freq=sum(sh.sum_total_term_freq for sh in shards),
    )
    merged.set_max_doc(base)
    return merged
