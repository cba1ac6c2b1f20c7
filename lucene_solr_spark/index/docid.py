"""Deterministic, partition-independent dense doc-id assignment.

Lucene assigns per-segment docIDs in ingestion order and remaps on merge
(reference: index/DocIDMerger.java:32,110). Our engine's canonical rule
(FIXTURES.md §1): ``doc_id = rank - 1`` over ``ORDER BY conv_id,
turn_idx`` — dense, deterministic, independent of input partitioning.

Scale note: a naive ``row_number() OVER (ORDER BY ...)`` collapses to a
single partition — unusable at 10^12 rows. Instead we:

1. range-repartition on the sort key (distributed sort),
2. count rows per partition (tiny driver-side prefix sum — one value per
   partition, NOT per row),
3. add ``offset[pid] + local_index`` via ``mapInPandas`` (narrow, Arrow).

Partition boundaries from range-partition sampling don't affect the ids:
each partition holds a contiguous, disjoint key range, so
offset + local rank == global rank regardless of where boundaries fall.
Requires the sort key to be unique (ours is: (conv_id, turn_idx)).
"""

from __future__ import annotations

import numpy as np
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["with_doc_ids"]


def with_doc_ids(
    df: DataFrame,
    order_cols=("conv_id", "turn_idx"),
    num_partitions: int | None = None,
    id_col: str = "doc_id",
    tokenizer=None,
    text_col: str = "text",
    tokens_col: str = "tokens",
    cache_registry: list | None = None,
) -> DataFrame:
    """Return df + dense int64 ``id_col`` ranking rows by ``order_cols``.

    tokenizer: optional callable(str) -> [token]. When given, a
    ``tokens_col`` column is computed INSIDE the same mapInPandas pass —
    one Python stage instead of two (id-assign + tokenize UDF would
    otherwise each cross the JVM↔Arrow↔Python boundary, and on a
    fully-subscribed local[N] box the extra worker wave is pure loss).

    cache_registry: if given, the internally persisted DataFrame is
    appended so a long-running caller (the NRT stream builds ids every
    micro-batch) can unpersist it once the ids are materialized.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ordered = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    ordered = ordered.persist()
    if cache_registry is not None:
        cache_registry.append(ordered)
    counts = (
        ordered.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets = {}
    acc = 0
    for pid in range(n):
        offsets[pid] = acc
        acc += by_pid.get(pid, 0)
    offsets_bc = spark.sparkContext.broadcast(offsets)

    extra = [T.StructField(id_col, T.LongType(), False)]
    if tokenizer is not None:
        extra.append(T.StructField(tokens_col, T.ArrayType(T.StringType()), False))
    out_schema = T.StructType(list(ordered.schema.fields) + extra)

    def assign(batches):
        pid = TaskContext.get().partitionId()
        base = offsets_bc.value[pid]
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf[id_col] = np.arange(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            if tokenizer is not None:
                pdf[tokens_col] = pdf[text_col].fillna("").map(tokenizer)
            yield pdf

    # materialization happens lazily; caller controls persistence. The
    # ordered cache stays alive for the mapInPandas pass (an explicit
    # unpersist here would re-trigger the range sampling).
    return ordered.mapInPandas(assign, schema=out_schema)
