"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed variant as the scale path — both declarative DataFrame
plans with JVM-native vector math (zip_with/aggregate run inside
codegen; no Python per row).

Scale notes (10^9+ vectors):
- brute force is a single narrow scan + TakeOrderedAndProject — it
  shuffles only k rows; right answer, linear cost.
- LSH: each vector is assigned a bucket once at indexing time (a cheap
  deterministic projection); a query probes its own bucket plus all
  buckets within hamming distance 1 (multiprobe) and ranks candidates
  exactly. The bucketed table would be written partitioned by bucket so
  a probe prunes to n_probe directories — same layout trick as the
  posting term_bucket partitioning.
- Lucene analog: none in the reference snapshot (Lucene HNSW landed in
  the same era; Solr's KnnStream is noted in SURVEY §2.4) — this is the
  training-pipeline extension surface.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cosine_sim_col",
    "cosine_topk",
    "lsh_plane_matrix",
    "lsh_bucket_col",
    "ann_lsh_topk",
    "embedding_near_dup_pairs",
]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_sim_col(vec_col: Column, query: Sequence[float]) -> Column:
    """cosine(vec, query) in double precision, JVM-native."""
    q = F.array(*[F.lit(float(v)) for v in query])
    qn = float(np.sqrt(np.sum(np.asarray(query, dtype=np.float64) ** 2)))
    return _dot(vec_col, q) / (_norm(vec_col) * F.lit(qn))


def cosine_topk(
    emb: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact brute-force cosine top-k: (vec_id, score) ordered by
    (score desc, vec_id asc). Score rounded for cross-engine stability."""
    return (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_sim_col(F.col(vec_col), query), round_to).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_plane_matrix(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (n_planes x dim, float64)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id of a vector under the given hyperplanes."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bucket = bucket + F.when(_dot(vec_col, p) > 0, F.lit(2 ** b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def ann_lsh_topk(
    emb: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    multiprobe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: probe the query's LSH bucket (+ all
    buckets within ``multiprobe_hamming`` bit flips), rank candidates by
    exact cosine. Recall/cost tradeoff via n_planes and multiprobe."""
    planes = lsh_plane_matrix(len(query), n_planes, seed)
    qv = np.asarray(query, dtype=np.float64)
    q_bucket = int(sum((1 << b) for b in range(n_planes) if planes[b] @ qv > 0))
    probes = {q_bucket}
    if multiprobe_hamming >= 1:
        probes |= {q_bucket ^ (1 << b) for b in range(n_planes)}
    if multiprobe_hamming >= 2:
        probes |= {
            q_bucket ^ (1 << b1) ^ (1 << b2)
            for b1 in range(n_planes)
            for b2 in range(b1 + 1, n_planes)
        }
    cand = emb.withColumn("bucket", lsh_bucket_col(F.col(vec_col), planes)).filter(
        F.col("bucket").isin(sorted(probes))
    )
    return (
        cand.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_sim_col(F.col(vec_col), query), round_to).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """(vec_a, vec_b, cosine) pairs with cosine >= threshold, found via
    LSH self-join (same-bucket candidates only) + exact verification.
    With multiprobe-0 banding this trades recall for a bounded join."""
    planes = lsh_plane_matrix(
        emb.select(F.size(vec_col)).first()[0], n_planes, seed
    )
    b = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    a2, b2 = b.alias("a"), b.alias("b")
    cand = a2.join(
        b2,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(
            _dot(F.col("a.v"), F.col("b.v"))
            / (_norm(F.col("a.v")) * _norm(F.col("b.v"))),
            round_to,
        ).alias("cosine"),
    )
    return cand.filter(F.col("cosine") >= threshold)
