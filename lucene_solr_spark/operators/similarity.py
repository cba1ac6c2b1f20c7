"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exact baseline, and a random-hyperplane
LSH-bucketed variant as the scale path — both declarative DataFrame
plans with JVM-native vector math (zip_with/aggregate run inside
codegen; no Python per row).

Scale notes (10^9+ vectors):
- brute force is a single narrow scan + TakeOrderedAndProject — it
  shuffles only k rows; right answer, linear cost.
- LSH: each vector is assigned a bucket ONCE at indexing time and the
  vector table is written partitioned by bucket (build_ann_index) —
  the same at-rest layout trick as the posting term_bucket
  partitioning. A query resolves its probe buckets driver-side and
  reads only those partition directories (ann_index_topk asserts
  PartitionFilters in tests): probe I/O is |probes|/2^n_planes of the
  corpus, not a full scan.
- Hyperplanes are DERIVED from the portable h60 hash (integer weights
  in [-1000, 1000], h60_plane_matrix) and the bucket sign uses
  per-term-rounded DECIMAL sums — bit-identical in numpy, Spark and
  ANSI SQL, so the DuckDB oracle recomputes identical buckets.
- Lucene analog: none in the reference snapshot (Lucene HNSW landed in
  the same era; Solr's KnnStream is noted in SURVEY §2.4) — this is the
  training-pipeline extension surface.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .hashing import h60_py

__all__ = [
    "cosine_sim_col",
    "cosine_topk",
    "int8_dequantized",
    "int8_cosine_topk",
    "h60_plane_matrix",
    "lsh_bucket_col",
    "lsh_bucket_py",
    "probe_buckets",
    "build_ann_index",
    "ann_index_topk",
    "ann_lsh_topk",
    "embedding_near_dup_pairs",
    "ivf_assign_col",
    "train_ivf_centroids",
    "build_ivf_index",
    "ivf_index_topk",
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


def h60_plane_matrix(dim: int, n_planes: int = 8) -> np.ndarray:
    """Deterministic hyperplanes with integer weights in [-1000, 1000],
    derived from the portable h60 hash: w[p][i] = (h60('plane{p}:{i+1}')
    mod 2001) - 1000 (i is 1-based in the domain string to match SQL's
    1-based array indexing). Sign-random-projection needs only a
    symmetric weight distribution, and integer weights make the bucket
    sign exactly reproducible in ANSI SQL."""
    return np.array(
        [
            [(h60_py(f"plane{p}:{i + 1}") % 2001) - 1000 for i in range(dim)]
            for p in range(n_planes)
        ],
        dtype=np.float64,
    )


def _dot_exact(a: Column, plane: np.ndarray) -> Column:
    """Σ_i round(a_i * w_i, 9) as DECIMAL — order-independent, identical
    in Spark / DuckDB / numpy (used only for the bucket SIGN, where a
    float-associativity flip at the boundary would diverge engines).

    This exactness is an ORACLE requirement, not an index-quality one:
    a boundary flip only moves a vector to the adjacent bucket, which
    changes nothing about recall. A production deployment without a
    cross-engine checker should swap this for a plain-double
    ``F.aggregate`` (or the numpy matmul in h60_plane_matrix) — same
    buckets for all but ~1-in-10^9 boundary vectors, and the DECIMAL
    quantization cost (n_planes × dim rounds per vector) disappears
    from the index build."""
    p = F.array(*[F.lit(float(v)) for v in plane])
    zero = F.lit(0).cast("decimal(28,9)")
    return F.aggregate(
        F.zip_with(
            a, p, lambda x, y: F.round(x.cast("double") * y, 9).cast("decimal(28,9)")
        ),
        zero,
        # re-cast: decimal add widens to (29,9) per step; values are
        # bounded by dim*1000 so (28,9) never overflows
        lambda acc, x: (acc + x).cast("decimal(28,9)"),
    )


def lsh_bucket_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id of a vector under the given hyperplanes
    (exact DECIMAL dot — cross-engine-reproducible)."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        bucket = bucket + F.when(
            _dot_exact(vec_col, plane) > 0, F.lit(2 ** b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_bucket_py(vec: Sequence[float], planes: np.ndarray) -> int:
    """Driver-side replica of lsh_bucket_col for a single vector. Uses
    exact Decimal HALF_UP at 9dp — bit-identical to Spark's ROUND
    (BigDecimal HALF_UP over the exact binary double), so the query's
    bucket matches the bucket Spark/SQL assigns to the same vector."""
    from decimal import ROUND_HALF_UP, Decimal

    q9 = Decimal("1E-9")
    v = np.asarray(vec, dtype=np.float64)
    bucket = 0
    for b in range(planes.shape[0]):
        prods = v * planes[b]
        total = sum(
            Decimal(float(x)).quantize(q9, rounding=ROUND_HALF_UP) for x in prods
        )
        if total > 0:
            bucket |= 1 << b
    return bucket


def probe_buckets(q_bucket: int, n_planes: int, multiprobe_hamming: int = 1) -> list:
    """The query bucket plus every bucket within hamming distance
    ``multiprobe_hamming`` bit flips."""
    probes = {q_bucket}
    if multiprobe_hamming >= 1:
        probes |= {q_bucket ^ (1 << b) for b in range(n_planes)}
    if multiprobe_hamming >= 2:
        probes |= {
            q_bucket ^ (1 << b1) ^ (1 << b2)
            for b1 in range(n_planes)
            for b2 in range(b1 + 1, n_planes)
        }
    return sorted(probes)


def _ann_delta_name(generation: int) -> str:
    return f"vecs-{generation:08d}"


def _ann_snapshot(index_dir: str) -> dict:
    """Latest committed ANN generation (index/snapshot.py model). Falls
    back to the pre-generation single-dir layout (vectors/ + meta.json)
    for indexes built before the snapshot integration."""
    from ..index.snapshot import latest_snapshot

    snap = latest_snapshot(index_dir)
    if snap is not None:
        return snap
    if os.path.exists(f"{index_dir}/meta.json"):
        with open(f"{index_dir}/meta.json") as f:
            return {"generation": 0, "segments": ["vectors"],
                    "stats": json.load(f)}
    raise FileNotFoundError(
        f"no committed ANN snapshot under {index_dir} — the index was "
        "never published (build_ann_index / build_ivf_index commits one)"
    )


def _ann_union(spark: SparkSession, index_dir: str, snap: dict) -> DataFrame:
    """Union of the snapshot's delta dirs — each read is its own
    partition-pruned scan (the per-segment LeafReader analog; Spark
    cannot partition-discover across multiple roots, so the union IS
    the multi-segment read)."""
    dfs = [spark.read.parquet(f"{index_dir}/{s}") for s in snap["segments"]]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def build_ann_index(
    emb: DataFrame,
    index_dir: str,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """At-rest ANN index: the vector table written ONCE partitioned by
    LSH bucket (the term_bucket layout trick applied to embeddings), so
    a probe is a partition-pruned read of |probes| directories instead
    of a full scan.

    Published through the same atomic generation snapshots as the text
    segments (index/snapshot.py — SegmentInfos analog): the bucketed
    delta dir is written first, then ``snapshots/snap-<gen>.json`` via
    tmp+rename. Incremental adds go through ann_index_append; a reader
    mid-append keeps resolving the previous generation."""
    first = emb.select(F.size(vec_col)).first()
    if first is None:
        raise ValueError("cannot build an ANN index over an empty table")
    dim = first[0]
    planes = h60_plane_matrix(dim, n_planes)
    _write_lsh_delta(emb, index_dir, _ann_delta_name(0), planes,
                     id_col, vec_col)
    from ..index.snapshot import commit_snapshot

    commit_snapshot(
        index_dir, 0, segments=[_ann_delta_name(0)],
        stats={"format": "ann-lsh", "n_planes": n_planes, "dim": dim},
    )


def _write_lsh_delta(
    emb: DataFrame, index_dir: str, delta: str, planes: np.ndarray,
    id_col: str, vec_col: str,
) -> None:
    (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{index_dir}/{delta}")
    )


def ann_index_append(
    emb: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Append vectors to a published LSH index as a new generation:
    bucket the new rows under the INDEX's frozen hyperplanes, write them
    as a fresh delta dir, then commit a snapshot listing old + new
    deltas. Returns the new generation. Concurrent readers holding the
    previous snapshot are unaffected (its files are never touched) —
    the same publish rule as text-segment NRT appends."""
    from ..index.snapshot import commit_snapshot

    snap = _ann_snapshot(index_dir)
    stats = snap["stats"]
    if stats.get("format", "ann-lsh") != "ann-lsh":
        raise ValueError(f"not an LSH ANN index: {stats.get('format')!r}")
    planes = h60_plane_matrix(stats["dim"], stats["n_planes"])
    gen = snap["generation"] + 1
    delta = _ann_delta_name(gen)
    _write_lsh_delta(emb, index_dir, delta, planes, id_col, vec_col)
    commit_snapshot(
        index_dir, gen, segments=list(snap["segments"]) + [delta],
        stats=stats,
    )
    return gen


def ann_index_topk(
    spark: SparkSession,
    index_dir: str,
    query: Sequence[float],
    k: int = 10,
    multiprobe_hamming: int = 1,
    round_to: int = 4,
) -> DataFrame:
    """Probe the at-rest index: the probe set is resolved driver-side
    (numpy bucket of the query — no Spark job), and the bucket filter
    lands in PartitionFilters of every delta scan, pruning unread
    directories."""
    snap = _ann_snapshot(index_dir)
    meta = snap["stats"]
    planes = h60_plane_matrix(meta["dim"], meta["n_planes"])
    probes = probe_buckets(
        lsh_bucket_py(query, planes), meta["n_planes"], multiprobe_hamming
    )
    cand = _ann_union(spark, index_dir, snap).filter(
        F.col("bucket").isin(probes)
    )
    return (
        cand.select(
            "vec_id",
            F.round(cosine_sim_col(F.col("embedding"), query), round_to).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )


def ann_lsh_topk(
    emb: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 12,
    multiprobe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Index-free variant of ann_index_topk (bucket computed in the
    scan): same candidates and ranking, for when no at-rest index
    exists. At scale prefer build_ann_index + ann_index_topk, which
    prunes I/O instead of scanning every vector."""
    planes = h60_plane_matrix(len(query), n_planes)
    probes = probe_buckets(
        lsh_bucket_py(query, planes), n_planes, multiprobe_hamming
    )
    cand = emb.withColumn("bucket", lsh_bucket_col(F.col(vec_col), planes)).filter(
        F.col("bucket").isin(probes)
    )
    return (
        cand.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_sim_col(F.col(vec_col), query), round_to).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )


# ------------------------------------------------------------------- IVF
# Inverted-file ANN: a coarse quantizer assigns every vector to its
# nearest centroid ONCE at indexing time; the vector table is written
# partitioned by centroid_id (the same at-rest layout as the LSH index
# and the posting term_bucket), and a query probes only the top-nprobe
# centroid partitions then exact-reranks. Centroid SOURCES: the default
# "trained" runs spherical k-means driver-side on a deterministic
# h60-ordered sample and broadcasts the K×dim matrix back (the textlogit
# weight-vector pattern — data never moves, the model does), giving
# data-order-independent cells; "first_k" (first K corpus vectors) is
# kept because it is exactly reproducible in ANSI SQL, which the
# driver-gate DuckDB oracle requires. Every other piece (assignment
# plan, at-rest layout, pruned probe, rerank) is identical whichever
# centroid source is used; recall@10 of both is measured in
# tests/test_training_ops.py.


def _cos_exact_9(vec_col: Column, centroid: np.ndarray, c_norm: float) -> Column:
    """round(cos(vec, centroid), 9) with an order-independent DECIMAL
    dot — assignment argmax is bit-identical in Spark / SQL / driver."""
    return F.round(
        _dot_exact(vec_col, centroid).cast("double") / F.lit(c_norm), 9
    )


def _exact_norm_py(v: np.ndarray) -> float:
    """sqrt of the per-term-rounded DECIMAL sum of squares — the driver
    replica of the SQL/Spark centroid-norm expression."""
    from decimal import ROUND_HALF_UP, Decimal

    q9 = Decimal("1E-9")
    return float(
        np.sqrt(
            float(
                sum(
                    Decimal(float(x)).quantize(q9, rounding=ROUND_HALF_UP)
                    for x in v * v
                )
            )
        )
    )


def _ivf_scores_py(query: Sequence[float], centroids) -> list:
    """[(score, centroid_id)] of the query against each centroid —
    driver-side replica of _cos_exact_9 (Decimal HALF_UP throughout)."""
    from decimal import ROUND_HALF_UP, Decimal

    q9 = Decimal("1E-9")
    q = np.asarray(query, dtype=np.float64)
    out = []
    for cid, cv, cn in centroids:
        dot = float(
            sum(
                Decimal(float(x)).quantize(q9, rounding=ROUND_HALF_UP)
                for x in q * cv
            )
        )
        s = float(Decimal(dot / cn).quantize(q9, rounding=ROUND_HALF_UP))
        out.append((s, cid))
    return out


def _centroid_rows(emb: DataFrame, n_centroids: int, id_col: str, vec_col: str):
    rows = (
        emb.filter(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("c"), F.col(vec_col).alias("v"))
        .collect()
    )
    return [
        (
            int(r["c"]),
            np.asarray(r["v"], dtype=np.float64),
            _exact_norm_py(np.asarray(r["v"], dtype=np.float64)),
        )
        for r in rows
    ]


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 8,
    sample_size: int = 2048,
    iterations: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Spherical k-means (Lloyd) trained driver-side on a deterministic
    sample — the production centroid source for build_ivf_index.

    The sample is the ``sample_size`` vectors with the smallest
    h60(id) (a seeded, partitioning-independent order; TakeOrdered ships
    only the sample to the driver), init is the first K sample vectors,
    and each Lloyd step assigns by max cosine — the same measure the
    index's coarse quantizer uses — then re-centers on the mean. Only
    the K×dim centroid matrix ever crosses the cluster/driver boundary
    (the textlogit weight-vector pattern), so training cost is
    independent of corpus size. Deterministic: same input → same
    centroids under any partitioning.

    Returns [(centroid_id, vector, exact_norm)] consumable by
    build_ivf_index(centroids=...).
    """
    from .hashing import h60

    rows = (
        emb.select(F.col(id_col).alias("c"), F.col(vec_col).alias("v"))
        .orderBy(h60(F.col("c").cast("string")), F.col("c"))
        .limit(sample_size)
        .collect()
    )
    if len(rows) < n_centroids:
        raise ValueError(
            f"k-means sample has {len(rows)} vectors < n_centroids="
            f"{n_centroids}"
        )
    x = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cent = xn[:n_centroids].copy()
    for _ in range(iterations):
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(xn @ cn.T, axis=1)
        for k in range(n_centroids):
            members = xn[assign == k]
            if len(members):  # empty cell keeps its previous centroid
                cent[k] = members.mean(axis=0)
    return [
        (k, cent[k].copy(), _exact_norm_py(cent[k])) for k in range(n_centroids)
    ]


def ivf_assign_col(vec_col: Column, centroids) -> Column:
    """Nearest-centroid id (argmax exact cosine, ties → smallest id):
    an array of (score, -id) structs reduced by array_max — pure JVM
    expression, K-way comparison inside codegen, no shuffle."""
    scored = F.array(
        *[
            F.struct(
                _cos_exact_9(vec_col, cv, cn).alias("s"),
                F.lit(-cid).alias("nc"),
            )
            for cid, cv, cn in centroids
        ]
    )
    return (-F.array_max(scored)["nc"]).cast("int")


def build_ivf_index(
    emb: DataFrame,
    index_dir: str,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids="trained",
) -> None:
    """At-rest IVF index: vectors written partitioned by centroid_id,
    centroid metadata committed last (tmp+rename, the snapshot-publish
    commit rule).

    centroids: "trained" (default — driver-side k-means on a
    deterministic sample, train_ivf_centroids; the production source:
    data-order-independent cells, no mega-centroid skew), "first_k"
    (the first K corpus vectors — exactly reproducible in ANSI SQL, used
    by the driver-gate oracle), or an explicit
    [(id, vector, exact_norm)] list. Assignment/probe machinery is
    centroid-source-agnostic."""
    if centroids == "trained":
        centroids = train_ivf_centroids(
            emb, n_centroids, id_col=id_col, vec_col=vec_col
        )
    elif centroids == "first_k":
        centroids = _centroid_rows(emb, n_centroids, id_col, vec_col)
    if not centroids:
        raise ValueError(
            f"no centroid vectors: table has no rows with {id_col} < "
            f"{n_centroids}"
        )
    _write_ivf_delta(emb, index_dir, _ann_delta_name(0), centroids,
                     id_col, vec_col)
    from ..index.snapshot import commit_snapshot

    commit_snapshot(
        index_dir, 0, segments=[_ann_delta_name(0)],
        stats={
            "format": "ann-ivf",
            "n_centroids": n_centroids,
            "centroids": [
                {"id": cid, "v": list(cv), "norm": cn}
                for cid, cv, cn in centroids
            ],
        },
    )


def _write_ivf_delta(
    emb: DataFrame, index_dir: str, delta: str, centroids,
    id_col: str, vec_col: str,
) -> None:
    (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            ivf_assign_col(F.col(vec_col), centroids).alias("centroid_id"),
        )
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{index_dir}/{delta}")
    )


def _ivf_centroids_of(stats: dict):
    return [
        (c["id"], np.asarray(c["v"], dtype=np.float64), c["norm"])
        for c in stats["centroids"]
    ]


def ivf_index_append(
    emb: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Append vectors to a published IVF index as a new generation. The
    coarse quantizer (centroids) is FROZEN at build time — the standard
    IVF contract (FAISS trains once; re-training moves cell boundaries
    and would orphan existing assignments); new vectors are assigned
    under the stored centroids and published atomically. Returns the
    new generation."""
    from ..index.snapshot import commit_snapshot

    snap = _ann_snapshot(index_dir)
    stats = snap["stats"]
    if stats.get("format", "ann-ivf") != "ann-ivf":
        raise ValueError(f"not an IVF ANN index: {stats.get('format')!r}")
    centroids = _ivf_centroids_of(stats)
    gen = snap["generation"] + 1
    delta = _ann_delta_name(gen)
    _write_ivf_delta(emb, index_dir, delta, centroids, id_col, vec_col)
    commit_snapshot(
        index_dir, gen, segments=list(snap["segments"]) + [delta],
        stats=stats,
    )
    return gen


def ivf_index_topk(
    spark: SparkSession,
    index_dir: str,
    query: Sequence[float],
    k: int = 10,
    n_probes: int = 2,
    round_to: int = 4,
) -> DataFrame:
    """Probe the at-rest IVF index: top-``n_probes`` centroids resolved
    driver-side (no Spark job), centroid_id filter lands in
    PartitionFilters of every delta scan, exact cosine rerank over the
    candidates only. Reads the latest committed generation snapshot."""
    snap = _ann_snapshot(index_dir)
    centroids = _ivf_centroids_of(snap["stats"])
    ranked = sorted(_ivf_scores_py(query, centroids), key=lambda t: (-t[0], t[1]))
    probes = [cid for _, cid in ranked[:n_probes]]
    cand = _ann_union(spark, index_dir, snap).filter(
        F.col("centroid_id").isin(probes)
    )
    return (
        cand.select(
            "vec_id",
            F.round(cosine_sim_col(F.col("embedding"), query), round_to).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    max_bucket: int = 1024,
) -> DataFrame:
    """(vec_a, vec_b, cosine) pairs with cosine >= threshold, found via
    LSH self-join (same-bucket candidates only) + exact verification.
    With multiprobe-0 banding this trades recall for a bounded join.

    Skew guard (same rule as dedup.lsh_candidate_pairs): buckets larger
    than ``max_bucket`` are dropped before the self-join, bounding every
    reducer at max_bucket^2 candidate rows — a near-dup-heavy corpus
    (the exact case dedup exists for) otherwise concentrates in a few
    buckets and goes quadratic in one task at 10^9 vectors. At
    production scale the over-cap mass is near-identical by
    construction and is handled by exact dedup (hash-groupBy) first;
    singleton buckets are dropped too (they cannot form a pair)."""
    planes = h60_plane_matrix(emb.select(F.size(vec_col)).first()[0], n_planes)
    b = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    ok = (
        b.groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
        .select("bucket")
    )
    b = b.join(ok, "bucket")
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


def int8_dequantized(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Int8 scalar quantization of an embedding corpus: per-dimension
    corpus [min, max] affine-quantized to 256 levels, decoded back to
    the level midpoint. This is the at-rest compression path for
    100 TB embedding search — codes are 1 byte/dim (8× smaller scans),
    and because BOTH stored vectors and the query pass through the
    SAME quantizer, similarity over the dequantized values is the
    standard scalar-quantization ANN approximation (the int8 flat
    index idea: affine code = clamp(floor((x−mn)/(mx−mn)·256), 0, 255),
    decode = mn + (code+0.5)·(mx−mn)/256).

    → rows (vec_id, i, vx) with i 1-based, vx the dequantized value.
    One stats agg (64 scalars, broadcast) + one narrow projection."""
    x = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(vec_col).alias("i0", "x"),
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.col("x").cast("double").alias("x"),
    )
    st = x.groupBy("i").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    j = x.join(F.broadcast(st), "i")
    mn, mx, xv = F.col("mn"), F.col("mx"), F.col("x")
    code = F.least(
        F.lit(255.0),
        F.greatest(F.lit(0.0), F.floor((xv - mn) / (mx - mn) * 256)),
    )
    dq = F.when(mx == mn, mn).otherwise(
        mn + (code + 0.5) * (mx - mn) / 256
    )
    return j.select("vec_id", "i", dq.alias("vx"))


def int8_cosine_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Top-k by cosine over int8-dequantized vectors, query taken from
    the corpus by id and quantized with the SAME per-dim stats.

    → (vec_id, score) ordered by (score desc, vec_id asc)."""
    v = int8_dequantized(emb, id_col, vec_col)
    qc = v.filter(F.col("vec_id") == query_vec_id).select(
        "i", F.col("vx").alias("qx")
    )
    s = (
        v.join(F.broadcast(qc), "i")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("vx") * F.col("qx")).alias("dot"),
            F.sqrt(F.sum(F.col("vx") * F.col("vx"))).alias("nrm"),
        )
    )
    qn = float(
        qc.agg(
            F.sqrt(F.sum(F.col("qx") * F.col("qx")))
        ).collect()[0][0]
    )
    return (
        s.select(
            "vec_id",
            F.round(
                F.col("dot") / (F.col("nrm") * F.lit(qn)), round_to
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )
