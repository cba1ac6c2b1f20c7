"""Training-data pipeline gates: dedup, similarity search, text
analysis, multimodal — each a Spark plan + value-identical DuckDB SQL.

The dedup corpora are built inline (documents ∪ deterministic
mutations) so exact and near duplicates exist at every sf; the same
construction is embedded in the oracle SQL, so both engines see the
same input. All hashing is the portable md5-derived h60
(operators/hashing.py) — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .gate import gate, load
from .operators import dedup as dd
from .operators import multimodal as mm
from .operators import similarity as sim
from .operators import textqual as tq
from .operators.hashing import h60_sql, h60_seeded_sql

# ------------------------------------------------------------ SQL helpers

_TOKD = (
    "SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS toks "
    "FROM {src}"
)

_CORPUS_EXACT = (
    "SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0"
)
_CORPUS_NEAR = (
    "SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 100000 AS doc_id, concat(text, ' zqnearduptoken') AS text "
    "FROM documents WHERE doc_id % 11 = 0"
)


def _shingle_sql(src_cte: str, k: int = 3) -> str:
    """CTE body: (doc_id, shingle) k-token shingles of corpus ``src_cte``."""
    return f"""
  SELECT doc_id, array_to_string(toks[i:i+{k - 1}], ' ') AS shingle
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - {k - 2})) AS i
        FROM ({_TOKD.format(src=src_cte)}))"""


def _corpus_exact(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return docs.unionByName(dup)


def _corpus_near(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zqnearduptoken")).alias("text"),
    )
    return docs.unionByName(dup)


# ------------------------------------------------------------ exact dedup

@gate(
    "td_dedup_exact",
    f"""WITH corpus AS ({_CORPUS_EXACT}),
h AS (SELECT doc_id, {h60_sql('text')} AS text_h60 FROM corpus),
g AS (SELECT text_h60, min(doc_id) AS survivor_id, count(*) AS n_copies
      FROM h GROUP BY text_h60)
SELECT h.doc_id, g.n_copies, h.doc_id = g.survivor_id AS is_survivor
FROM h JOIN g USING (text_h60)
WHERE g.n_copies > 1
ORDER BY h.doc_id""",
)
def td_dedup_exact(spark, sf_dir):
    """Exact dedup (hash-groupBy): every row of each duplicate family,
    flagged with its survivor."""
    res = dd.exact_dedup(_corpus_exact(spark, sf_dir))
    return res.filter(F.col("n_copies") > 1).orderBy("doc_id")


# ------------------------------------------------------ chunk duplication

@gate(
    "td_chunk_dedup",
    f"""WITH corpus AS ({_CORPUS_EXACT}),
t AS ({_TOKD.format(src='corpus')}),
ch AS (SELECT DISTINCT doc_id,
         {h60_sql("array_to_string(toks[i*10+1 : i*10+10], ' ')")} AS chunk_h
       FROM (SELECT doc_id, toks,
                    unnest(range(0, CAST(floor(len(toks) / 10) AS BIGINT))) AS i
             FROM t)),
sh AS (SELECT chunk_h FROM ch GROUP BY chunk_h
       HAVING count(DISTINCT doc_id) > 1),
m AS (SELECT ch.doc_id, sh.chunk_h IS NOT NULL AS is_sh
      FROM ch LEFT JOIN sh USING (chunk_h))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN is_sh THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_chunks,
       round(sum(CASE WHEN is_sh THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS shared_ratio
FROM m GROUP BY doc_id ORDER BY doc_id""",
)
def td_chunk_dedup(spark, sf_dir):
    """Chunk-level duplication (copy-paste contamination): 10-token
    non-overlapping chunks hashed; per-doc count of chunks appearing in
    >1 distinct document — catches partial copies doc-level exact dedup
    misses (operators/dedup.py chunk_duplication)."""
    res = dd.chunk_duplication(_corpus_exact(spark, sf_dir), chunk_tokens=10)
    return res.orderBy("doc_id")


# ----------------------------------------------------------- minhash LSH

_MH_N, _MH_BANDS, _MH_K = 8, 4, 3


def _minhash_sql() -> str:
    mh_cols = ",\n  ".join(
        f"min({h60_seeded_sql(i, 'shingle')}) AS mh{i}" for i in range(_MH_N)
    )
    r = _MH_N // _MH_BANDS
    band_selects = "\n  UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {h} AS bucket FROM sig".format(
            b=b,
            h=h60_sql(
                "concat(" + ", ',', ".join(f"mh{b * r + j}" for j in range(r)) + ")"
            ),
        )
        for b in range(_MH_BANDS)
    )
    return f"""WITH corpus AS ({_CORPUS_NEAR}),
sh AS ({_shingle_sql('corpus', _MH_K)}),
sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
bands AS ({band_selects}),
small AS (SELECT band, bucket FROM bands GROUP BY band, bucket
          HAVING count(*) BETWEEN 2 AND 64),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN small USING (band, bucket)
         JOIN bands b ON b.band = a.band AND b.bucket = a.bucket
         WHERE a.doc_id < b.doc_id),
shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
inter AS (SELECT c.doc_a, c.doc_b, count(*) AS ni
          FROM cand c
          JOIN shd sa ON sa.doc_id = c.doc_a
          JOIN shd sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
          GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b,
       round(CAST(i.ni AS DOUBLE) / (na.n + nb.n - i.ni), 4) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE CAST(i.ni AS DOUBLE) / (na.n + nb.n - i.ni) >= 0.5
ORDER BY doc_a, doc_b"""


@gate("td_dedup_minhash_lsh", _minhash_sql())
def td_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup: shingle → 8-hash signature → 4-band bucket
    join → exact-Jaccard verify >= 0.5."""
    res = dd.minhash_near_duplicates(
        _corpus_near(spark, sf_dir),
        n_hashes=_MH_N,
        n_bands=_MH_BANDS,
        shingle_k=_MH_K,
        threshold=0.5,
    )
    return res.orderBy("doc_a", "doc_b")


# --------------------------------------------------------------- simhash

def _simhash_sql() -> str:
    bit_sums = ",\n  ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN freq ELSE -freq END) AS s{b}"
        for b in range(dd.SIMHASH_BITS)
    )
    sig_expr = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {2 ** b}::BIGINT ELSE 0 END)"
        for b in range(dd.SIMHASH_BITS)
    )
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, simhash, {j} AS band, (simhash >> {8 * j}) & 255 AS bucket FROM sig"
        for j in range(4)
    )
    return f"""WITH corpus AS ({_CORPUS_NEAR}),
tf AS (SELECT doc_id, term, count(*) AS freq
       FROM (SELECT doc_id, unnest(toks) AS term FROM ({_TOKD.format(src='corpus')}))
       GROUP BY doc_id, term),
th AS (SELECT doc_id, freq, {h60_sql('term')} AS h FROM tf),
bs AS (SELECT doc_id, {bit_sums} FROM th GROUP BY doc_id),
sig AS (SELECT doc_id, {sig_expr} AS simhash FROM bs),
bands AS ({band_selects}),
small AS (SELECT band, bucket FROM bands GROUP BY band, bucket
          HAVING count(*) BETWEEN 2 AND 256),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                a.simhash AS sig_a, b.simhash AS sig_b
         FROM bands a JOIN small USING (band, bucket)
         JOIN bands b ON b.band = a.band AND b.bucket = a.bucket
         WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, bit_count(xor(sig_a, sig_b)) AS hamming
FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
ORDER BY doc_a, doc_b"""


@gate("td_dedup_simhash", _simhash_sql())
def td_dedup_simhash(spark, sf_dir):
    """SimHash near-dup: 32-bit signatures, 8-bit band join (lossless
    for hamming <= 3 by pigeonhole), hamming verify."""
    res = dd.simhash_near_duplicates(_corpus_near(spark, sf_dir), max_hamming=3)
    return res.orderBy("doc_a", "doc_b")


# -------------------------------------------------------- n-gram jaccard

# Candidates come from the banded-LSH generator (r=1: one band per
# minhash, P(candidate) = 1-(1-j)^8 ≈ 0.83 at j=0.2), NOT all-pairs —
# the scale path a 10^12-doc corpus requires; exact 3-gram Jaccard then
# verifies each candidate.


def _ngram_lsh_sql() -> str:
    n_h = 8  # 8 bands of r=1
    mh_cols = ",\n  ".join(
        f"min({h60_seeded_sql(i, 'shingle')}) AS mh{i}" for i in range(n_h)
    )
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {h60_sql(f'concat(mh{b})')} AS bucket FROM sig"
        for b in range(n_h)
    )
    return f"""WITH corpus AS ({_CORPUS_NEAR}),
sh AS ({_shingle_sql('corpus', 3)}),
sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
bands AS ({band_selects}),
small AS (SELECT band, bucket FROM bands GROUP BY band, bucket
          HAVING count(*) BETWEEN 2 AND 64),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN small USING (band, bucket)
         JOIN bands b ON b.band = a.band AND b.bucket = a.bucket
         WHERE a.doc_id < b.doc_id),
shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id),
inter AS (SELECT c.doc_a, c.doc_b, count(*) AS ni
          FROM cand c
          JOIN shd sa ON sa.doc_id = c.doc_a
          JOIN shd sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
          GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b,
       round(CAST(i.ni AS DOUBLE) / (na.n + nb.n - i.ni), 4) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE CAST(i.ni AS DOUBLE) / (na.n + nb.n - i.ni) >= 0.2
ORDER BY doc_a, doc_b"""


@gate("td_ngram_jaccard", _ngram_lsh_sql())
def td_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard >= 0.2 over banded-LSH candidates (8 bands
    of r=1) — candidate generation is the bounded bucket join, never an
    all-pairs product."""
    corpus = _corpus_near(spark, sf_dir)
    sigs = dd.minhash_signatures(corpus, n_hashes=8, shingle_k=3)
    pairs = dd.lsh_candidate_pairs(sigs, n_hashes=8, n_bands=8, max_bucket=64)
    res = dd.ngram_jaccard_pairs(corpus, pairs, shingle_k=3)
    return res.filter(F.col("jaccard") >= 0.2).orderBy("doc_a", "doc_b")


# --------------------------------------------------- embedding near-dup

# The sf embeddings are near-orthogonal (max pairwise cosine ~0.51), so
# near-duplicates are synthesized inline: every 17th vector re-enters
# with its last 8 dims zeroed → cosine(v, v') = |v[:56]| / |v| ≈ 0.93+.
_EMB_CORPUS = (
    "SELECT vec_id, embedding FROM embeddings "
    "UNION ALL SELECT vec_id + 100000 AS vec_id, "
    "embedding[1:56] || [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]::FLOAT[] AS embedding "
    "FROM embeddings WHERE vec_id % 17 = 0"
)


def _emb_corpus(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.filter(F.col("vec_id") % 17 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.slice("embedding", 1, 56),
            F.array_repeat(F.lit(0.0).cast("float"), 8),
        ).alias("embedding"),
    )
    return emb.unionByName(dup)


@gate(
    "td_dedup_embedding_cosine",
    f"""WITH corpus AS ({_EMB_CORPUS}),
idx AS (SELECT unnest(range(1, 65)) AS i),
norms AS (SELECT vec_id, sqrt(sum(CAST(embedding[i] AS DOUBLE) ** 2)) AS nrm
          FROM corpus, idx GROUP BY vec_id),
dots AS (SELECT e.vec_id AS vec_a, f.vec_id AS vec_b,
                sum(CAST(e.embedding[i] AS DOUBLE) * CAST(f.embedding[i] AS DOUBLE)) AS dot
         FROM corpus e JOIN corpus f ON e.vec_id < f.vec_id, idx
         GROUP BY e.vec_id, f.vec_id)
SELECT d.vec_a, d.vec_b, round(d.dot / (na.nrm * nb.nrm), 4) AS cosine
FROM dots d JOIN norms na ON na.vec_id = d.vec_a
JOIN norms nb ON nb.vec_id = d.vec_b
WHERE round(d.dot / (na.nrm * nb.nrm), 4) >= 0.9
ORDER BY vec_a, vec_b""",
)
def td_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact all-pairs baseline; the
    LSH-bucketed scale path is tested in tests/test_training_ops.py)."""
    corpus = _emb_corpus(spark, sf_dir)
    e = corpus.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    f2 = corpus.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    pairs = e.join(f2, F.col("vec_a") < F.col("vec_b"))
    cos = F.round(
        sim._dot(F.col("va"), F.col("vb"))
        / (sim._norm(F.col("va")) * sim._norm(F.col("vb"))),
        4,
    )
    return (
        pairs.select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.9)
        .orderBy("vec_a", "vec_b")
    )


# ------------------------------------------------------ similarity search

@gate(
    "td_ann_cosine_topk",
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
idx AS (SELECT unnest(range(1, 65)) AS i),
qn AS (SELECT sqrt(sum(CAST(qe[i] AS DOUBLE) ** 2)) AS nrm FROM q, idx),
s AS (SELECT e.vec_id,
             sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) AS dot,
             sqrt(sum(CAST(e.embedding[i] AS DOUBLE) ** 2)) AS nrm
      FROM embeddings e, q, idx GROUP BY e.vec_id)
SELECT s.vec_id, round(s.dot / (s.nrm * qn.nrm), 4) AS score
FROM s, qn
ORDER BY score DESC, vec_id ASC LIMIT 10""",
)
def td_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 for the vec_id=0 query vector."""
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return sim.cosine_topk(emb, list(qv), k=10)


def _planes_sql(n_planes: int, dim: int = 64) -> str:
    """CTE body: (p, i, w) — the h60-derived hyperplanes, identical to
    similarity.h60_plane_matrix (integer weights, i is 1-based)."""
    return f"""planes AS (
  SELECT p, i, (({h60_sql("concat('plane', p, ':', i)")}) % 2001) - 1000 AS w
  FROM (SELECT unnest(range(0, {n_planes})) AS p),
       (SELECT unnest(range(1, {dim} + 1)) AS i))"""


def _buckets_sql(corpus: str) -> str:
    """CTE bodies (needs ``planes``): per-vector LSH bucket with the
    same per-term-rounded DECIMAL sign rule as lsh_bucket_col."""
    return f"""vb AS (SELECT e.vec_id, pl.p,
       sum(CAST(round(CAST(e.embedding[pl.i] AS DOUBLE) * pl.w, 9)
                AS DECIMAL(28,9))) AS dot
     FROM {corpus} e, planes pl GROUP BY e.vec_id, pl.p),
bkt AS (SELECT vec_id,
          sum(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << CAST(p AS INTEGER))
              ELSE 0 END) AS bucket
        FROM vb GROUP BY vec_id)"""


_ANN_INDEX_CACHE: dict = {}


def _ann_index_dir(spark, sf_dir: str, n_planes: int = 6) -> str:
    """At-rest bucket-partitioned ANN index per sf_dir, built once."""
    import tempfile

    key = (sf_dir, n_planes)
    if key not in _ANN_INDEX_CACHE:
        d = tempfile.mkdtemp(prefix="lss_annidx_")
        sim.build_ann_index(
            load(spark, sf_dir, "embeddings"), d, n_planes=n_planes
        )
        _ANN_INDEX_CACHE[key] = d
    return _ANN_INDEX_CACHE[key]


@gate(
    "td_ann_lsh_topk",
    f"""WITH {_planes_sql(6)},
{_buckets_sql('embeddings')},
qb AS (SELECT bucket AS qbucket FROM bkt WHERE vec_id = 0),
cand AS (SELECT b.vec_id FROM bkt b, qb
         WHERE bit_count(xor(b.bucket, qb.qbucket)) <= 1),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
idx AS (SELECT unnest(range(1, 65)) AS i),
qn AS (SELECT sqrt(sum(CAST(qe[i] AS DOUBLE) ** 2)) AS nrm FROM q, idx),
s AS (SELECT e.vec_id,
             sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) AS dot,
             sqrt(sum(CAST(e.embedding[i] AS DOUBLE) ** 2)) AS nrm
      FROM embeddings e JOIN cand USING (vec_id), q, idx GROUP BY e.vec_id)
SELECT s.vec_id, round(s.dot / (s.nrm * qn.nrm), 4) AS score
FROM s, qn
ORDER BY score DESC, vec_id ASC LIMIT 10""",
)
def td_ann_lsh_topk(spark, sf_dir):
    """ANN top-10 over the AT-REST bucket-partitioned index: the probe
    set (query bucket + hamming-1 flips) is resolved driver-side and
    lands in PartitionFilters — probe I/O is |probes|/2^6 of the corpus,
    not a full scan (tests/test_training_ops.py asserts the pruning and
    recall; the oracle recomputes identical h60-derived buckets)."""
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    idx_dir = _ann_index_dir(spark, sf_dir, n_planes=6)
    return sim.ann_index_topk(spark, idx_dir, list(qv), k=10, multiprobe_hamming=1)


# ----------------------------------------------------------------- IVF ANN

_IVF_K, _IVF_NPROBE = 8, 2

# Frozen PRODUCTION k-means centroids (train_ivf_centroids output,
# scripts/make_ivf_fixture.py — the porter_stems.parquet pattern): both
# engines read the SAME at-rest centroid table, so the driver hash
# verifies the trained coarse-quantizer path, not a first_k stand-in.
# Corpus key = (count(*), floor(vec0[1]*1e9)): distinct testdata corpora
# share row counts but never the leading component of vector 0.
_IVF_FIXTURE = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)),
    "fixtures_data",
    "ivf_centroids.parquet",
)

_IVF_CENT_CTE = f"""cent AS (
  SELECT centroid_id AS c, centroid AS ce FROM read_parquet('{_IVF_FIXTURE}')
  WHERE n_vecs = (SELECT count(*) FROM embeddings)
    AND key0 = (SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1e9) AS BIGINT)
                FROM embeddings WHERE vec_id = 0))"""


def _ivf_sql() -> str:
    return f"""WITH {_IVF_CENT_CTE},
idx AS (SELECT unnest(range(1, 65)) AS i),
cn AS (SELECT c, sqrt(CAST(sum(CAST(round(CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE), 9)
                                   AS DECIMAL(28,9))) AS DOUBLE)) AS nrm
       FROM cent, idx GROUP BY c),
dots AS (SELECT e.vec_id, ct.c,
                CAST(sum(CAST(round(CAST(e.embedding[i] AS DOUBLE) * CAST(ct.ce[i] AS DOUBLE), 9)
                              AS DECIMAL(28,9))) AS DOUBLE) AS dot
         FROM embeddings e, cent ct, idx GROUP BY e.vec_id, ct.c),
asg AS (SELECT d.vec_id, d.c, round(d.dot / cn.nrm, 9) AS s FROM dots d JOIN cn USING (c)),
best AS (SELECT vec_id, c FROM (
           SELECT vec_id, c,
                  row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, c ASC) AS rn
           FROM asg) WHERE rn = 1),
qprobe AS (SELECT c FROM asg WHERE vec_id = 0 ORDER BY s DESC, c ASC LIMIT {_IVF_NPROBE}),
cand AS (SELECT b.vec_id FROM best b JOIN qprobe USING (c)),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
qn AS (SELECT sqrt(sum(CAST(qe[i] AS DOUBLE) ** 2)) AS nrm FROM q, idx),
s AS (SELECT e.vec_id,
             sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) AS dot,
             sqrt(sum(CAST(e.embedding[i] AS DOUBLE) ** 2)) AS nrm
      FROM embeddings e JOIN cand USING (vec_id), q, idx GROUP BY e.vec_id)
SELECT s.vec_id, round(s.dot / (s.nrm * qn.nrm), 4) AS score
FROM s, qn ORDER BY score DESC, vec_id ASC LIMIT 10"""


_IVF_INDEX_CACHE: dict = {}


def _ivf_index_dir(spark, sf_dir: str) -> str:
    import tempfile

    key = (sf_dir, _IVF_K)
    if key not in _IVF_INDEX_CACHE:
        d = tempfile.mkdtemp(prefix="lss_ivfidx_")
        sim.build_ivf_index(
            load(spark, sf_dir, "embeddings"), d, n_centroids=_IVF_K,
            centroids=_ivf_fixture_centroids(spark, sf_dir),
        )
        _IVF_INDEX_CACHE[key] = d
    return _IVF_INDEX_CACHE[key]


def _ivf_fixture_centroids(spark, sf_dir: str):
    """Load this corpus's frozen trained centroids from the fixture —
    the same rows the oracle's cent CTE reads. Raises if the corpus has
    no frozen centroids (regenerate with scripts/make_ivf_fixture.py)
    rather than silently falling back to an unverified source."""
    import math

    import numpy as np
    import pandas as pd

    emb = load(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    v0 = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    key0 = int(math.floor(float(v0[0]) * 1e9))
    pdf = pd.read_parquet(_IVF_FIXTURE)
    pdf = pdf[(pdf["n_vecs"] == n_vecs) & (pdf["key0"] == key0)]
    if len(pdf) != _IVF_K:
        raise ValueError(
            f"ivf_centroids.parquet has {len(pdf)} rows for corpus "
            f"(n_vecs={n_vecs}, key0={key0}); expected {_IVF_K} — "
            "regenerate with scripts/make_ivf_fixture.py"
        )
    return [
        (int(r.centroid_id), np.asarray(r.centroid, dtype=np.float64),
         float(r.exact_norm))
        for r in pdf.itertuples()
    ]


@gate("td_ann_ivf_topk", _ivf_sql())
def td_ann_ivf_topk(spark, sf_dir):
    """IVF ANN over the AT-REST centroid-partitioned index built from
    the PRODUCTION trained k-means centroids (train_ivf_centroids,
    frozen as ivf_centroids.parquet by scripts/make_ivf_fixture.py):
    coarse quantizer assigns each vector once at build time
    (exact-DECIMAL argmax), probe = top-nprobe centroid partitions
    resolved driver-side (PartitionFilters pruning), exact cosine
    rerank over candidates only. The oracle reads the same frozen
    centroid table and recomputes assignment, probe and rerank from
    raw embeddings; recall@10 >= 0.9 vs brute force is pinned by
    tests/test_training_ops.py."""
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    idx_dir = _ivf_index_dir(spark, sf_dir)
    return sim.ivf_index_topk(
        spark, idx_dir, list(qv), k=10, n_probes=_IVF_NPROBE
    )


# ------------------------------------------ embedding near-dup, scale path

@gate(
    "td_dedup_embedding_lsh",
    f"""WITH corpus AS ({_EMB_CORPUS}),
{_planes_sql(4)},
{_buckets_sql('corpus')},
ok AS (SELECT bucket FROM bkt GROUP BY bucket
       HAVING count(*) > 1 AND count(*) <= 1024),
bkt2 AS (SELECT b.vec_id, b.bucket FROM bkt b JOIN ok USING (bucket)),
cand AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         FROM bkt2 a JOIN bkt2 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
idx AS (SELECT unnest(range(1, 65)) AS i),
norms AS (SELECT vec_id, sqrt(sum(CAST(embedding[i] AS DOUBLE) ** 2)) AS nrm
          FROM corpus, idx GROUP BY vec_id),
dots AS (SELECT c.vec_a, c.vec_b,
                sum(CAST(e.embedding[i] AS DOUBLE) * CAST(f.embedding[i] AS DOUBLE)) AS dot
         FROM cand c
         JOIN corpus e ON e.vec_id = c.vec_a
         JOIN corpus f ON f.vec_id = c.vec_b, idx
         GROUP BY c.vec_a, c.vec_b)
SELECT d.vec_a, d.vec_b, round(d.dot / (na.nrm * nb.nrm), 4) AS cosine
FROM dots d JOIN norms na ON na.vec_id = d.vec_a
JOIN norms nb ON nb.vec_id = d.vec_b
WHERE round(d.dot / (na.nrm * nb.nrm), 4) >= 0.9
ORDER BY vec_a, vec_b""",
)
def td_dedup_embedding_lsh(spark, sf_dir):
    """Embedding near-dup via the LSH-bucketed SCALE path: same-bucket
    self-join bounds the candidate set (vs the exact all-pairs twin
    td_dedup_embedding_cosine, kept as the small-scale oracle baseline),
    then exact cosine >= 0.9 verifies each candidate. The max_bucket
    skew cap (degenerate buckets dropped pre-join) is mirrored in the
    oracle's ok/bkt2 CTEs."""
    res = sim.embedding_near_dup_pairs(
        _emb_corpus(spark, sf_dir), threshold=0.9, n_planes=4
    )
    return res.orderBy("vec_a", "vec_b")


# ----------------------------------------------------------- text quality

def _lang_sql() -> str:
    score_cols = ",\n  ".join(
        "len(list_filter(toks, x -> x IN ({lst}))) AS s_{lang}".format(
            lst=", ".join(f"'{w}'" for w in tq.LANG_MARKERS[lang]), lang=lang
        )
        for lang in tq.LANG_ORDER
    )
    hits = "greatest(" + ", ".join(f"s_{l}" for l in tq.LANG_ORDER) + ")"
    whens = "\n  ".join(
        "WHEN "
        + " AND ".join(
            f"s_{lang} >= s_{other}" for other in tq.LANG_ORDER if other != lang
        )
        + f" THEN '{lang}'"
        for lang in tq.LANG_ORDER
    )
    return f"""WITH t AS ({_TOKD.format(src='documents')}),
s AS (SELECT doc_id, {score_cols} FROM t)
SELECT doc_id,
  CASE WHEN {hits} = 0 THEN 'und' {whens} END AS lang_pred,
  {hits} AS lang_hits
FROM s ORDER BY doc_id"""


@gate("td_lang_id", _lang_sql())
def td_lang_id(spark, sf_dir):
    """Marker-hit-ratio language ID (argmax over per-language stopword
    hit counts, deterministic tie-break)."""
    return tq.lang_id(load(spark, sf_dir, "documents")).orderBy("doc_id")


@gate(
    "td_quality_score",
    """WITH t AS (SELECT doc_id, coalesce(text, '') AS text,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS toks
       FROM documents),
f AS (SELECT doc_id,
  length(text) AS n_chars,
  len(toks) AS n_tokens,
  length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
  len(list_filter(toks, x -> x IN ('the','and','of','to','is','in','that','it','was','for'))) AS stop,
  CAST(greatest(length(text), 1) AS DOUBLE) AS nz,
  CAST(greatest(len(toks), 1) AS DOUBLE) AS ntz,
  list_aggregate(list_transform(toks, x -> CAST(length(x) AS DOUBLE)), 'sum') AS tok_chars
 FROM t)
SELECT doc_id, n_chars, n_tokens,
  round(alpha / nz, 4) AS alpha_ratio,
  round(punct / nz, 4) AS punct_ratio,
  round(stop / ntz, 4) AS stop_ratio,
  round(coalesce(tok_chars, 0) / ntz, 4) AS mean_tok_len,
  round(least(greatest(
      0.4 * (alpha / nz)
    + 0.3 * least(stop / ntz * 4, 1.0)
    + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
    - 0.5 * (punct / nz), 0.0), 1.0), 4) AS quality
FROM f ORDER BY doc_id""",
)
def td_quality_score(spark, sf_dir):
    """Heuristic quality scoring from length/punct/stopword ratios."""
    return tq.quality_features(load(spark, sf_dir, "documents")).orderBy("doc_id")


@gate(
    "td_token_count",
    r"""SELECT doc_id,
  len(list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '')) AS ws_tokens,
  len(regexp_extract_all(coalesce(text, ''), '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS bpe_ish_tokens
FROM documents ORDER BY doc_id""",
)
def td_token_count(spark, sf_dir):
    """Whitespace + BPE-ish-regex token counting."""
    return tq.token_counts(load(spark, sf_dir, "documents")).orderBy("doc_id")


@gate(
    "td_fingerprint",
    f"""WITH sh AS ({_shingle_sql('documents', 8)})
SELECT doc_id, min({h60_sql('shingle')}) AS fp_min,
       max({h60_sql('shingle')}) AS fp_max, count(*) AS n_grams
FROM sh GROUP BY doc_id ORDER BY doc_id""",
)
def td_fingerprint(spark, sf_dir):
    """Winnowing-style rolling 8-gram min/max-hash document fingerprint."""
    return tq.fingerprint(load(spark, sf_dir, "documents"), k=8).orderBy("doc_id")


# ------------------------------------------------------------- multimodal

# The synthetic payload is 8 concatenated md5 digests (128 bytes), so
# DuckDB can rebuild the SAME bytes from the hex string: byte j's high
# nibble is hex char 2j+1 — feature bin 0 (fraction of bytes with high
# nibble 0) is reproducible without any blob machinery.
_MEDIA_HEX = "concat(" + ", ".join(
    f"md5(concat(CAST(id AS VARCHAR), '#{i}#42'))" for i in range(8)
) + ")"

@gate(
    "td_multimodal_features",
    f"""WITH m AS (SELECT id, {_MEDIA_HEX} AS hx FROM range(0, 300) t(id))
SELECT id AS media_id,
  CASE WHEN id % 3 = 0 THEN 'image' WHEN id % 3 = 1 THEN 'audio'
       ELSE 'video' END AS kind,
  CAST(128 AS INTEGER) AS n_bytes,
  round(len(list_filter(range(0, 128), j -> substr(hx, 2 * j + 1, 1) = '0'))
        / 128.0, 4) AS f0
FROM m ORDER BY media_id""",
)
def td_multimodal_features(spark, sf_dir):
    """Binary-payload feature extraction via Arrow mapInPandas (decode
    stubbed deterministically; schema/batching is the production shape).
    The oracle rebuilds the deterministic md5 payload bytes in SQL and
    recomputes histogram bin 0."""
    media = mm.synth_media(spark, 300)
    feats = mm.extract_features(media)
    return feats.select(
        "media_id", "kind", "n_bytes", F.round(F.element_at("features", 1), 4).alias("f0")
    ).orderBy("media_id")


# ------------------------------------------------- deterministic sampling

_SAMPLE_PRED = (
    "{h} % 1000000 < {thr}".format(
        h=h60_sql("concat('s0|', CAST(doc_id AS VARCHAR))"), thr="{thr}"
    )
)


@gate(
    "td_random_sample",
    f"""SELECT doc_id, lang FROM documents
WHERE {_SAMPLE_PRED.format(thr=100000)}
ORDER BY doc_id""",
)
def td_random_sample(spark, sf_dir):
    """RandomStream analog, pipeline-grade: DETERMINISTIC 10% sample via
    the portable salted h60 (reproducible across runs/engines/
    partitionings — unlike df.sample's per-partition seeding); the
    keep-predicate is a pure Column pushed into the scan
    (operators/sampling.py; reference solr/solrj/.../io/stream/
    RandomStream.java)."""
    from .operators import sampling as sp

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return sp.deterministic_sample(docs, 0.1, "doc_id").orderBy("doc_id")


@gate(
    "td_stratified_sample",
    f"""WITH kept AS (
  SELECT doc_id, lang FROM documents
  WHERE {h60_sql("concat('s0|', CAST(doc_id AS VARCHAR))")} % 1000000
        < CASE lang WHEN 'en' THEN 100000 WHEN 'zh' THEN 400000
                    WHEN 'de' THEN 800000 ELSE 0 END)
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(k.doc_id) AS BIGINT) AS n_sampled
FROM documents d LEFT JOIN kept k USING (doc_id)
GROUP BY d.lang ORDER BY d.lang""",
)
def td_stratified_sample(spark, sf_dir):
    """Stratified deterministic downsampling (per-language quotas —
    the training-mix rebalancer): en→10%, zh→40%, de→80%, others
    dropped; summary = per-stratum totals vs kept."""
    from .operators import sampling as sp

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    kept = sp.stratified_sample(
        docs, "lang", {"en": 0.1, "zh": 0.4, "de": 0.8}, "doc_id"
    ).select("doc_id", F.lit(1).alias("k"))
    return (
        docs.join(kept, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.count("k").cast("long").alias("n_sampled"),
        )
        .orderBy("lang")
    )


@gate(
    "td_multimodal_frames",
    """WITH m AS (SELECT id AS media_id, 1000 + id % 9000 AS duration_ms
           FROM range(0, 300) t(id) WHERE id % 3 = 2)
SELECT media_id, CAST(unnest(range(0, duration_ms, 1000)) AS BIGINT) AS frame_ms
FROM m ORDER BY media_id, frame_ms""",
)
def td_multimodal_frames(spark, sf_dir):
    """Video frame-sampling plumbing: one row per 1000ms frame timestamp
    per video (JVM explode of the timestamp grid — the decode stays
    stubbed, the fan-out schema is the production shape); the oracle
    rebuilds the deterministic duration grid."""
    media = mm.synth_media(spark, 300)
    return (
        mm.frame_sample(media, every_ms=1000)
        .select("media_id", F.col("frame_ms").cast("long").alias("frame_ms"))
        .orderBy("media_id", "frame_ms")
    )


# -------------------------------------------------------- PII redaction

# The synthetic documents contain no PII, so identifiers are injected
# deterministically from doc_id on BOTH engines (same trick as
# _EMB_CORPUS): the operator under test is the detection/masking, the
# input derivation is part of the fixture.
_PII_SQL = (
    "SELECT doc_id, coalesce(text, '') || ' contact user' || "
    "CAST(doc_id AS VARCHAR) || '@example.com visit https://site' || "
    "CAST(doc_id % 7 AS VARCHAR) || '.org or call 555-123-4567 from "
    "192.168.0.' || CAST(doc_id % 254 AS VARCHAR) AS text FROM documents"
)

_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_URL = r"https?://[A-Za-z0-9./_-]+"
_RE_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
_RE_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_REDACT_SQL = (
    "WITH src AS (" + _PII_SQL + "),\n"
    "red AS (SELECT doc_id,\n"
    "  CAST(len(regexp_extract_all(text, '" + _RE_EMAIL + "')) AS BIGINT) AS n_email,\n"
    "  CAST(len(regexp_extract_all(text, '" + _RE_URL + "')) AS BIGINT) AS n_url,\n"
    "  CAST(len(regexp_extract_all(text, '" + _RE_PHONE + "')) AS BIGINT) AS n_phone,\n"
    "  CAST(len(regexp_extract_all(text, '" + _RE_IPV4 + "')) AS BIGINT) AS n_ipv4,\n"
    "  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,\n"
    "    '" + _RE_EMAIL + "', '<EMAIL>', 'g'),\n"
    "    '" + _RE_URL + "', '<URL>', 'g'),\n"
    "    '" + _RE_PHONE + "', '<PHONE>', 'g'),\n"
    "    '" + _RE_IPV4 + "', '<IPV4>', 'g') AS rt\n"
    "FROM src)\n"
    "SELECT doc_id, n_email, n_url, n_phone, n_ipv4,\n"
    "  CAST(length(rt) AS BIGINT) AS red_len\n"
    "FROM red ORDER BY doc_id"
)


@gate("td_redaction", _REDACT_SQL)
def td_redaction(spark, sf_dir):
    """PII scrub metrics: emails / URLs / phone numbers / IPv4s counted
    and masked per document (operators/textqual.py redact — pure
    regexp Column exprs, patterns chosen to evaluate identically in
    Java regex and RE2). The redacted-text length is hash-checked, so
    the oracle verifies the masking itself, not just the counts."""
    doc = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com visit https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".org or call 555-123-4567 from 192.168.0."),
            (F.col("doc_id") % 254).cast("string"),
        ).alias("text"),
    )
    return tq.redact(doc).drop("redacted").orderBy("doc_id")


# ------------------------------------------- dedup clusters (keep-one)

_CLUSTER_SQL = """
WITH RECURSIVE pr AS ({pairs}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pr
          UNION SELECT doc_b, doc_a FROM pr),
reach(src, node) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
),
canon AS (SELECT src AS doc_id, min(node) AS canonical
          FROM reach GROUP BY src)
SELECT doc_id, canonical,
  CAST(count(*) OVER (PARTITION BY canonical) AS BIGINT) AS cluster_size
FROM canon ORDER BY doc_id"""


def _cluster_oracle() -> str:
    return _CLUSTER_SQL.format(pairs=_minhash_sql())


@gate("td_dedup_clusters", _cluster_oracle())
def td_dedup_clusters(spark, sf_dir):
    """Near-dup graph → connected components → canonical doc per
    cluster (the keep-one dedup step): min-label propagation over the
    MinHash-LSH pair list (operators/dedup.py dedup_clusters — one
    shuffle per round, O(cluster diameter) rounds, labels
    localCheckpoint-ed). The oracle computes min-reachable-id closure
    with WITH RECURSIVE over the identical pair list."""
    pairs = td_dedup_minhash_lsh(spark, sf_dir)
    return dd.dedup_clusters(pairs).orderBy("doc_id")


# ----------------------------------------- binary content extraction

_EXTRACT_SQL = """
WITH src AS (
  SELECT doc_id, coalesce(text, '') AS t, doc_id % 3 AS branch
  FROM documents WHERE doc_id < 300),
ex AS (
  SELECT doc_id,
    CASE branch WHEN 0 THEN 0 WHEN 1 THEN 1 ELSE 2 END AS ct_code,
    CASE branch WHEN 1 THEN t
         ELSE trim(t, ' ' || chr(9) || chr(10) || chr(13)) END AS text
  FROM src)
SELECT doc_id, text, CAST(ct_code AS BIGINT) AS ct_code,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(0 AS BIGINT) AS is_stub
FROM ex ORDER BY doc_id"""


@gate("td_binary_extract", _EXTRACT_SQL)
def td_binary_extract(spark, sf_dir):
    """ExtractingRequestHandler (Tika) analog over a binary content
    column: magic-byte content-type sniff + per-type text extraction,
    all three branches REAL (sources/extraction.py): plaintext UTF-8
    decode, HTML via the JVM-oracle-verified HTMLStripCharFilter, and
    PDF via a working parser (sources/pdfminimal.py — Flate inflate +
    BT…ET text-operator execution). The corpus wraps each document's
    text as HTML / plaintext / a real single-page PDF (Flate and TJ
    variants cycled by doc_id) built with pdf_build_minimal; the
    engine round-trips through a genuine binary column (sniff bytes →
    dispatch → parse), and the oracle is the identity the round-trip
    must restore — the extracted TEXT itself is a hash-checked key.

    Reference: solr/contrib/extraction ExtractingRequestHandler
    (Tika dispatch-by-type); PDF text operators per PDF 32000-1 §9.4.
    """
    from .sources.extraction import extract
    from .sources.pdfminimal import pdf_build_minimal

    @F.pandas_udf("binary")
    def _build_pdf(texts, ids):
        import pandas as pd

        return pd.Series(
            [
                pdf_build_minimal(
                    t or "",
                    flate=bool(i % 2 == 0),
                    use_tj_array=bool(i % 4 >= 2),
                )
                for t, i in zip(texts, ids)
            ]
        )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    txt = F.coalesce(F.col("text"), F.lit(""))
    payload = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.encode(
                F.concat(
                    F.lit("<html><body><p>"),
                    txt,
                    F.lit("</p></body></html>"),
                ),
                "UTF-8",
            ),
        )
        .when(F.col("doc_id") % 3 == 1, F.encode(txt, "UTF-8"))
        .otherwise(_build_pdf(txt, F.col("doc_id")))
    )
    binary = docs.select("doc_id", payload.alias("content"))
    ex = extract(binary)
    ct_code = (
        F.when(F.col("content_type") == "text/html", 0)
        .when(F.col("content_type") == "text/plain", 1)
        .otherwise(2)
        .cast("long")
    )
    return ex.select(
        "doc_id", "text", ct_code.alias("ct_code"), "n_chars", "is_stub"
    ).orderBy("doc_id")


# ----------------------------------------------------- CJK segmentation

_CJK_FIXTURE = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)),
    "fixtures_data",
    "cjk_segments.parquet",
)


def _cjk_n_phrases() -> int:
    from .analysis.cjk import CJK_PHRASES

    return len(CJK_PHRASES)


@gate(
    "td_cjk_tokens",
    f"""SELECT d.doc_id,
       CAST(f.n_tokens AS BIGINT) AS cjk_n_tokens,
       f.tokens_s AS cjk_tokens_s
FROM documents d
JOIN read_parquet('{_CJK_FIXTURE}') f
  ON f.phrase_id = d.doc_id % {_cjk_n_phrases()}
ORDER BY d.doc_id""",
)
def td_cjk_tokens(spark, sf_dir):
    """CJK dictionary segmentation (kuromoji/nori analog, analysis/
    cjk.py): each doc carries a pinned ja/ko phrase (doc_id-derived),
    segmented LIVE by the Arrow-batched longest-match UDF; the oracle
    joins the golden fixture (scripts/make_cjk_fixture.py) — the Porter
    pattern, so the hash verifies the distributed segmentation
    pipeline against the frozen contract. Reference
    lucene/analysis/kuromoji/.../JapaneseTokenizer.java,
    lucene/analysis/nori/.../KoreanTokenizer.java."""
    from .analysis.cjk import CJK_PHRASES, cjk_tokens_udf

    docs = load(spark, sf_dir, "documents")
    phrases = F.array(*[F.lit(p) for p in CJK_PHRASES])
    toks = cjk_tokens_udf(
        F.element_at(phrases, (F.col("doc_id") % len(CJK_PHRASES) + 1).cast("int"))
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("cjk_n_tokens"),
        F.concat_ws("|", toks).alias("cjk_tokens_s"),
    ).orderBy("doc_id")


# ------------------------------------------- smartcn HHMM segmentation

_ZH_FIXTURE = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)),
    "fixtures_data",
    "smartcn_segments.parquet",
)


def _zh_n_phrases() -> int:
    from .analysis.smartcn import ZH_PHRASES

    return len(ZH_PHRASES)


@gate(
    "td_zh_tokens",
    f"""SELECT d.doc_id,
       CAST(f.n_tokens AS BIGINT) AS zh_n_tokens,
       f.tokens_s AS zh_tokens_s
FROM documents d
JOIN read_parquet('{_ZH_FIXTURE}') f
  ON f.phrase_id = d.doc_id % {_zh_n_phrases()}
ORDER BY d.doc_id""",
)
def td_zh_tokens(spark, sf_dir):
    """Chinese HHMM word segmentation (smartcn rebuild, analysis/
    smartcn.py): each doc carries a pinned zh phrase (doc_id-derived),
    segmented LIVE by the Arrow-batched HHMM Viterbi UDF over the
    reference's own shipped coredict; the oracle joins the frozen JVM
    output (scripts/make_smartcn_fixture.py — the reference
    WordSegmenter compiled as a test oracle, 60k-sentence exact).
    Reference lucene/analysis/smartcn/.../hhmm/HHMMSegmenter.java,
    BiSegGraph.java, SegTokenFilter.java."""
    from .analysis.smartcn import ZH_PHRASES, smartcn_tokens_udf

    docs = load(spark, sf_dir, "documents")
    phrases = F.array(*[F.lit(p) for p in ZH_PHRASES])
    toks = smartcn_tokens_udf(
        F.element_at(phrases, (F.col("doc_id") % len(ZH_PHRASES) + 1).cast("int"))
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("zh_n_tokens"),
        F.concat_ws("|", toks).alias("zh_tokens_s"),
    ).orderBy("doc_id")


# ------------------------------------------- bigram-LM perplexity score

@gate(
    "td_ngram_ppl",
    """
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')),
                                        '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents),
pairs AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM base)),
bc AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
uc AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
v AS (SELECT count(*) AS vocab FROM
      (SELECT DISTINCT w FROM
       (SELECT w1 AS w FROM pairs UNION ALL SELECT w2 FROM pairs))),
scored AS (
  SELECT p.doc_id,
         CAST(round(ln((bc.c12 + 0.5) / (uc.c1 + 0.5 * v.vocab)), 12)
              AS DECIMAL(28,12)) AS logp
  FROM pairs p JOIN bc USING (w1, w2) JOIN uc USING (w1), v),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         round(exp(-CAST(sum(logp) AS DOUBLE) / count(*)), 6) AS ppl
  FROM scored GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(agg.n_bigrams, 0) AS n_bigrams,
       coalesce(agg.ppl, 0.0) AS ppl
FROM documents d LEFT JOIN agg USING (doc_id)
ORDER BY d.doc_id""",
)
def td_ngram_ppl(spark, sf_dir):
    """Bigram-LM perplexity quality score (the KenLM-style corpus-LM
    filter of CCNet/Gopher-class training-data pipelines;
    operators/textqual.py ngram_lm_perplexity): add-0.5-smoothed word
    bigram LM trained on the corpus itself, per-doc
    exp(−mean log P(w2|w1)) with DECIMAL order-independent log sums.
    Scale: two hash-agg shuffles for the counts, broadcast joins back,
    map-side-combined per-doc agg."""
    from .operators.textqual import ngram_lm_perplexity

    docs = load(spark, sf_dir, "documents")
    return ngram_lm_perplexity(docs).orderBy("doc_id")


_PACK_SEQ_LEN = 512

_PACK_SQL = r"""
WITH t AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                         x -> x <> '')) AS BIGINT) AS pk_tokens
  FROM documents
), c AS (
  SELECT doc_id, pk_tokens,
    COALESCE(SUM(pk_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pk_offset
  FROM t
)
SELECT doc_id, pk_tokens, CAST(pk_offset AS BIGINT) AS pk_offset,
  CAST(pk_offset // %d AS BIGINT) AS first_seq,
  CAST((pk_offset + greatest(pk_tokens - 1, 0)) // %d AS BIGINT)
    AS last_seq,
  CAST(CASE WHEN pk_tokens = 0 THEN 0
       ELSE (pk_offset + greatest(pk_tokens - 1, 0)) // %d
            - pk_offset // %d + 1 END AS BIGINT) AS n_seqs
FROM c ORDER BY doc_id""" % (_PACK_SEQ_LEN, _PACK_SEQ_LEN,
                             _PACK_SEQ_LEN, _PACK_SEQ_LEN)


@gate("td_seq_packing", _PACK_SQL)
def td_seq_packing(spark, sf_dir):
    """GPT-style sequence packing — per-document token offset and
    spanned-sequence interval for concat-and-chunk training batches
    (operators/packing.py). The Spark side runs the DISTRIBUTED plan:
    range-repartition + per-partition token sums + driver prefix-sum +
    narrow Arrow cumsum (no single-task global window); the DuckDB
    oracle derives the identical result declaratively with a window
    cumsum. LLM-pipeline first-class operator (no reference
    counterpart — packing is training-data infrastructure)."""
    from .operators.packing import pack_sequences

    packed = pack_sequences(
        load(spark, sf_dir, "documents"), _PACK_SEQ_LEN)
    return packed.select(
        "doc_id",
        F.col("n_tokens").alias("pk_tokens"),
        F.col("offset").alias("pk_offset"),
        "first_seq", "last_seq", "n_seqs",
    ).orderBy("doc_id")


@gate(
    "td_ann_int8_topk",
    """WITH idx AS (SELECT unnest(range(1, 65)) AS i),
st AS (SELECT i, min(CAST(e.embedding[i] AS DOUBLE)) AS mn,
              max(CAST(e.embedding[i] AS DOUBLE)) AS mx
       FROM embeddings e, idx GROUP BY i),
v AS (SELECT e.vec_id, st.i,
             CASE WHEN st.mx = st.mn THEN st.mn
                  ELSE st.mn + (LEAST(255, GREATEST(0,
                         floor((CAST(e.embedding[st.i] AS DOUBLE) - st.mn)
                               / (st.mx - st.mn) * 256))) + 0.5)
                       * (st.mx - st.mn) / 256 END AS vx
      FROM embeddings e, st),
qc AS (SELECT i, vx AS qx FROM v WHERE vec_id = 1),
qn AS (SELECT sqrt(sum(qx * qx)) AS nrm FROM qc),
s AS (SELECT v.vec_id, sum(v.vx * qc.qx) AS dot,
             sqrt(sum(v.vx * v.vx)) AS nrm
      FROM v JOIN qc USING (i) GROUP BY v.vec_id)
SELECT s.vec_id, round(s.dot / (s.nrm * qn.nrm), 4) AS score
FROM s, qn
ORDER BY score DESC, vec_id ASC LIMIT 10""",
)
def td_ann_int8_topk(spark, sf_dir):
    """Int8 scalar-quantized ANN: per-dim corpus [min,max] affine
    codes (256 levels, midpoint decode), cosine top-10 for the
    vec_id=1 query quantized with the SAME stats — the at-rest
    compression path (1 byte/dim, 8× smaller scans) whose recall vs
    exact brute force is pinned ≥0.9 by pytest
    (operators/similarity.py int8_cosine_topk;
    tests/test_training_ops.py)."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.int8_cosine_topk(emb, 1, k=10)


# ----------------------------------- Gopher/C4 pretraining-data filters

_PL_W = 8  # pseudo-line token width (operators/textqual.py pseudo_lines)

_PL_SQL = f"""
pl AS (
  SELECT doc_id,
         unnest(range(0, len(ll))) AS line_id,
         unnest(ll) AS line
  FROM (SELECT doc_id,
               list_transform(range(0, CAST(ceil(len(toks) / {_PL_W}.0)
                   AS BIGINT)),
                 i -> array_to_string(toks[i * {_PL_W} + 1 :
                                           i * {_PL_W} + {_PL_W}], ' '))
                 AS ll
        FROM t))"""


@gate(
    "td_gopher_repetition",
    f"""WITH t AS (SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS toks
       FROM documents),
{_PL_SQL},
lr AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS gr_n_lines,
         CAST(count(*) AS BIGINT) AS gr_distinct_lines,
         round((sum(cnt) - count(*)) / CAST(sum(cnt) AS DOUBLE), 6)
           AS gr_dup_line_frac,
         round(sum((cnt - 1) * chars)
               / CAST(greatest(sum(cnt * chars), 1) AS DOUBLE), 6)
           AS gr_dup_line_char_frac
  FROM (SELECT doc_id, line, count(*) AS cnt, length(line) AS chars
        FROM pl GROUP BY doc_id, line)
  GROUP BY doc_id),
tot AS (SELECT doc_id, length(array_to_string(toks, ' ')) AS tc FROM t),
g2 AS (
  SELECT doc_id, g, count(*) AS cnt, count(*) * length(g) AS cov
  FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
               i -> array_to_string(toks[i : i + 1], ' '))) AS g
        FROM t WHERE len(toks) >= 2)
  GROUP BY doc_id, g),
top2 AS (
  SELECT g2.doc_id,
         round(max(cov) / CAST(max(tot.tc) AS DOUBLE), 6)
           AS gr_top2gram_frac
  FROM g2 JOIN (SELECT doc_id, max(cnt) AS mx FROM g2 GROUP BY doc_id) m
    ON m.doc_id = g2.doc_id AND g2.cnt = m.mx
  JOIN tot ON tot.doc_id = g2.doc_id
  GROUP BY g2.doc_id),
g5 AS (
  SELECT doc_id, g, count(*) AS cnt, count(*) * length(g) AS cov
  FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
               i -> array_to_string(toks[i : i + 4], ' '))) AS g
        FROM t WHERE len(toks) >= 5)
  GROUP BY doc_id, g),
dup5 AS (
  SELECT g5.doc_id,
         round(sum(cov) / CAST(max(tot.tc) AS DOUBLE), 6)
           AS gr_dup5gram_frac
  FROM g5 JOIN tot ON tot.doc_id = g5.doc_id
  WHERE cnt >= 2 GROUP BY g5.doc_id)
SELECT d.doc_id,
       coalesce(gr_n_lines, 0) AS gr_n_lines,
       coalesce(gr_distinct_lines, 0) AS gr_distinct_lines,
       coalesce(gr_dup_line_frac, 0.0) AS gr_dup_line_frac,
       coalesce(gr_dup_line_char_frac, 0.0) AS gr_dup_line_char_frac,
       coalesce(gr_top2gram_frac, 0.0) AS gr_top2gram_frac,
       coalesce(gr_dup5gram_frac, 0.0) AS gr_dup5gram_frac
FROM documents d
LEFT JOIN lr ON lr.doc_id = d.doc_id
LEFT JOIN top2 ON top2.doc_id = d.doc_id
LEFT JOIN dup5 ON dup5.doc_id = d.doc_id
ORDER BY d.doc_id""",
)
def td_gopher_repetition(spark, sf_dir):
    """Gopher repetition filters (Rae et al. 2021 A1.1): duplicate
    pseudo-line fraction + char fraction, top-bigram char coverage,
    duplicated-5-gram char coverage.  Each metric is one partial+final
    hash-agg over exploded lines/shingles — the 100 TB plan is the same
    plan."""
    from .operators import textqual as tq

    docs = load(spark, sf_dir, "documents")
    lines = tq.pseudo_lines(docs, width=_PL_W)
    lr = tq.line_repetition(lines).select(
        "doc_id",
        F.col("n_lines").alias("gr_n_lines"),
        F.col("n_distinct_lines").alias("gr_distinct_lines"),
        F.col("dup_line_frac").alias("gr_dup_line_frac"),
        F.col("dup_line_char_frac").alias("gr_dup_line_char_frac"),
    )
    ng = tq.ngram_repetition(docs, top_n=2, dup_n=5).select(
        "doc_id",
        F.col("top2gram_char_frac").alias("gr_top2gram_frac"),
        F.col("dup5gram_char_frac").alias("gr_dup5gram_frac"),
    )
    return (
        docs.select("doc_id")
        .join(lr, "doc_id", "left")
        .join(ng, "doc_id", "left")
        .fillna({"gr_n_lines": 0, "gr_distinct_lines": 0,
                 "gr_dup_line_frac": 0.0, "gr_dup_line_char_frac": 0.0,
                 "gr_top2gram_frac": 0.0, "gr_dup5gram_frac": 0.0})
        .orderBy("doc_id")
    )


@gate(
    "td_gopher_quality",
    """WITH t AS (SELECT doc_id, coalesce(text, '') AS text,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
                     x -> x <> '') AS words,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS toks
       FROM documents),
f AS (SELECT doc_id,
  len(words) AS n_words,
  CAST(greatest(len(words), 1) AS DOUBLE) AS nz,
  coalesce(list_aggregate(list_transform(words,
      x -> CAST(length(x) AS DOUBLE)), 'sum'), 0.0) AS word_chars,
  len(list_filter(words, x -> starts_with(x, '#')))
    + len(list_filter(words, x -> contains(x, '...'))) AS n_sym,
  len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]')))
    AS n_alpha,
  len(list_intersect(toks, ['the','be','to','of','and','that','have',
      'with'])) AS stop_hits
 FROM t)
SELECT doc_id,
  CAST(n_words AS BIGINT) AS gq_n_words,
  round(word_chars / nz, 6) AS gq_mean_word_len,
  round(n_sym / nz, 6) AS gq_symbol_ratio,
  round(n_alpha / nz, 6) AS gq_alpha_frac,
  CAST(stop_hits AS BIGINT) AS gq_stop_hits,
  CAST(n_words >= 50 AND n_words <= 100000 AS INTEGER) AS gq_words_ok,
  CAST(word_chars / nz >= 3.0 AND word_chars / nz <= 10.0 AS INTEGER)
    AS gq_mean_len_ok,
  CAST(n_sym / nz <= 0.1 AS INTEGER) AS gq_symbol_ok,
  CAST(n_alpha / nz >= 0.8 AS INTEGER) AS gq_alpha_ok,
  CAST(stop_hits >= 2 AS INTEGER) AS gq_stopword_ok,
  CAST(n_words >= 50 AND n_words <= 100000
       AND word_chars / nz >= 3.0 AND word_chars / nz <= 10.0
       AND n_sym / nz <= 0.1 AND n_alpha / nz >= 0.8
       AND stop_hits >= 2 AS INTEGER) AS gq_keep
FROM f ORDER BY doc_id""",
)
def td_gopher_quality(spark, sf_dir):
    """Gopher quality-rule battery (word-count window, mean word
    length, symbol ratio, alpha-word fraction, required stopwords) —
    per-rule flags + the keep conjunction, pure Column exprs."""
    from .operators import textqual as tq

    return tq.gopher_quality(
        load(spark, sf_dir, "documents")
    ).orderBy("doc_id")


@gate(
    "td_c4_lines",
    f"""WITH t AS (SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS toks
       FROM documents),
{_PL_SQL},
dec AS (
  SELECT doc_id, line_id,
         CASE WHEN (doc_id + line_id) % 11 = 0
                THEN line || ' lorem ipsum.'
              WHEN (doc_id + line_id) % 7 = 0 THEN line || ' {{'
              WHEN (doc_id + line_id) % 3 = 0 THEN line || '.'
              ELSE line END AS line
  FROM pl),
k AS (
  SELECT doc_id, line, length(line) AS chars,
         CAST((ends_with(line, '.') OR ends_with(line, '!')
               OR ends_with(line, '?') OR ends_with(line, '"'))
           AND len(regexp_extract_all(lower(line), '[a-z0-9]+')) >= 5
           AND NOT contains(lower(line), 'lorem ipsum')
           AND NOT contains(line, '{{') AS INTEGER) AS keep
  FROM dec),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS c4_n_lines,
         CAST(sum(keep) AS BIGINT) AS c4_kept_lines,
         CAST(sum(CASE WHEN keep = 1 THEN chars ELSE 0 END) AS BIGINT)
           AS c4_kept_chars
  FROM k GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(c4_n_lines, 0) AS c4_n_lines,
       coalesce(c4_kept_lines, 0) AS c4_kept_lines,
       coalesce(c4_kept_chars, 0) AS c4_kept_chars,
       CAST(coalesce(c4_kept_lines, 0) >= 3 AS INTEGER) AS c4_keep_doc
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
ORDER BY d.doc_id""",
)
def td_c4_lines(spark, sf_dir):
    """C4 line-level cleaning (Raffel et al. 2020 §2.2) over pseudo-
    lines with deterministically injected punctuation / 'lorem ipsum' /
    brace markers (same CASE on both engines) so every rule actually
    fires on the synthetic corpus."""
    from .operators import textqual as tq

    docs = load(spark, sf_dir, "documents")
    lines = tq.pseudo_lines(docs, width=_PL_W)
    mod = F.col("doc_id") + F.col("line_id")
    dec = lines.withColumn(
        "line",
        F.when(mod % 11 == 0, F.concat("line", F.lit(" lorem ipsum.")))
        .when(mod % 7 == 0, F.concat("line", F.lit(" {")))
        .when(mod % 3 == 0, F.concat("line", F.lit(".")))
        .otherwise(F.col("line")),
    ).withColumn("n_words", F.size(dd.tokens_col("line")).cast("int"))
    out = tq.c4_line_filter(dec)
    return (
        docs.select("doc_id")
        .join(out, "doc_id", "left")
        .fillna({"c4_n_lines": 0, "c4_kept_lines": 0, "c4_kept_chars": 0})
        .withColumn(
            "c4_keep_doc", (F.col("c4_kept_lines") >= 3).cast("int")
        )
        .orderBy("doc_id")
    )


# ------------------------------- URL canonicalization + dedup (urlnorm)

# Deterministic synthetic URLs (documents carry no URL column): four
# variants per doc id where 0≡1 and 2≡3 after canonicalization, so the
# dedup actually collapses groups.  The SAME CASE expression runs on
# both engines; the canonicalization pipeline is implemented
# independently per engine (Column exprs vs SQL regexes).

_URL_CASE_SQL = """CASE doc_id % 4
  WHEN 0 THEN 'HTTP://WWW.Example.COM:80/a//b/p' || CAST(doc_id % 25 AS VARCHAR)
              || '/?utm_source=x&b=2&a=1#frag'
  WHEN 1 THEN 'http://example.com/a/b/p' || CAST(doc_id % 25 AS VARCHAR)
              || '?a=1&b=2'
  WHEN 2 THEN 'https://Sub.Site.ORG:443/path/p' || CAST(doc_id % 25 AS VARCHAR)
              || '?gclid=99&z=3'
  ELSE 'sub.site.org/path/p' || CAST(doc_id % 25 AS VARCHAR) || '?z=3'
  END"""


@gate(
    "td_url_dedup",
    f"""WITH u AS (SELECT doc_id, {_URL_CASE_SQL} AS url FROM documents),
c AS (
  SELECT doc_id,
    lower(CASE WHEN regexp_matches(u2, '^[A-Za-z][A-Za-z0-9+.-]*://')
          THEN regexp_extract(u2, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)
          ELSE 'http' END) AS scheme,
    regexp_replace(u2, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
  FROM (SELECT doc_id, regexp_replace(trim(url), '#.*$', '') AS u2 FROM u)),
h AS (
  SELECT doc_id, scheme,
    CASE scheme
      WHEN 'http' THEN regexp_replace(
        regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)),
                       '^www\\.', ''), ':80$', '')
      WHEN 'https' THEN regexp_replace(
        regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)),
                       '^www\\.', ''), ':443$', '')
      ELSE regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)),
                          '^www\\.', '') END AS host,
    regexp_replace(rest, '^[^/?]*', '') AS pathq
  FROM c),
p AS (
  SELECT doc_id, scheme, host,
    regexp_replace(regexp_replace(
        regexp_extract(pathq, '^([^?]*)', 1), '/{{2,}}', '/'), '/$', '')
      AS path,
    array_to_string(list_sort(list_filter(
        string_split(regexp_extract(pathq, '\\?(.*)$', 1), '&'),
        x -> x <> '' AND NOT starts_with(x, 'utm_')
             AND NOT starts_with(x, 'fbclid=')
             AND NOT starts_with(x, 'gclid='))), '&') AS qn
  FROM h),
canon AS (
  SELECT doc_id,
    scheme || '://' || host || path
      || CASE WHEN qn <> '' THEN '?' || qn ELSE '' END AS canonical_url,
    host,
    regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS reg_domain
  FROM p),
g AS (SELECT canonical_url, min(doc_id) AS rep_id,
             CAST(count(*) AS BIGINT) AS group_size
      FROM canon GROUP BY canonical_url)
SELECT canon.doc_id, canonical_url, canon.host AS url_host,
       reg_domain, rep_id, group_size,
       CAST(canon.doc_id <> rep_id AS INTEGER) AS is_dup
FROM canon JOIN g USING (canonical_url)
ORDER BY doc_id""",
)
def td_url_dedup(spark, sf_dir):
    """Canonical-URL dedup (operators/urlnorm.py pinned ruleset): the
    crawl pipeline's cheap first dedup stage.  Shuffles only
    (canonical_url, id) with map-side-combined min — exact-dedup scale
    shape."""
    from .operators import urlnorm as un

    docs = load(spark, sf_dir, "documents")
    pN = (F.col("doc_id") % 25).cast("string")
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("HTTP://WWW.Example.COM:80/a//b/p"), pN,
                     F.lit("/?utm_source=x&b=2&a=1#frag")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("http://example.com/a/b/p"), pN,
                     F.lit("?a=1&b=2")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://Sub.Site.ORG:443/path/p"), pN,
                     F.lit("?gclid=99&z=3")),
        )
        .otherwise(
            F.concat(F.lit("sub.site.org/path/p"), pN, F.lit("?z=3"))
        )
    )
    withu = docs.select("doc_id", url.alias("url"))
    out = un.url_dedup(withu)
    hosts = withu.select(
        "doc_id",
        un.url_host(F.col("url")).alias("url_host"),
        un.registered_domain(F.col("url")).alias("reg_domain"),
    )
    return (
        out.join(hosts, "doc_id")
        .select("doc_id", "canonical_url", "url_host", "reg_domain",
                "rep_id", "group_size", "is_dup")
        .orderBy("doc_id")
    )


# --------------------------------- DSIR importance resampling analog


@gate(
    "td_importance",
    """WITH toks AS (
  SELECT doc_id, CAST(doc_id % 5 = 0 AS INTEGER) AS is_target,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+'))
           AS term
  FROM documents),
counts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c_raw,
         CAST(sum(is_target) AS BIGINT) AS c_tgt
  FROM toks GROUP BY term),
tot AS (SELECT sum(c_raw) AS t_raw, sum(c_tgt) AS t_tgt,
               count(*) AS vocab FROM counts),
ratios AS (
  SELECT term,
         CAST(round(ln(((c_tgt + 0.5) / (t_tgt + 0.5 * vocab))
                       / ((c_raw + 0.5) / (t_raw + 0.5 * vocab))), 12)
              AS DECIMAL(28,12)) AS log_ratio
  FROM counts CROSS JOIN tot),
per_doc AS (
  SELECT toks.doc_id,
         CAST(count(*) AS BIGINT) AS n_toks,
         round(CAST(sum(log_ratio) AS DOUBLE), 6) AS log_importance
  FROM toks JOIN ratios USING (term) GROUP BY toks.doc_id),
alld AS (
  SELECT d.doc_id, coalesce(n_toks, 0) AS n_toks,
         coalesce(log_importance, 0.0) AS log_importance
  FROM documents d LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY log_importance DESC, doc_id)
              AS imp_rank,
         (SELECT CAST(ceil(count(*) * 0.25) AS BIGINT) FROM alld) AS nk
  FROM alld)
SELECT doc_id, n_toks, log_importance, CAST(imp_rank AS BIGINT) AS imp_rank,
       CAST(imp_rank <= nk AS INTEGER) AS imp_keep
FROM ranked ORDER BY doc_id""",
)
def td_importance(spark, sf_dir):
    """DSIR importance resampling (operators/importance.py pinned
    unigram variant): target subset = doc_id % 5 == 0; add-0.5 smoothed
    log ratios, DECIMAL-folded, deterministic top-25% keep."""
    from .operators.importance import importance_weights

    docs = load(spark, sf_dir, "documents")
    return importance_weights(
        docs, F.col("doc_id") % 5 == 0
    ).orderBy("doc_id")


# ------------------------- benchmark decontamination (n-gram overlap)

_DECON_K = 5
_DECON_MOD = 97
_DECON_RES = 3

_DECON_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                + 1)) AS pos
  FROM documents),
sh AS (
  SELECT DISTINCT a.doc_id,
         a.term || ' ' || b.term || ' ' || c.term || ' ' || d.term
         || ' ' || e.term AS s
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  JOIN toks d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
  JOIN toks e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4),
bench AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % {_DECON_MOD} = {_DECON_RES}),
tot AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
hit AS (SELECT sh.doc_id, count(*) AS h
        FROM sh JOIN bench ON bench.s = sh.s GROUP BY sh.doc_id)
SELECT d.doc_id,
       CAST(coalesce(tot.n, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(hit.h, 0) AS BIGINT) AS n_contam,
       CASE WHEN coalesce(tot.n, 0) = 0 THEN 0.0
            ELSE round(CAST(coalesce(hit.h, 0) AS DOUBLE)
                       / CAST(tot.n AS DOUBLE), 6) END AS contam_frac,
       CASE WHEN coalesce(tot.n, 0) > 0
                 AND round(CAST(coalesce(hit.h, 0) AS DOUBLE)
                           / CAST(tot.n AS DOUBLE), 6) >= 0.2
            THEN 1 ELSE 0 END AS is_contaminated
FROM documents d
LEFT JOIN tot ON tot.doc_id = d.doc_id
LEFT JOIN hit ON hit.doc_id = d.doc_id
ORDER BY d.doc_id"""


@gate("td_decontamination", _DECON_SQL)
def td_decontamination(spark, sf_dir):
    """Benchmark DECONTAMINATION — the GPT-3/Llama eval-set hygiene
    stage the LLM-pipeline inventory previously lacked: per train doc,
    the fraction of its distinct 5-gram shingles appearing anywhere in
    the benchmark corpus (here the deterministic doc_id % 97 == 3
    slice plays the eval set), flagged at 0.2.  Scale shape: the
    benchmark shingle set broadcasts (eval suites are tiny vs 100 TB),
    so the plan is a narrow shingle map + broadcast semi-join + one
    per-doc hash-agg — no all-pairs, no corpus-wide shuffle beyond the
    aggregation (operators/dedup.py benchmark_contamination)."""
    from .operators.dedup import benchmark_contamination

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(
        F.col("doc_id") % _DECON_MOD == _DECON_RES
    )
    return benchmark_contamination(
        docs, bench, k=_DECON_K
    ).orderBy("doc_id")
