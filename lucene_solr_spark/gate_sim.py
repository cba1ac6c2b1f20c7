"""Driver gates for the SimilarityBase model family (search/simbase.py).

Three tagged-union parts — LM, DFR+IB, DFI+Axiomatic — each verifying
several models in one hash row (model name is a key column). Every
model runs the SAME expression text on Spark and DuckDB
(simbase.sim_expr), scores computed in IEEE double and rounded to 4
decimals on both engines; ordering by the rounded score keeps the
top-20 cut ulp-insensitive. As with ClassicSimilarity, the per-term
float32 cast of the reference's SimScorer.score return is out of
scope (BM25 is the float32-exact parity contract); the statistical
models verify double-precision formula parity.

Reference: lucene/core/src/java/org/apache/lucene/search/similarities/
{LMDirichletSimilarity,LMJelinekMercerSimilarity,DFRSimilarity,
IBSimilarity,DFISimilarity,Axiomatic*}.java.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .gate import _NORM_VALUES, _TOKS, docs_index, gate
from .search.simbase import search_similarity, sim_oracle_sql

_TERMS = ["spark", "merge"]

# (tag, model, params) — one row per verified model configuration.
_LM_MODELS = [
    ("dirichlet_2000", "dirichlet", {"mu": 2000.0}),
    ("dirichlet_500", "dirichlet", {"mu": 500.0}),
    ("jm_050", "jelinek_mercer", {"lam": 0.5}),
    ("jm_025", "jelinek_mercer", {"lam": 0.25}),
]

_DFR_IB_MODELS = [
    ("dfr_g_l_h1", "dfr",
     {"basic_model": "g", "after_effect": "l", "normalization": "h1",
      "c": 1.0}),
    ("dfr_in_b_h2", "dfr",
     {"basic_model": "in", "after_effect": "b", "normalization": "h2",
      "c": 1.0}),
    ("dfr_ine_b_h3", "dfr",
     {"basic_model": "ine", "after_effect": "b", "normalization": "h3",
      "mu": 800.0}),
    ("dfr_if_l_z", "dfr",
     {"basic_model": "if", "after_effect": "l", "normalization": "z",
      "z": 0.30}),
    ("ib_ll_df_h1", "ib",
     {"distribution": "ll", "lam": "df", "normalization": "h1", "c": 1.0}),
    ("ib_spl_ttf_h2", "ib",
     {"distribution": "spl", "lam": "ttf", "normalization": "h2",
      "c": 1.0}),
]

_DFI_AX_MODELS = [
    ("dfi_standardized", "dfi", {"measure": "standardized"}),
    ("dfi_saturated", "dfi", {"measure": "saturated"}),
    ("dfi_chisquared", "dfi", {"measure": "chisquared"}),
    ("ax_f1exp", "axiomatic", {"variant": "f1exp"}),
    ("ax_f1log", "axiomatic", {"variant": "f1log"}),
    ("ax_f2exp", "axiomatic", {"variant": "f2exp"}),
    ("ax_f2log", "axiomatic", {"variant": "f2log"}),
    ("ax_f3exp", "axiomatic", {"variant": "f3exp"}),
    ("ax_f3log", "axiomatic", {"variant": "f3log"}),
]


_MISC_MODELS = [
    ("sweetspot_baseline", "sweetspot", {"variant": "baseline"}),
    ("sweetspot_hyperbolic", "sweetspot", {"variant": "hyperbolic"}),
    ("multi_dirichlet_jm", "multi",
     {"models": (("dirichlet", {"mu": 2000.0}),
                 ("jelinek_mercer", {"lam": 0.5}))}),
    ("legacy_bm25", "legacy_bm25", {"k1": 1.2, "b": 0.75}),
    ("legacy_bm25_09", "legacy_bm25", {"k1": 0.9, "b": 0.4}),
]


def _family_sql(models) -> str:
    subs = [
        f"SELECT '{tag}' AS model, doc_id, score FROM ("
        + sim_oracle_sql(model, _TERMS, _TOKS, _NORM_VALUES, k=20, **params)
        + ")"
        for tag, model, params in models
    ]
    return (
        "SELECT * FROM (\n" + "\nUNION ALL\n".join(subs)
        + "\n) ORDER BY model, score DESC, doc_id ASC"
    )


def _family_gate(spark, sf_dir, models):
    tables = docs_index(spark, sf_dir)
    out = None
    for tag, model, params in models:
        d = (
            search_similarity(tables, _TERMS, model, k=None, **params)
            .withColumn("score", F.round("score", 4))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(20)
            .select(F.lit(tag).alias("model"), "doc_id", "score")
        )
        out = d if out is None else out.unionByName(d)
    return out.orderBy("model", F.desc("score"), F.asc("doc_id"))


@gate("fts_sim_lm", _family_sql(_LM_MODELS))
def fts_sim_lm(spark, sf_dir):
    """Language-model similarities over the unchanged index tables:
    LMDirichlet (mu=2000 default and mu=500) and LMJelinekMercer
    (lambda=0.5, 0.25) — search/simbase.py; reference
    LMDirichletSimilarity.java (score clamped >= 0),
    LMJelinekMercerSimilarity.java, collection probability
    (F+1)/(T+1) per LMSimilarity.DefaultCollectionModel."""
    return _family_gate(spark, sf_dir, _LM_MODELS)


@gate("fts_sim_dfr_ib", _family_sql(_DFR_IB_MODELS))
def fts_sim_dfr_ib(spark, sf_dir):
    """Divergence-from-randomness and information-based families:
    DFR BasicModel{G,In,Ine,IF} x AfterEffect{L,B} x
    Normalization{H1,H2,H3,Z} representative compositions, and
    IB Distribution{LL,SPL} x Lambda{DF,TTF} — search/simbase.py;
    reference DFRSimilarity.java, IBSimilarity.java. Java float32
    intermediates (LambdaDF/TTF, H3's (F+1F)/(T+1F) ratio, float
    constants) replicated via explicit FLOAT casts on both engines."""
    return _family_gate(spark, sf_dir, _DFR_IB_MODELS)


@gate("fts_sim_dfi_ax", _family_sql(_DFI_AX_MODELS))
def fts_sim_dfi_ax(spark, sf_dir):
    """Divergence-from-independence (all three Independence measures)
    and the six Axiomatic retrieval functions (F1/F2/F3 x EXP/LOG,
    s=0.25, k=0.35f, queryLen=1 defaults) — search/simbase.py;
    reference DFISimilarity.java (score 0 when freq <= expected),
    Independence{Standardized,Saturated,ChiSquared}.java,
    Axiomatic.java (max(0, tf*ln*tfln*idf - gamma))."""
    return _family_gate(spark, sf_dir, _DFI_AX_MODELS)


@gate("fts_sim_misc", _family_sql(_MISC_MODELS))
def fts_sim_misc(spark, sf_dir):
    """SweetSpotSimilarity (lucene/misc/.../SweetSpotSimilarity.java —
    plateau length norm, baseline and hyperbolic tf, float32 cast
    points replicated) and MultiSimilarity (similarities/
    MultiSimilarity.java — per-term SUM of Dirichlet + Jelinek-Mercer
    sub-scores) and LegacyBM25Similarity (misc/.../similarity/
    LegacyBM25Similarity.java:65-67 — BM25 with boost*(1+k1), the
    pre-Lucene-8 numerator, two parameterizations) —
    search/simbase.py."""
    return _family_gate(spark, sf_dir, _MISC_MODELS)


# ------------------------------------------ PerFieldSimilarityWrapper

# Title field = first 8 analyzed tokens with its OWN df/avgdl/norm
# statistics (gate.docs_title_index) — same field projection the
# fts_edismax_fields oracle derives.
_TITLE_TOKS = """SELECT doc_id, term FROM (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text),
                '[a-z0-9]+')) + 1)) AS pos
  FROM documents) WHERE pos <= 8"""

_PF_BODY = ("dirichlet", {"mu": 2000.0})
_PF_TITLE = ("dfr", {"basic_model": "in", "after_effect": "b",
                     "normalization": "h2", "c": 1.0})

_PER_FIELD_SQL = f"""
WITH fb AS (SELECT doc_id, score FROM ({
    sim_oracle_sql(_PF_BODY[0], _TERMS, _TOKS, _NORM_VALUES,
                   k=1000000000, **_PF_BODY[1])})),
ft AS (SELECT doc_id, score FROM ({
    sim_oracle_sql(_PF_TITLE[0], _TERMS, _TITLE_TOKS, _NORM_VALUES,
                   k=1000000000, **_PF_TITLE[1])})),
u AS (SELECT * FROM fb UNION ALL SELECT * FROM ft)
SELECT doc_id, round(sum(score), 4) AS score FROM u GROUP BY doc_id
ORDER BY round(sum(score), 4) DESC, doc_id ASC LIMIT 20"""


# ------------------------------------------ PKIndexSplitter (misc)

_PK_SPLIT_SQL = f"""WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
    AS term
  FROM documents WHERE doc_id % 3 = 0),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
nt(lo, hi, qdl) AS (VALUES {_NORM_VALUES}),
qd AS (SELECT dl.doc_id, nt.qdl FROM dl JOIN nt
       ON dl.dl BETWEEN nt.lo AND nt.hi),
stats AS (SELECT count(*) AS doc_count, sum(dl) AS sum_ttf FROM dl),
tf AS (SELECT doc_id, term, count(*) AS freq FROM toks
       WHERE term IN ('spark', 'merge') GROUP BY doc_id, term),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (SELECT tf.doc_id,
  ln(1 + (s.doc_count - d.df + 0.5) / (d.df + 0.5))
    * (tf.freq / (tf.freq + 1.2 * (1.0 - 0.75
       + 0.75 * qd.qdl / (s.sum_ttf / s.doc_count)))) AS ts
  FROM tf JOIN dfs d USING (term)
  JOIN qd ON qd.doc_id = tf.doc_id CROSS JOIN stats s)
SELECT doc_id, round(sum(ts), 4) AS score FROM scored GROUP BY doc_id
ORDER BY round(sum(ts), 4) DESC, doc_id ASC LIMIT 20"""


@gate("fts_pk_split_search", _PK_SPLIT_SQL)
def fts_pk_split_search(spark, sf_dir):
    """PKIndexSplitter end-to-end: split the documents index on the
    predicate doc_id % 3 = 0 WITHOUT re-analysis (index/splitter.py —
    filtered at-rest tables + recomputed df/cf/doc_count/sumTTF) and
    search the first part; results must equal an index that only ever
    held those docs, which is what the oracle computes from scratch
    (reference misc/.../index/PKIndexSplitter.java:49-120 —
    delete-complement + addIndexes preserves per-doc state, stats
    reflect the survivors)."""
    from .index.splitter import pk_index_splitter
    from .search.bruteforce import search_bruteforce

    first, _rest = pk_index_splitter(
        docs_index(spark, sf_dir), F.col("doc_id") % 3 == 0
    )
    out = search_bruteforce(
        first, _TERMS, mode="disjunctive", k=None, precision="double"
    )
    return (
        out.withColumn("score", F.round("score", 4))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


# --------------------------------------- TermAutomatonQuery (sandbox)

_TAQ_SQL = f"""WITH tokp AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text),
                '[a-z0-9]+')) + 1)) AS pos
  FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tokp GROUP BY doc_id),
nt(lo, hi, qdl) AS (VALUES {_NORM_VALUES}),
qd AS (SELECT dl.doc_id, nt.qdl FROM dl JOIN nt
       ON dl.dl BETWEEN nt.lo AND nt.hi),
stats AS (SELECT count(*) AS doc_count, sum(dl) AS sum_ttf FROM dl),
dict AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokp
         WHERE term IN ('spark', 'merge') GROUP BY term),
w AS (SELECT sum(ln(1 + (s.doc_count - d.df + 0.5) / (d.df + 0.5)))
        AS idf FROM dict d CROSS JOIN stats s),
s1 AS (SELECT a.doc_id, count(*) AS c FROM tokp a JOIN tokp b
       ON b.doc_id = a.doc_id AND a.term = 'spark'
          AND b.term = 'merge' AND b.pos = a.pos + 1
       GROUP BY a.doc_id),
s2 AS (SELECT a.doc_id, count(*) AS c FROM tokp a JOIN tokp b
       ON b.doc_id = a.doc_id AND a.term = 'spark'
          AND b.term = 'merge' AND b.pos = a.pos + 2
       GROUP BY a.doc_id),
fr AS (SELECT doc_id, sum(c) AS freq FROM
       (SELECT * FROM s1 UNION ALL SELECT * FROM s2) GROUP BY doc_id),
scored AS (SELECT f.doc_id,
  w.idf * (f.freq / (f.freq + 1.2 * (1.0 - 0.75
           + 0.75 * qd.qdl / (s.sum_ttf / s.doc_count)))) AS score
  FROM fr f JOIN qd ON qd.doc_id = f.doc_id
  CROSS JOIN stats s CROSS JOIN w)
SELECT doc_id, round(score, 4) AS score FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 20"""


@gate("fts_term_automaton", _TAQ_SQL)
def fts_term_automaton(spark, sf_dir):
    """TermAutomatonQuery: the token-graph automaton
    ``spark (ANY | ε) merge`` (accepts [spark, merge] and
    [spark, ANY, merge]); freq = one count per (start position,
    accepted path) — the scorer's multiset NFA-thread walk — scored as
    Σ idf over the automaton's real terms times the BM25 tf norm
    (search/termautomaton.py, literal-scorer-port property test
    tests/test_termautomaton.py; reference lucene/sandbox/.../search/
    TermAutomatonQuery.java:111-190,334-362 +
    TermAutomatonScorer.java:230-345,357-359)."""
    from .gate import doc_tokens
    from .search.termautomaton import TermAutomaton, term_automaton_search

    a = TermAutomaton()
    s1, s2, s3 = a.create_state(), a.create_state(), a.create_state()
    a.add_transition(0, s1, "spark")
    a.add_any_transition(s1, s2)
    a.add_transition(s2, s3, "merge")
    a.add_transition(s1, s3, "merge")
    a.set_accept(s3)
    out = term_automaton_search(
        docs_index(spark, sf_dir), doc_tokens(spark, sf_dir), a, k=None
    )
    return (
        out.withColumn("score", F.round("score", 4))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


# --------------------------------------------- HighFreqTerms (misc)

_HFT_SQL = f"""WITH toks AS ({_TOKS}),
dict AS (SELECT term, count(DISTINCT doc_id) AS df,
                count(*) AS ttf
         FROM toks GROUP BY term),
by_df AS (SELECT 'df' AS mode, term, CAST(df AS BIGINT) AS val,
                 row_number() OVER (ORDER BY df DESC, term DESC) AS rk
          FROM dict QUALIFY rk <= 10),
by_ttf AS (SELECT 'ttf' AS mode, term, CAST(ttf AS BIGINT) AS val,
                  row_number() OVER (ORDER BY ttf DESC, term DESC) AS rk
           FROM dict QUALIFY rk <= 10)
SELECT mode, term, val FROM (
  SELECT mode, term, val FROM by_df
  UNION ALL SELECT mode, term, val FROM by_ttf)
ORDER BY mode, val DESC, term DESC"""


@gate("fts_high_freq_terms", _HFT_SQL)
def fts_high_freq_terms(spark, sf_dir):
    """HighFreqTerms (lucene/misc/.../misc/HighFreqTerms.java:95-133):
    the index-inspection tool's top-N terms under BOTH comparators —
    DocFreqComparator (df, then term bytes) and TotalTermFreqComparator
    (ttf, then term bytes; :141-167 — the lexicographically larger
    term outranks on frequency ties) — read straight off the
    dictionary table (one pruned scan, no postings touch), highest
    first."""
    tables = docs_index(spark, sf_dir)
    d = tables.dictionary
    by_df = (
        d.select(F.lit("df").alias("mode"), "term",
                 F.col("df").cast("long").alias("val"))
        .orderBy(F.desc("val"), F.desc("term")).limit(10)
    )
    by_ttf = (
        d.select(F.lit("ttf").alias("mode"), "term",
                 F.col("cf").cast("long").alias("val"))
        .orderBy(F.desc("val"), F.desc("term")).limit(10)
    )
    return by_df.unionByName(by_ttf).orderBy(
        "mode", F.desc("val"), F.desc("term")
    )


# ------------------------------------------- FuzzyLikeThis (sandbox)


def _flt_src_ctes(tag: str, src: str) -> str:
    ln = len(src)
    return f"""exp{tag} AS (
  SELECT term, df, damerau_levenshtein(term, '{src}') AS ed
  FROM dict WHERE damerau_levenshtein(term, '{src}') <= 2),
st{tag} AS (SELECT count(*) AS nv, sum(df) AS tdf FROM exp{tag}),
eff{tag} AS (SELECT CASE
  WHEN coalesce((SELECT df FROM dict WHERE term = '{src}'), 0) > 0
  THEN (SELECT df FROM dict WHERE term = '{src}')
  ELSE (SELECT tdf // nv FROM st{tag}) END AS df),
var{tag} AS (
  SELECT term,
         1.0 - ed / CAST(least(length(term), {ln}) AS DOUBLE) AS boost,
         row_number() OVER (
           ORDER BY 1.0 - ed / CAST(least(length(term), {ln}) AS DOUBLE)
             DESC, term ASC) AS rk
  FROM exp{tag} QUALIFY rk <= 50),
sc{tag} AS (
  SELECT term, '{src}' AS src,
         boost * boost
           * (ln((s.doc_count + 1) / CAST(e.df + 1 AS DOUBLE)) + 1.0)
           AS st_score
  FROM var{tag} CROSS JOIN stats s CROSS JOIN eff{tag} e)"""


_FLT_SQL = f"""WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
nt(lo, hi, qdl) AS (VALUES {_NORM_VALUES}),
qd AS (SELECT dl.doc_id, nt.qdl FROM dl JOIN nt
       ON dl.dl BETWEEN nt.lo AND nt.hi),
stats AS (SELECT count(*) AS doc_count, sum(dl) AS sum_ttf FROM dl),
dict AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
{_flt_src_ctes('1', 'jion')},
{_flt_src_ctes('2', 'merg')},
allv AS (SELECT * FROM sc1 UNION ALL SELECT * FROM sc2),
kept AS (SELECT term, st_score,
                row_number() OVER (
                  ORDER BY st_score DESC, term ASC, src ASC) AS rk
         FROM allv QUALIFY rk <= 30),
tf AS (SELECT doc_id, term, count(*) AS freq FROM toks
       WHERE term IN (SELECT term FROM kept) GROUP BY doc_id, term),
scored AS (SELECT tf.doc_id,
  k.st_score * ln(1 + (s.doc_count - 1 + 0.5) / (1 + 0.5))
    * (tf.freq / (tf.freq + 1.2 * (1.0 - 0.75
       + 0.75 * qd.qdl / (s.sum_ttf / s.doc_count)))) AS ts
  FROM tf JOIN kept k USING (term)
  JOIN qd ON qd.doc_id = tf.doc_id CROSS JOIN stats s)
SELECT doc_id, round(sum(ts), 4) AS score FROM scored GROUP BY doc_id
ORDER BY round(sum(ts), 4) DESC, doc_id ASC LIMIT 20"""


@gate("fts_fuzzy_like_this", _FLT_SQL)
def fts_fuzzy_like_this(spark, sf_dir):
    """FuzzyLikeThisQuery over 'jion merg' (maxEdits 2, maxNumTerms
    30): per source term the fuzzy variants keep the SOURCE term's idf
    (or the integer-division average df when absent), score = boost² ·
    ClassicSimilarity.idf, global top-30 variants searched as a
    SHOULD-sum of BM25 term queries with ARTIFICIAL df=1 statistics —
    search/fuzzylikethis.py; reference lucene/sandbox/.../queries/
    FuzzyLikeThisQuery.java:191-252,254-273,281-339."""
    from .search.fuzzylikethis import fuzzy_like_this

    out = fuzzy_like_this(
        docs_index(spark, sf_dir), ["jion", "merg"],
        max_edits=2, max_num_terms=30, k=None,
    )
    return (
        out.withColumn("score", F.round("score", 4))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


# ---------------------------------------------------- BM25F (sandbox)

_BM25F_SQL = """WITH tokp AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text),
                '[a-z0-9]+')) + 1)) AS pos
  FROM documents),
dlb AS (SELECT doc_id, count(*) AS dl FROM tokp GROUP BY doc_id),
dlt AS (SELECT doc_id, least(count(*), 8) AS dl FROM tokp GROUP BY doc_id),
nt(lo, hi, qdl) AS (VALUES {NORM_VALUES}),
qdb AS (SELECT d.doc_id, nt.qdl FROM dlb d JOIN nt
        ON d.dl BETWEEN nt.lo AND nt.hi),
qdt AS (SELECT d.doc_id, nt.qdl FROM dlt d JOIN nt
        ON d.dl BETWEEN nt.lo AND nt.hi),
sb AS (SELECT count(*) AS dc, sum(dl) AS sttf FROM dlb),
st AS (SELECT count(*) AS dc, sum(dl) AS sttf FROM dlt),
tfb AS (SELECT doc_id, term, count(*) AS freq FROM tokp
        WHERE term IN ('spark', 'merge') GROUP BY doc_id, term),
tft AS (SELECT doc_id, term, count(*) AS freq FROM tokp
        WHERE term IN ('spark', 'merge') AND pos <= 8
        GROUP BY doc_id, term),
dfb AS (SELECT term, count(*) AS df FROM tfb GROUP BY term),
dft AS (SELECT term, count(*) AS df FROM tft GROUP BY term),
pseudo AS (SELECT
  greatest(coalesce((SELECT max(df) FROM dfb), 0),
           coalesce((SELECT max(df) FROM dft), 0)) AS df,
  greatest((SELECT dc FROM sb), (SELECT dc FROM st)) AS dc,
  (1.0 * (SELECT sttf FROM sb)
   + 2.0 * (SELECT sttf FROM st)) AS sttf),
wf AS (SELECT doc_id, 1.0 * freq AS wf FROM tfb
       UNION ALL SELECT doc_id, 2.0 * freq AS wf FROM tft),
fq AS (SELECT doc_id, sum(wf) AS freq FROM wf GROUP BY doc_id),
nrm AS (SELECT f.doc_id, f.freq,
               CAST(floor(1.0 * qb.qdl + 2.0 * qt.qdl + 0.5) AS BIGINT)
                 AS nv
        FROM fq f JOIN qdb qb USING (doc_id)
        JOIN qdt qt ON qt.doc_id = f.doc_id),
cdl AS (SELECT n.doc_id, n.freq, nt.qdl FROM nrm n JOIN nt
        ON n.nv BETWEEN nt.lo AND nt.hi),
scored AS (SELECT c.doc_id,
  1.0 * ln(1 + (p.dc - p.df + 0.5) / (p.df + 0.5))
      * (c.freq / (c.freq + 1.2 * (1 - 0.75
         + 0.75 * c.qdl / (CAST(p.sttf AS DOUBLE) / p.dc)))) AS score
  FROM cdl c CROSS JOIN pseudo p)
SELECT doc_id, round(score, 4) AS score FROM scored
ORDER BY round(score, 4) DESC, doc_id ASC LIMIT 20""".replace(
    "{NORM_VALUES}", _NORM_VALUES
)


@gate("fts_bm25f", _BM25F_SQL)
def fts_bm25f(spark, sf_dir):
    """BM25FQuery combined-field scoring: body (weight 1) + title
    (weight 2, first-8-tokens field with its own norms) fused into one
    pseudo-field — ALL (field, term) pairs become ONE pseudo-term
    (df = max, per-doc freq = Σ weight·tf), per-doc norm = weighted sum
    of decoded per-field lengths re-quantized through the SmallFloat
    byte, collection stats merged (docCount = max, sumTTF = Σ weight·
    sumTTF) — search/bm25f.py; reference lucene/sandbox/.../search/
    BM25FQuery.java:264-299,389-416 + MultiNormsLeafSimScorer.java:
    124-133."""
    from .gate import docs_title_index
    from .search.bm25f import bm25f

    out = bm25f(
        {
            "body": (docs_index(spark, sf_dir), 1.0),
            "title": (docs_title_index(spark, sf_dir), 2.0),
        },
        _TERMS,
        k=None,
    )
    return (
        out.withColumn("score", F.round("score", 4))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


@gate("fts_sim_per_field", _PER_FIELD_SQL)
def fts_sim_per_field(spark, sf_dir):
    """PerFieldSimilarityWrapper: a two-field SHOULD query where each
    field's term scorers use that FIELD's similarity — body under
    LMDirichlet(mu=2000), title (own df/avgdl/norms) under
    DFR In-B-H2 — summed per doc, exactly how IndexSearcher resolves
    ``wrapper.get(field)`` per TermQuery leaf (reference
    lucene/core/.../similarities/PerFieldSimilarityWrapper.java:19-35;
    Solr SchemaSimilarityFactory.java per-fieldType dispatch). Each
    field's score is computed over ITS index tables (per-field
    collection stats, the wrapper contract), rounded to 4 decimals
    per field on both engines, then summed; top-20 by rounded sum."""
    from .gate import docs_title_index

    body = search_similarity(
        docs_index(spark, sf_dir), _TERMS, _PF_BODY[0], k=None,
        **_PF_BODY[1]
    ).withColumn("score", F.round("score", 4))
    title = search_similarity(
        docs_title_index(spark, sf_dir), _TERMS, _PF_TITLE[0], k=None,
        **_PF_TITLE[1]
    ).withColumn("score", F.round("score", 4))
    return (
        body.unionByName(title)
        .groupBy("doc_id")
        .agg(F.round(F.sum("score"), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )
