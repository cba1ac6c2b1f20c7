"""Extended operator gates: mutations (upsert/delete), significant
terms, CheckIndex invariants, sloppy phrase, approx-distinct, parsed
query strings — the remaining SURVEY.md §2 rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .gate import _TOKS, bm25_sql, _bm25_spark, doc_tokens, docs_index, gate, load


# ----------------------------------------------------- mutations (upsert)

@gate(
    "mut_upsert_delete",
    """WITH updates AS (
  SELECT doc_id, concat('updated content rev ', CAST(doc_id AS VARCHAR)) AS text
  FROM documents WHERE doc_id % 13 = 0),
tombstones AS (SELECT doc_id FROM documents WHERE doc_id % 19 = 0),
merged AS (
  SELECT d.doc_id,
         coalesce(u.text, d.text) AS text,
         u.doc_id IS NOT NULL AS is_updated
  FROM documents d LEFT JOIN updates u USING (doc_id))
SELECT m.doc_id, m.is_updated, length(m.text) AS text_len
FROM merged m
WHERE m.doc_id NOT IN (SELECT doc_id FROM tombstones)
ORDER BY m.doc_id LIMIT 200""",
)
def mut_upsert_delete(spark, sf_dir):
    """IndexWriter.updateDocument + deleteDocuments analog: upsert via
    left join coalesce (MERGE INTO shape), delete via anti-join
    (tombstone/liveDocs analog). Reference: index/IndexWriter.java:1518,
    1585; codecs/lucene50/Lucene50LiveDocsFormat.java."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    updates = docs.filter(F.col("doc_id") % 13 == 0).select(
        "doc_id",
        F.concat(F.lit("updated content rev "), F.col("doc_id").cast("string")).alias(
            "utext"
        ),
    )
    tombstones = docs.filter(F.col("doc_id") % 19 == 0).select("doc_id")
    merged = (
        docs.join(updates, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("utext"), F.col("text")).alias("text"),
            F.col("utext").isNotNull().alias("is_updated"),
        )
        .join(tombstones, "doc_id", "left_anti")
    )
    return (
        merged.select("doc_id", "is_updated", F.length("text").alias("text_len"))
        .orderBy("doc_id")
        .limit(200)
    )


# ------------------------------------------------------ significant terms

@gate(
    "fts_significant_terms",
    f"""WITH toks AS ({_TOKS}),
fg_docs AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'spark'),
n AS (SELECT (SELECT count(DISTINCT doc_id) FROM toks) AS n_docs,
             (SELECT count(*) FROM fg_docs) AS n_fg),
fg AS (SELECT term, count(DISTINCT doc_id) AS fg_df
       FROM toks WHERE doc_id IN (SELECT doc_id FROM fg_docs) GROUP BY term),
bg AS (SELECT term, count(DISTINCT doc_id) AS bg_df FROM toks GROUP BY term)
SELECT fg.term, fg.fg_df, bg.bg_df,
       round((CAST(fg.fg_df AS DOUBLE) / n.n_fg)
             / (CAST(bg.bg_df AS DOUBLE) / n.n_docs), 4) AS lift
FROM fg JOIN bg USING (term) CROSS JOIN n
WHERE fg.fg_df >= 5
ORDER BY lift DESC, term ASC LIMIT 15""",
)
def fts_significant_terms(spark, sf_dir):
    """SignificantTermsStream analog: foreground (docs matching 'spark')
    vs background document frequency lift."""
    tok = doc_tokens(spark, sf_dir).select("doc_id", "term")
    fg_docs = tok.filter(F.col("term") == "spark").select("doc_id").distinct()
    n_docs = tok.select("doc_id").distinct().count()
    n_fg = fg_docs.count()
    fg = (
        tok.join(fg_docs, "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("fg_df"))
    )
    bg = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("bg_df"))
    return (
        fg.join(bg, "term")
        .filter(F.col("fg_df") >= 5)
        .select(
            "term",
            "fg_df",
            "bg_df",
            F.round(
                (F.col("fg_df").cast("double") / F.lit(float(n_fg)))
                / (F.col("bg_df").cast("double") / F.lit(float(n_docs))),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("term"))
        .limit(15)
    )


# --------------------------------------------------- CheckIndex invariants

@gate(
    "fts_index_invariants",
    f"""WITH toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*) AS freq FROM toks GROUP BY doc_id, term)
SELECT count(DISTINCT term) AS n_terms,
       count(*) AS sum_df,
       sum(freq) AS sum_cf,
       count(DISTINCT doc_id) AS doc_count
FROM tf""",
)
def fts_index_invariants(spark, sf_dir):
    """CheckIndex analog (reference index/CheckIndex.java:1239-1284,
    1647-1657): the BUILT index's dictionary stats must equal values
    recomputed from the raw corpus — here Spark aggregates the real
    index tables while the oracle recomputes from raw text."""
    tables = docs_index(spark, sf_dir)
    return tables.dictionary.agg(
        F.count("*").alias("n_terms"),
        F.sum("df").alias("sum_df"),
        F.sum("cf").alias("sum_cf"),
        F.lit(tables.doc_count).cast("long").alias("doc_count"),
    )


# --------------------------------------------------------- sloppy phrase

@gate(
    "fts_phrase_sloppy",
    f"""WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) + 1)) AS pos
  FROM documents)
SELECT DISTINCT a.doc_id AS doc_id FROM tok a JOIN tok b
  ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 3
WHERE a.term = 'slow' AND b.term = 'query'
ORDER BY doc_id ASC""",
)
def fts_phrase_sloppy(spark, sf_dir):
    """Sloppy PhraseQuery (ordered, slop=2) answered from the POSITIONAL
    INDEX: chain gaps in [1, slop+1] over positional posting blocks.
    Reference: search/SloppyPhraseMatcher.java (simplified ordered-slop
    semantics, pinned as this engine's contract)."""
    from .gate import docs_pos_index
    from .search.phrase import search_phrase

    index = docs_pos_index(spark, sf_dir)
    return (
        search_phrase(index, ["slow", "query"], slop=2)
        .select("doc_id")
        .orderBy("doc_id")
    )


@gate(
    "fts_multiphrase",
    f"""WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) + 1)) AS pos
  FROM documents)
SELECT a.doc_id AS doc_id, count(*) AS phrase_freq FROM tok a JOIN tok b
  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'slow' AND b.term IN ('query', 'key')
GROUP BY a.doc_id
ORDER BY doc_id ASC""",
)
def fts_multiphrase(spark, sf_dir):
    """MultiPhraseQuery: "slow (query|key)" — a slot with alternative
    terms, answered from the positional index. Reference:
    search/MultiPhraseQuery.java (UnionPostingsEnum per slot)."""
    from .gate import docs_pos_index
    from .search.phrase import search_phrase

    index = docs_pos_index(spark, sf_dir)
    return (
        search_phrase(index, ["slow", ["query", "key"]], slop=0)
        .select("doc_id", "phrase_freq")
        .orderBy("doc_id")
    )


# -------------------------------------------------------- approx distinct

@gate("rel_hll_user_count")  # rows-only: HLL sketches differ per engine
def rel_hll_user_count(spark, sf_dir):
    """HLLAgg analog: approx_count_distinct per event_type (sketch
    algorithms differ between engines, so the driver records the weaker
    rows-only check; the exact-distinct twin is rel_stats_lineitem)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
        .orderBy("event_type")
    )


# -------------------------------------------------------- parsed queries

_PARSED_Q = "spark AND merge -vector"


def _parsed_spec():
    from .search.queryparser import parse_query

    p = parse_query(_PARSED_Q)
    return p


@gate(
    "fts_parsed_query",
    bm25_sql(["spark", "merge"], "conjunctive", 10, exclude=["vector"]),
)
def fts_parsed_query(spark, sf_dir):
    """Classic query-string surface: parse 'spark AND merge -vector' →
    MUST[spark,merge] MUST_NOT[vector] → scored boolean query.
    Reference grammar: queryparser/.../classic/QueryParser.jj:66-67."""
    p = _parsed_spec()
    return _bm25_spark(
        spark, sf_dir, p.terms, p.mode, 10, exclude=p.exclude
    )
