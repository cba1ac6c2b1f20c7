"""Extended operator gates: mutations (upsert/delete), significant
terms, CheckIndex invariants, sloppy phrase, approx-distinct, parsed
query strings — the remaining SURVEY.md §2 rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .gate import (_NORM_VALUES, _TOKS, bm25_scored_cte, bm25_sql,
                   _bm25_spark, doc_tokens, docs_index, gate, load)
from .search.bruteforce import search_bruteforce


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
        merged.select(
            "doc_id",
            "is_updated",
            F.length("text").cast("long").alias("text_len"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@gate(
    "mut_atomic_update",
    """WITH base AS (
  SELECT doc_id, lang, n_chars, [source] AS tags FROM documents
  WHERE doc_id < 200),
fin AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN 'xx' ELSE lang END AS lang,
         n_chars + CASE WHEN doc_id % 7 = 0 THEN 7 ELSE 0 END AS n_chars,
         list_sort(
           CASE WHEN doc_id % 3 = 0
                THEN list_filter(
                       CASE WHEN doc_id % 5 = 0
                            THEN list_append(tags, 'extra') ELSE tags END,
                       t -> t <> 'src1')
                WHEN doc_id % 5 = 0 THEN list_append(tags, 'extra')
                ELSE tags END) AS tags
  FROM base)
SELECT doc_id,
       concat(lang, ':', array_to_string(tags, ',')) AS state,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(len(tags) AS BIGINT) AS n_tags
FROM fin ORDER BY doc_id""",
)
def mut_atomic_update(spark, sf_dir):
    """Solr atomic updates: a modifier stream (set lang, inc n_chars,
    add tag, remove tag) merged into stored docs via ONE conditional-
    aggregation pivot + left join (operators/atomic.py; reference
    solr/core/.../update/processor/AtomicUpdateDocumentMerger.java:
    117-220). The oracle states the expected FINAL document state
    directly, so the op machinery itself is what's verified."""
    from .operators.atomic import apply_atomic_updates

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    base = docs.select(
        "doc_id", "lang", "n_chars", F.array("source").alias("tags")
    )
    d = F.col("doc_id")
    upd_set = docs.filter(d % 11 == 0).select(
        "doc_id", F.lit("lang").alias("field"), F.lit("set").alias("op"),
        F.lit("xx").alias("value"),
    )
    upd_inc = docs.filter(d % 7 == 0).select(
        "doc_id", F.lit("n_chars").alias("field"), F.lit("inc").alias("op"),
        F.lit("7").alias("value"),
    )
    upd_add = docs.filter(d % 5 == 0).select(
        "doc_id", F.lit("tags").alias("field"), F.lit("add").alias("op"),
        F.lit("extra").alias("value"),
    )
    upd_rm = docs.filter(d % 3 == 0).select(
        "doc_id", F.lit("tags").alias("field"), F.lit("remove").alias("op"),
        F.lit("src1").alias("value"),
    )
    updates = upd_set.unionByName(upd_inc).unionByName(upd_add).unionByName(
        upd_rm
    )
    out = apply_atomic_updates(base, updates)
    return out.select(
        "doc_id",
        F.concat(
            F.col("lang"), F.lit(":"),
            F.array_join(F.array_sort("tags"), ","),
        ).alias("state"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size("tags").cast("long").alias("n_tags"),
    ).orderBy("doc_id")


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
    # both corpus sizes in ONE single-row aggregate, broadcast-joined —
    # no driver-side count() jobs (the fn_scale_query bounds pattern)
    n = tok.agg(F.countDistinct("doc_id").alias("n_docs")).crossJoin(
        fg_docs.agg(F.count("*").alias("n_fg"))
    )
    fg = (
        tok.join(fg_docs, "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("fg_df"))
    )
    bg = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("bg_df"))
    return (
        fg.join(bg, "term")
        .filter(F.col("fg_df") >= 5)
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            "fg_df",
            "bg_df",
            F.round(
                (F.col("fg_df").cast("double") / F.col("n_fg").cast("double"))
                / (F.col("bg_df").cast("double") / F.col("n_docs").cast("double")),
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
       CAST(sum(freq) AS BIGINT) AS sum_cf,
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

@gate(
    "rel_hll_user_count",
    """SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS hll_ok
FROM events GROUP BY event_type ORDER BY event_type""",
)
def rel_hll_user_count(spark, sf_dir):
    """HLLAgg analog, bound-checked: the HLL sketch itself differs per
    engine, so the verifiable contract is |approx - exact| <= 3*rsd —
    Spark emits the exact distinct count plus a boolean attesting its
    HLL++ estimate (rsd=0.02) is within that bound; the oracle computes
    the exact count and asserts the bound held (hll_ok must be TRUE)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.lit(3 * 0.02) * F.col("exact_users")
            ).alias("hll_ok"),
        )
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


def _run_parsed(spark, sf_dir, q: str, k: int = 10):
    """End-to-end parse → _execute_general over the docs index, with the
    documents table as the stored-field source for filters."""
    from .search.executor import execute_parsed

    tables = docs_index(spark, sf_dir)
    stored = load(spark, sf_dir, "documents")
    res = execute_parsed(q, tables, k=None, precision="double", stored=stored)
    return (
        res.withColumn("score", F.round("score", 4))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


@gate(
    "fts_parsed_mixed",
    f"""WITH {bm25_scored_cte(["spark", "merge", "window"])},
req AS (SELECT doc_id, sum(term_score) AS s FROM scored
        WHERE term = 'spark' GROUP BY doc_id),
opt AS (SELECT doc_id, sum(term_score) AS s FROM scored
        WHERE term IN ('merge','window') GROUP BY doc_id)
SELECT r.doc_id, round(r.s + coalesce(o.s, 0), 4) AS score
FROM req r LEFT JOIN opt o USING (doc_id)
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def fts_parsed_mixed(spark, sf_dir):
    """Mixed MUST + optional SHOULD ('+spark merge window'): required
    term gates the match set, optional terms add score when present —
    ReqOptSumScorer (reference search/Boolean2ScorerSupplier.java:
    168-174, ReqOptSumScorer.java)."""
    return _run_parsed(spark, sf_dir, "+spark merge window")


@gate(
    "fts_parsed_escaped",
    f"""WITH {bm25_scored_cte(["spark", "vector"])},
req AS (SELECT doc_id, sum(term_score) AS s FROM scored
        WHERE term = 'spark' GROUP BY doc_id),
opt AS (SELECT doc_id, sum(term_score) AS s FROM scored
        WHERE term = 'vector' GROUP BY doc_id)
SELECT r.doc_id, round(r.s + coalesce(o.s, 0), 4) AS score
FROM req r LEFT JOIN opt o USING (doc_id)
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def fts_parsed_escaped(spark, sf_dir):
    r"""Escaping end-to-end: '+spark s\* merge\~1 vector' — the escaped
    tokens are the LITERAL terms 's*' and 'merge~1' (absent from the
    corpus, zero contribution), NEVER a prefix expansion of 's' or a
    fuzzy of 'merge' (either would change every score). Reference
    queryparser/.../classic/QueryParser.jj <_ESCAPED_CHAR>,
    QueryParserBase.escape (search/queryparser.py _encode_escapes)."""
    return _run_parsed(spark, sf_dir, r"+spark s\* merge\~1 vector")


@gate(
    "fts_complex_phrase",
    f"""WITH toks AS ({_TOKS}),
tokp AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) + 1)) AS pos
  FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
nt(lo, hi, qdl) AS (VALUES {_NORM_VALUES}),
qd AS (SELECT dl.doc_id, nt.qdl FROM dl JOIN nt ON dl.dl BETWEEN nt.lo AND nt.hi),
stats AS (SELECT count(*) AS doc_count, sum(dl) AS sum_ttf FROM dl),
s1 AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
       WHERE term IN ('slow', 'fast') GROUP BY term),
s2 AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
       WHERE term LIKE 's%' GROUP BY term ORDER BY term LIMIT 50),
widf AS (SELECT
  (SELECT sum(ln(1 + (s.doc_count - df + 0.5) / (df + 0.5)))
   FROM s1 CROSS JOIN stats s)
  + (SELECT sum(ln(1 + (s.doc_count - df + 0.5) / (df + 0.5)))
     FROM s2 CROSS JOIN stats s) AS w),
ph AS (SELECT a.doc_id, count(DISTINCT b.pos) AS pf
       FROM tokp a JOIN tokp b
         ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 2
       WHERE a.term IN (SELECT term FROM s1)
         AND b.term IN (SELECT term FROM s2)
       GROUP BY a.doc_id)
SELECT ph.doc_id, CAST(ph.pf AS BIGINT) AS phrase_freq,
       round(w.w * (ph.pf / (ph.pf
         + 1.2 * (1.0 - 0.75 + 0.75 * qd.qdl / (s.sum_ttf / s.doc_count)))),
         4) AS score
FROM ph JOIN qd USING (doc_id) CROSS JOIN stats s CROSS JOIN widf w
ORDER BY doc_id ASC""",
)
def fts_complex_phrase(spark, sf_dir):
    """ComplexPhraseQueryParser: '"(slow fast) s*"~1' — slot 1 is a
    disjunction group, slot 2 a prefix expanded against the dictionary
    (term-asc cut at 50), matched as a MultiPhraseQuery with slop=1 and
    scored with idf summed over every alternative (reference
    queryparser/.../complexPhrase/ComplexPhraseQueryParser.java;
    search/complexphrase.py)."""
    from .gate import docs_pos_index
    from .search.complexphrase import complex_phrase

    index = docs_pos_index(spark, sf_dir)
    return (
        complex_phrase(index, '"(slow fast) s*"~1', k=None,
                       precision="double")
        .select("doc_id", "phrase_freq",
                F.round("score", 4).alias("score"))
        .orderBy("doc_id")
    )


@gate(
    "fts_parsed_group_range",
    f"""WITH {bm25_scored_cte(["spark", "merge", "window"])},
req AS (SELECT doc_id, sum(term_score) AS s,
               count(DISTINCT CASE WHEN term = 'spark' THEN term END) AS n_must,
               count(DISTINCT CASE WHEN term IN ('window','merge') THEN 1 END)
                 AS n_grp
        FROM scored GROUP BY doc_id)
SELECT r.doc_id, round(r.s, 4) AS score
FROM req r JOIN documents d ON d.doc_id = r.doc_id
WHERE r.n_must = 1 AND r.n_grp = 1
  AND d.lang = 'en' AND d.doc_id BETWEEN 100 AND 4999
ORDER BY score DESC, r.doc_id ASC LIMIT 10""",
)
def fts_parsed_group_range(spark, sf_dir):
    """Full-grammar query '(window OR merge) AND spark lang:en
    doc_id:[100 TO 4999]': required disjunction group (>=1 of
    window/merge must match, all matching members contribute score —
    BooleanQuery-inside-MUST), required term, constant-score field
    filter, and an inclusive range filter (PointRangeQuery /
    IndexOrDocValuesQuery analog; reference queryparser/.../classic/
    QueryParser.jj:195-226 range production)."""
    return _run_parsed(
        spark, sf_dir, "(window OR merge) AND spark lang:en doc_id:[100 TO 4999]"
    )


@gate(
    "fts_parsed_expand",
    f"""WITH {bm25_scored_cte(["spark"])},
req AS (SELECT doc_id, sum(term_score) AS s FROM scored GROUP BY doc_id),
wc AS (SELECT DISTINCT doc_id FROM toks WHERE term LIKE 's_a%'),
fz AS (SELECT DISTINCT doc_id FROM toks
       WHERE damerau_levenshtein(term, 'scan') <= 1),
rx AS (SELECT DISTINCT doc_id FROM toks
       WHERE regexp_matches(term, '^(?:(jo|gr)[a-z]+n)$')),
neg AS (SELECT DISTINCT doc_id FROM toks WHERE term LIKE 'vect%')
SELECT r.doc_id,
       round(r.s + CASE WHEN wc.doc_id IS NOT NULL THEN 2.0 ELSE 0 END
                 + CASE WHEN fz.doc_id IS NOT NULL THEN 1.0 ELSE 0 END
                 + CASE WHEN rx.doc_id IS NOT NULL THEN 1.0 ELSE 0 END,
             4) AS score
FROM req r
LEFT JOIN wc USING (doc_id)
LEFT JOIN fz USING (doc_id)
LEFT JOIN rx USING (doc_id)
WHERE r.doc_id NOT IN (SELECT doc_id FROM neg)
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def fts_parsed_expand(spark, sf_dir):
    """Term-level multi-term syntax end-to-end from the query STRING:
    '+spark s?a*^2 scan~1 /(jo|gr)[a-z]+n/ -vect*' — required BM25 term,
    boosted wildcard, fuzzy (Damerau-Levenshtein <= 1), anchored regexp,
    and a prohibited prefix, each rewritten to a constant-score
    dictionary expansion (reference queryparser/.../classic/
    QueryParser.jj:195-226 <WILDTERM>/<FUZZY_SLOP>/<REGEXPTERM>;
    search/MultiTermQueryConstantScoreWrapper.java). The fuzzy clause
    pins the documented constant-score rewrite rather than Lucene's
    default blended-freq rewrite so the score is SQL-reproducible."""
    return _run_parsed(
        spark, sf_dir, "+spark s?a*^2 scan~1 /(jo|gr)[a-z]+n/ -vect*"
    )


@gate(
    "fts_parsed_fieldgroup",
    f"""WITH {bm25_scored_cte(["spark", "merge", "window"])},
agg AS (SELECT doc_id,
         sum(CASE WHEN term = 'spark' THEN term_score ELSE 0 END) AS s_must,
         sum(CASE WHEN term IN ('merge', 'window')
                  THEN 2.0 * term_score ELSE 0 END) AS s_opt,
         count(DISTINCT CASE WHEN term = 'spark' THEN term END) AS n_must
        FROM scored GROUP BY doc_id)
SELECT a.doc_id, round(a.s_must + a.s_opt, 4) AS score
FROM agg a JOIN documents d ON d.doc_id = a.doc_id
WHERE a.n_must = 1 AND d.lang IN ('en', 'fr')
ORDER BY score DESC, a.doc_id ASC LIMIT 10""",
)
def fts_parsed_fieldgroup(spark, sf_dir):
    """Fielded group + trailing group boost from the query STRING:
    '+spark (merge window)^2 lang:(en fr)' — the group boost distributes
    onto each member's boost (search/BoostQuery.java over the boolean
    sum), the fielded group becomes a constant-score IN filter on the
    stored field (Solr {!terms} / fq analog). Both constructs previously
    mis-parsed silently (round-2 ADVICE.md items 1-2)."""
    return _run_parsed(spark, sf_dir, "+spark (merge window)^2 lang:(en fr)")


@gate(
    "fts_fuzzy_dl_expand",
    f"""WITH toks AS ({_TOKS})
SELECT term, count(DISTINCT doc_id) AS df FROM toks
WHERE damerau_levenshtein(term, 'jion') <= 1
GROUP BY term ORDER BY term ASC""",
)
def fts_fuzzy_dl_expand(spark, sf_dir):
    """FuzzyQuery with transpositions=true (the Lucene DEFAULT —
    search/FuzzyQuery.java:68-88): 'jions'~1 matches 'joins' (adjacent
    transposition = ONE edit; classic Levenshtein would need 2).
    Expansion over the tiny dictionary via the Arrow-batched restricted
    DL distance (functions/editdist.py)."""
    from .functions.editdist import damerau_levenshtein

    tables = docs_index(spark, sf_dir)
    return (
        tables.dictionary.filter(
            damerau_levenshtein(F.col("term"), "jion") <= 1
        )
        .select("term", "df")
        .orderBy(F.asc("term"))
    )


@gate(
    "fts_fuzzy_scored",
    f"""WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
nt(lo, hi, qdl) AS (VALUES {_NORM_VALUES}),
qd AS (SELECT dl.doc_id, nt.qdl FROM dl JOIN nt
       ON dl.dl BETWEEN nt.lo AND nt.hi),
stats AS (SELECT count(*) AS doc_count, sum(dl) AS sum_ttf FROM dl),
dict AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
exp AS (SELECT term, df, damerau_levenshtein(term, 'jion') AS ed
        FROM dict WHERE damerau_levenshtein(term, 'jion') <= 2),
bst AS (SELECT term, df,
               1.0 - ed / CAST(least(length(term), 4) AS DOUBLE) AS boost
        FROM exp WHERE ed < least(length(term), 4)),
kept AS (SELECT term, df, boost,
                row_number() OVER (ORDER BY boost DESC, term ASC)
                  AS rk
         FROM bst QUALIFY rk <= 50),
blend AS (SELECT max(df) AS dfb FROM kept),
tf AS (SELECT doc_id, term, count(*) AS freq FROM toks
       WHERE term IN (SELECT term FROM kept) GROUP BY doc_id, term),
scored AS (
  SELECT tf.doc_id,
         k.boost * ln(1 + (s.doc_count - bl.dfb + 0.5) / (bl.dfb + 0.5))
           * (tf.freq / (tf.freq
              + 1.2 * (1.0 - 0.75 + 0.75 * qd.qdl / (s.sum_ttf / s.doc_count))))
           AS term_score
  FROM tf JOIN kept k USING (term)
  JOIN qd ON qd.doc_id = tf.doc_id
  CROSS JOIN stats s CROSS JOIN blend bl)
SELECT doc_id, round(sum(term_score), 4) AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 20""",
)
def fts_fuzzy_scored(spark, sf_dir):
    """FuzzyQuery 'jion'~2 under the DEFAULT scoring rewrite
    (TopTermsBlendedFreqScoringRewrite): per-term similarity boost
    1 - ed/min(|q|,|t|), top-50 expansions by (boost desc, term asc —
    TopTermsRewrite.java:116-118 breaks boost ties by term bytes only,
    never docFreq), df blended
    to the max, SHOULD-sum scoring (search/fuzzyq.py; reference
    search/FuzzyQuery.java:60-75, MultiTermQuery.java:180-196,
    BlendedTermQuery.java:268-287)."""
    from .search.fuzzyq import fuzzy_scored

    tables = docs_index(spark, sf_dir)
    # the top-20 cut is taken on the ROUNDED score (doc_id tie-break) so
    # both engines pick the same members of a rounded-score tie — a ~50-
    # term double sum differs in final ulps across engines
    return (
        fuzzy_scored(tables, "jion", max_edits=2, k=None, precision="double")
        .withColumn("score", F.round("score", 4))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


# ------------------------------------------------- JoinUtil score modes

@gate(
    "fts_join_scores",
    f"""WITH {bm25_scored_cte(["spark", "merge", "window"])},
ds AS (SELECT doc_id, sum(term_score) AS score FROM scored GROUP BY doc_id)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_matching,
       round(max(ds.score), 4) AS score_max,
       round(min(ds.score), 4) AS score_min,
       round(CAST(sum(CAST(round(ds.score, 9) AS DECIMAL(28,9)))
                  AS DOUBLE), 4) AS score_total,
       round(CAST(sum(CAST(round(ds.score, 9) AS DECIMAL(28,9)))
                  AS DOUBLE) / count(*), 4) AS score_avg
FROM ds JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY d.source""",
)
def fts_join_scores(spark, sf_dir):
    """JoinUtil query-time score propagation (reference lucene/join/
    .../JoinUtil.java, ScoreMode.Max/Min/Total/Avg + GlobalOrdinalsWith-
    ScoreQuery): child documents matching a BM25 query join to their
    parent key (source) and the parent's score aggregates child scores
    per mode — one hash-agg over the scored child set, order-independent
    DECIMAL for the Total/Avg sums."""
    tables = docs_index(spark, sf_dir)
    child = search_bruteforce(
        tables, ["spark", "merge", "window"], "disjunctive",
        k=None, precision="double",
    )
    parents = load(spark, sf_dir, "documents").select("doc_id", "source")
    dec = F.round(F.col("score"), 9).cast("decimal(28,9)")
    return (
        child.join(parents, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_matching"),
            F.round(F.max("score"), 4).alias("score_max"),
            F.round(F.min("score"), 4).alias("score_min"),
            F.round(F.sum(dec).cast("double"), 4).alias("score_total"),
            F.round(
                F.sum(dec).cast("double") / F.count("*"), 4
            ).alias("score_avg"),
        )
        .orderBy("source")
    )


# ---------------------------------------------- round-2 coverage widening
# RegexpQuery, BoostQuery, FetchStream, PointInSetQuery, ExportStream,
# and Solr function queries (ValueSourceParser analogs).

@gate(
    "fts_regexp_expand",
    f"""WITH toks AS ({_TOKS})
SELECT term, count(DISTINCT doc_id) AS df FROM toks
WHERE regexp_matches(term, '^.*(er|le)$')
GROUP BY term ORDER BY term ASC""",
)
def fts_regexp_expand(spark, sf_dir):
    """RegexpQuery: regex expansion over the term dictionary (reference:
    search/RegexpQuery.java, index/AutomatonTermsEnum.java — automaton ∩
    term dict; here Catalyst evaluates RLIKE over the dictionary table,
    partition-pruned to nothing but the tiny dictionary)."""
    from .gate import docs_index

    tables = docs_index(spark, sf_dir)
    return (
        tables.dictionary.filter(F.col("term").rlike("^.*(er|le)$"))
        .select("term", "df")
        .orderBy(F.asc("term"))
    )


@gate(
    "fts_boost_clauses",
    bm25_sql(
        ["spark", "merge"], "disjunctive", 10,
        boosts={"spark": 2.5, "merge": 0.5},
    ),
)
def fts_boost_clauses(spark, sf_dir):
    """BoostQuery per clause: spark^2.5 OR merge^0.5 (reference:
    search/BoostQuery.java — weight = boost * idf)."""
    from .gate import _bm25_spark

    return _bm25_spark(
        spark, sf_dir, ["spark", "merge"], "disjunctive", 10,
        boosts={"spark": 2.5, "merge": 0.5},
    )


@gate(
    "fn_query_boost",
    f"""WITH main AS ({bm25_sql(["spark"], "disjunctive", 100000)}),
sub AS ({bm25_sql(["merge"], "disjunctive", 100000)})
SELECT m.doc_id,
       round(m.score * (1 + 0.5 * coalesce(s.score, 0.0)), 4) AS score
FROM main m LEFT JOIN sub s ON s.doc_id = m.doc_id
ORDER BY score DESC, m.doc_id ASC LIMIT 20""",
)
def fn_query_boost(spark, sf_dir):
    """query($q, default) value source + FunctionScoreQuery.boostByQuery:
    BM25('spark') rescored by 1 + 0.5*query(BM25('merge'), def=0) —
    the Solr boost-qparser shape (ValueSourceParser.java `query`
    registration / lucene/queries FunctionScoreQuery.boostByQuery).
    Composition is a doc_id equi-join of two per-doc score frames
    (functions/valuesource.py query_boost) — co-partitionable at scale,
    broadcast when the boost query is selective."""
    from .functions.valuesource import query_boost
    from .gate import _bm25_spark

    main = _bm25_spark(spark, sf_dir, ["spark"], "disjunctive", 100000)
    sub = _bm25_spark(spark, sf_dir, ["merge"], "disjunctive", 100000)
    return (
        query_boost(main, sub, factor=0.5, default=0.0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


@gate(
    "fts_classic_tfidf",
    f"""WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
nt(lo, hi, qdl) AS (VALUES {_NORM_VALUES}),
qd AS (SELECT dl.doc_id, nt.qdl FROM dl JOIN nt
       ON dl.dl BETWEEN nt.lo AND nt.hi),
stats AS (SELECT count(*) AS doc_count FROM dl),
tf AS (SELECT doc_id, term, count(*) AS freq FROM toks
       WHERE term IN ('spark', 'merge') GROUP BY doc_id, term),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         power(1 + ln((s.doc_count + 1.0) / (d.df + 1.0)), 2)
           * sqrt(tf.freq) / sqrt(qd.qdl) AS ts
  FROM tf JOIN dfs d USING (term)
  JOIN qd ON qd.doc_id = tf.doc_id CROSS JOIN stats s)
SELECT doc_id, round(sum(ts), 4) AS score FROM scored GROUP BY doc_id
ORDER BY round(sum(ts), 4) DESC, doc_id ASC LIMIT 20""",
)
def fts_classic_tfidf(spark, sf_dir):
    """Pluggable Similarity: the SAME index tables scored by
    ClassicSimilarity (TF-IDF: idf² · √tf / √dl over the unified
    one-byte norm) instead of BM25 — the per-search Similarity swap of
    the reference (search/classic.py; lucene/core/.../similarities/
    ClassicSimilarity.java, TFIDFSimilarity.java:380-430)."""
    from .search.classic import search_classic

    tables = docs_index(spark, sf_dir)
    return (
        search_classic(tables, ["spark", "merge"], k=None)
        .withColumn("score", F.round("score", 4))
        .orderBy(F.desc(F.round("score", 4)), F.asc("doc_id"))
        .limit(20)
    )


@gate(
    "fts_boolean_sim",
    f"""WITH toks AS ({_TOKS}),
m AS (SELECT doc_id, count(DISTINCT term) AS n FROM toks
      WHERE term IN ('spark', 'merge', 'vector') GROUP BY doc_id)
SELECT doc_id, CAST(n * 2.0 AS DOUBLE) AS score FROM m
WHERE n = 3 ORDER BY doc_id""",
)
def fts_boolean_sim(spark, sf_dir):
    """BooleanSimilarity (the third pluggable Similarity): every
    matching clause contributes exactly its boost (2.0 here) — no tf,
    no norms (search/classic.py search_boolean_sim; reference
    lucene/core/.../similarities/BooleanSimilarity.java). Emitting the
    full-match tier keeps the top-k cut deterministic."""
    from .search.classic import search_boolean_sim

    tables = docs_index(spark, sf_dir)
    return (
        search_boolean_sim(
            tables, ["spark", "merge", "vector"], k=None, boost=2.0
        )
        .filter(F.col("score") == 6.0)
        .orderBy("doc_id")
    )


@gate(
    "fn_additive_boost",
    f"""WITH {bm25_scored_cte(["spark", "merge"])},
mn AS (SELECT doc_id, sum(term_score) AS score FROM scored
       WHERE term = 'spark' GROUP BY doc_id),
bq AS (SELECT doc_id, sum(term_score) AS bscore FROM scored
       WHERE term = 'merge' GROUP BY doc_id)
SELECT m.doc_id,
       round(m.score + 0.4 * coalesce(b.bscore, 0.0)
             + 0.05 * ln(1 + d.n_chars), 4) AS score
FROM mn m LEFT JOIN bq b USING (doc_id)
JOIN documents d USING (doc_id)
ORDER BY round(m.score + 0.4 * coalesce(b.bscore, 0.0)
               + 0.05 * ln(1 + d.n_chars), 4) DESC, m.doc_id ASC
LIMIT 20""",
)
def fn_additive_boost(spark, sf_dir):
    """eDisMax additive boosts: bq (boost query 'merge'^0.4 ADDED to
    the main score for matching docs) and bf (boost function
    0.05·ln(1+n_chars) added for every hit) — additive, unlike the
    multiplicative boost= param (reference solr/core/.../search/
    DisMaxQParser.java:200-230 getBoostQueries/getBoostFunctions;
    ExtendedDismaxQParser addShouldClauses)."""
    tables = docs_index(spark, sf_dir)
    main = search_bruteforce(
        tables, ["spark"], "disjunctive", k=None, precision="double"
    )
    bq = search_bruteforce(
        tables, ["merge"], "disjunctive", k=None, precision="double"
    ).select("doc_id", F.col("score").alias("bscore"))
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    fin = (
        main.join(bq, "doc_id", "left")
        .join(docs, "doc_id")
        .select(
            "doc_id",
            (
                F.col("score")
                + 0.4 * F.coalesce(F.col("bscore"), F.lit(0.0))
                + 0.05 * F.log1p(F.col("n_chars").cast("double"))
            ).alias("fscore"),
        )
    )
    return (
        fin.select("doc_id", F.round("fscore", 4).alias("score"))
        .orderBy(F.desc(F.round("fscore", 4)), F.asc("doc_id"))
        .limit(20)
    )


@gate(
    "fts_rerank_query",
    f"""WITH {bm25_scored_cte(["spark", "merge"])},
mn AS (SELECT doc_id, sum(term_score) AS score FROM scored
       WHERE term = 'spark' GROUP BY doc_id),
rr AS (SELECT doc_id, sum(term_score) AS rscore FROM scored
       WHERE term = 'merge' GROUP BY doc_id),
mr AS (SELECT doc_id, score,
              row_number() OVER (ORDER BY round(score, 4) DESC,
                                 doc_id ASC) AS rk
       FROM mn),
fin AS (SELECT m.doc_id,
               m.score + CASE WHEN m.rk <= 50 AND r.rscore IS NOT NULL
                              THEN 0.5 * r.rscore ELSE 0 END AS fscore
        FROM mr m LEFT JOIN rr r USING (doc_id))
SELECT doc_id, round(fscore, 4) AS score FROM fin
ORDER BY round(fscore, 4) DESC, doc_id ASC LIMIT 20""",
)
def fts_rerank_query(spark, sf_dir):
    """ReRankQParserPlugin: the top reRankDocs=50 first-pass hits gain
    reRankWeight=0.5 × the rerank query's score; docs below the window
    keep their original score (reference solr/core/.../search/
    ReRankQParserPlugin.java — 'ReRankQuery ... re-ranks the top N').
    At scale the window comes from the WAND top-N and the rerank join
    broadcasts (the ml_ltr_rerank plan); the rank cut is on the
    rounded score so both engines agree at the boundary. The top-50
    first-pass window is a plain global top-k — orderBy().limit(50)
    (TakeOrderedAndProject) broadcast back as a marker, never a
    partition-less rank window over every scored doc."""
    tables = docs_index(spark, sf_dir)
    main = search_bruteforce(
        tables, ["spark"], "disjunctive", k=None, precision="double"
    )
    rer = search_bruteforce(
        tables, ["merge"], "disjunctive", k=None, precision="double"
    ).select("doc_id", F.col("score").alias("rscore"))
    in_win = (
        main.orderBy(F.desc(F.round("score", 4)), F.asc("doc_id"))
        .limit(50)
        .select("doc_id", F.lit(1).alias("in_win"))
    )
    fin = (
        main.join(F.broadcast(in_win), "doc_id", "left")
        .join(rer, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.col("score")
                + F.when(
                    F.col("in_win").isNotNull()
                    & F.col("rscore").isNotNull(),
                    0.5 * F.col("rscore"),
                ).otherwise(0.0)
            ).alias("fscore"),
        )
    )
    return (
        fin.select("doc_id", F.round("fscore", 4).alias("score"))
        .orderBy(F.desc(F.round("fscore", 4)), F.asc("doc_id"))
        .limit(20)
    )


@gate(
    "fts_span_first",
    f"""WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) + 1)) AS pos
  FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
nt(lo, hi, qdl) AS (VALUES {_NORM_VALUES}),
qd AS (SELECT dl.doc_id, nt.qdl FROM dl JOIN nt
       ON dl.dl BETWEEN nt.lo AND nt.hi),
stats AS (SELECT count(*) AS doc_count, sum(dl) AS sum_ttf FROM dl),
dfq AS (SELECT count(DISTINCT doc_id) AS df FROM tok WHERE term = 'spark'),
sf AS (SELECT doc_id, count(*) AS span_freq FROM tok
       WHERE term = 'spark' AND pos <= 3 GROUP BY doc_id)
SELECT s.doc_id, CAST(s.span_freq AS BIGINT) AS span_freq,
  round(ln(1 + (st.doc_count - d.df + 0.5) / (d.df + 0.5))
        * (s.span_freq / (s.span_freq
           + 1.2 * (1.0 - 0.75
                    + 0.75 * qd.qdl / (st.sum_ttf / st.doc_count)))), 4)
    AS score
FROM sf s JOIN qd ON qd.doc_id = s.doc_id
CROSS JOIN stats st CROSS JOIN dfq d
ORDER BY s.doc_id""",
)
def fts_span_first(spark, sf_dir):
    """SpanFirstQuery(spark, end=3): the term within a doc's first 3
    positions, answered from the POSITIONAL INDEX per seg_group leaf —
    cost scales with the term's posting list (search/phrase.py
    span_first; reference lucene/core/.../search/spans/
    SpanFirstQuery.java). BM25-scored with freq = qualifying
    occurrences."""
    from .gate import docs_pos_index
    from .search.phrase import span_first

    index = docs_pos_index(spark, sf_dir)
    return (
        span_first(index, "spark", 3, k=None, precision="double")
        .select("doc_id", "span_freq", F.round("score", 4).alias("score"))
        .orderBy("doc_id")
    )


@gate(
    "fts_span_not",
    f"""WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) + 1)) AS pos
  FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
nt(lo, hi, qdl) AS (VALUES {_NORM_VALUES}),
qd AS (SELECT dl.doc_id, nt.qdl FROM dl JOIN nt
       ON dl.dl BETWEEN nt.lo AND nt.hi),
stats AS (SELECT count(*) AS doc_count, sum(dl) AS sum_ttf FROM dl),
dfq AS (SELECT count(DISTINCT doc_id) AS df FROM tok WHERE term = 'spark'),
sf AS (SELECT a.doc_id, count(*) AS span_freq FROM tok a
       WHERE a.term = 'spark' AND NOT EXISTS (
         SELECT 1 FROM tok x
         WHERE x.doc_id = a.doc_id AND x.term = 'merge'
           AND x.pos BETWEEN a.pos - 1 AND a.pos + 1)
       GROUP BY a.doc_id)
SELECT s.doc_id, CAST(s.span_freq AS BIGINT) AS span_freq,
  round(ln(1 + (st.doc_count - d.df + 0.5) / (d.df + 0.5))
        * (s.span_freq / (s.span_freq
           + 1.2 * (1.0 - 0.75
                    + 0.75 * qd.qdl / (st.sum_ttf / st.doc_count)))), 4)
    AS score
FROM sf s JOIN qd ON qd.doc_id = s.doc_id
CROSS JOIN stats st CROSS JOIN dfq d
ORDER BY s.doc_id""",
)
def fts_span_not(spark, sf_dir):
    """SpanNotQuery(spark, merge, pre=1, post=1): 'spark' occurrences
    with no 'merge' within one position either side — per seg_group
    leaf over BOTH terms' positional blocks, exclusion via one
    vectorized searchsorted (search/phrase.py span_not; reference
    lucene/core/.../search/spans/SpanNotQuery.java)."""
    from .gate import docs_pos_index
    from .search.phrase import span_not

    index = docs_pos_index(spark, sf_dir)
    return (
        span_not(index, "spark", "merge", pre=1, post=1, k=None,
                 precision="double")
        .select("doc_id", "span_freq", F.round("score", 4).alias("score"))
        .orderBy("doc_id")
    )


# Shared positional-token prologue + span BM25 scoring epilogue for the
# span/interval oracles (pinned span contract: freq = qualifying spans,
# idf = Σ idf over the span tree's terms — SpanWeight.buildSimWeight).
_SPAN_CTE = f"""tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) + 1)) AS pos
  FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
nt(lo, hi, qdl) AS (VALUES {_NORM_VALUES}),
qd AS (SELECT dl.doc_id, nt.qdl FROM dl JOIN nt
       ON dl.dl BETWEEN nt.lo AND nt.hi),
stats AS (SELECT count(*) AS doc_count, sum(dl) AS sum_ttf FROM dl)"""


def _span_score_sql(idf_terms, sf_cte):
    terms = ", ".join(f"'{t}'" for t in idf_terms)
    return f"""WITH {_SPAN_CTE},
{sf_cte},
widf AS (SELECT sum(ln(1 + (st.doc_count - d.df + 0.5) / (d.df + 0.5))) AS w
         FROM (SELECT term, count(DISTINCT doc_id) AS df FROM tok
               WHERE term IN ({terms}) GROUP BY term) d
         CROSS JOIN stats st)
SELECT s.doc_id, CAST(s.span_freq AS BIGINT) AS span_freq,
  round(w.w * (s.span_freq / (s.span_freq
        + 1.2 * (1.0 - 0.75
                 + 0.75 * qd.qdl / (st.sum_ttf / st.doc_count)))), 4)
    AS score
FROM sf s JOIN qd ON qd.doc_id = s.doc_id
CROSS JOIN stats st CROSS JOIN widf w
ORDER BY s.doc_id"""


@gate(
    "fts_span_or",
    _span_score_sql(
        ["spark", "vector"],
        """sf AS (SELECT doc_id, count(*) AS span_freq FROM tok
       WHERE term IN ('spark', 'vector') GROUP BY doc_id)""",
    ),
)
def fts_span_or(spark, sf_dir):
    """SpanOrQuery(spark, vector): union of the clause terms' spans,
    span_freq = total occurrences of either term per doc (reference
    lucene/core/.../search/spans/SpanOrQuery.java). Plan: both terms'
    positional blocks, bucket-pruned, per seg_group leaf
    (search/phrase.py span_or)."""
    from .gate import docs_pos_index
    from .search.phrase import span_or

    index = docs_pos_index(spark, sf_dir)
    return (
        span_or(index, ["spark", "vector"], k=None, precision="double")
        .select("doc_id", "span_freq", F.round("score", 4).alias("score"))
        .orderBy("doc_id")
    )


# NearSpansOrdered shortest-match: each 'spark' occurrence pairs with
# the NEAREST following 'merge' only; the pair survives iff that
# shortest window fits in slop+1=7 (NearSpansOrdered.java
# shrinkToAfterShortestMatch — mirrors search/phrase.py _ordered_pairs).
_PAIRS_CTE = """pairs AS (
  SELECT a.doc_id, a.pos AS pa, min(b.pos) AS pb
  FROM tok a JOIN tok b
    ON b.doc_id = a.doc_id AND b.pos > a.pos AND b.term = 'merge'
  WHERE a.term = 'spark'
  GROUP BY a.doc_id, a.pos
  HAVING min(b.pos) - a.pos <= 7)"""


@gate(
    "fts_span_within",
    _span_score_sql(
        ["query", "spark", "merge"],
        f"""{_PAIRS_CTE},
sf AS (SELECT t.doc_id, count(DISTINCT t.pos) AS span_freq
       FROM tok t JOIN pairs p
         ON p.doc_id = t.doc_id AND t.pos BETWEEN p.pa AND p.pb
       WHERE t.term = 'query' GROUP BY t.doc_id)""",
    ),
)
def fts_span_within(spark, sf_dir):
    """SpanWithinQuery(little=query, big=SpanNear([spark, merge],
    slop=6, inOrder)): 'query' occurrences inside an ordered
    spark..merge window (reference lucene/core/.../search/spans/
    SpanWithinQuery.java). Freq = qualifying little occurrences
    (search/phrase.py span_within)."""
    from .gate import docs_pos_index
    from .search.phrase import span_within

    index = docs_pos_index(spark, sf_dir)
    return (
        span_within(index, "query", ("spark", "merge"), slop=6, k=None,
                    precision="double")
        .select("doc_id", "span_freq", F.round("score", 4).alias("score"))
        .orderBy("doc_id")
    )


@gate(
    "fts_span_containing",
    _span_score_sql(
        ["spark", "merge", "query"],
        f"""{_PAIRS_CTE},
sf AS (SELECT p.doc_id, count(*) AS span_freq FROM pairs p
       WHERE EXISTS (SELECT 1 FROM tok t
                     WHERE t.doc_id = p.doc_id AND t.term = 'query'
                       AND t.pos BETWEEN p.pa AND p.pb)
       GROUP BY p.doc_id)""",
    ),
)
def fts_span_containing(spark, sf_dir):
    """SpanContainingQuery(big=SpanNear([spark, merge], slop=6,
    inOrder), little=query): ordered spark..merge windows holding a
    'query' occurrence, freq = qualifying windows (reference
    lucene/core/.../search/spans/SpanContainingQuery.java;
    search/phrase.py span_containing)."""
    from .gate import docs_pos_index
    from .search.phrase import span_containing

    index = docs_pos_index(spark, sf_dir)
    return (
        span_containing(index, ("spark", "merge"), "query", slop=6, k=None,
                        precision="double")
        .select("doc_id", "span_freq", F.round("score", 4).alias("score"))
        .orderBy("doc_id")
    )


@gate(
    "fts_interval_ordered",
    _span_score_sql(
        ["join", "hash"],
        """bp AS (SELECT doc_id, pos AS pb FROM tok WHERE term = 'hash'),
pr AS (SELECT b.doc_id, b.pb,
              (SELECT max(a.pos) FROM tok a
               WHERE a.doc_id = b.doc_id AND a.term = 'join'
                 AND a.pos < b.pb) AS pa
       FROM bp b),
minimal AS (SELECT doc_id, pa, pb FROM pr
            WHERE pa IS NOT NULL AND pb - pa + 1 <= 8
              AND NOT EXISTS (SELECT 1 FROM tok c
                              WHERE c.doc_id = pr.doc_id
                                AND c.term = 'hash'
                                AND c.pos > pr.pa AND c.pos < pr.pb)),
sf AS (SELECT doc_id, count(*) AS span_freq FROM minimal
       GROUP BY doc_id)""",
    ),
)
def fts_interval_ordered(spark, sf_dir):
    """Minimal-interval ordered query, Intervals.maxwidth(8,
    Intervals.ordered(join, hash)) — the lucene/queries intervals
    module (Intervals.java, OrderedIntervalsSource.java). Freq =
    minimal intervals per doc (last 'join' before each 'hash', no other
    'hash' inside, width <= 8); search/phrase.py interval_ordered."""
    from .gate import docs_pos_index
    from .search.phrase import interval_ordered

    index = docs_pos_index(spark, sf_dir)
    return (
        interval_ordered(index, "join", "hash", max_width=8, k=None,
                         precision="double")
        .select("doc_id", "span_freq", F.round("score", 4).alias("score"))
        .orderBy("doc_id")
    )


_CLU_CTE = f"""{bm25_scored_cte(["spark", "merge"])},
sc AS (SELECT doc_id, round(sum(term_score), 4) AS score
       FROM scored GROUP BY doc_id),
cand AS (SELECT doc_id FROM sc ORDER BY score DESC, doc_id ASC LIMIT 20),
dtf AS (SELECT t.doc_id, t.term, CAST(count(*) AS BIGINT) AS freq
        FROM toks t JOIN cand USING (doc_id) GROUP BY t.doc_id, t.term),
n2 AS (SELECT doc_id, sum(freq * freq) AS n2 FROM dtf GROUP BY doc_id),
sv AS (SELECT doc_id AS seed, term, freq AS sfreq FROM dtf
       WHERE doc_id IN (11, 4)),
sn2 AS (SELECT seed, sum(sfreq * sfreq) AS sn2 FROM sv GROUP BY seed),
dots AS (SELECT d.doc_id, s.seed, sum(d.freq * s.sfreq) AS dot
         FROM dtf d JOIN sv s USING (term) GROUP BY d.doc_id, s.seed),
simt AS (SELECT dots.doc_id, dots.seed,
                round(dots.dot
                      / sqrt(CAST(n2.n2 * sn2.sn2 AS DOUBLE)), 6) AS sim
         FROM dots JOIN n2 USING (doc_id) JOIN sn2 USING (seed)),
best AS (SELECT doc_id, seed, sim,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY sim DESC, seed ASC) AS rk
         FROM simt)"""


def _clu_candidates(spark, sf_dir):
    from .gate import _bm25_spark

    return _bm25_spark(spark, sf_dir, ["spark", "merge"], "disjunctive", 20)


@gate(
    "fts_result_clusters",
    f"""WITH {_CLU_CTE}
SELECT doc_id, CAST(seed AS BIGINT) AS seed, sim
FROM best WHERE rk = 1 ORDER BY doc_id""",
)
def fts_result_clusters(spark, sf_dir):
    """Search-result clustering (solr/contrib/clustering Carrot2
    analog): the top-20 results assigned to the nearest of two seed
    docs by term-vector cosine — integer tf dot products and norms, so
    every aggregation is exact (operators/clustering.py). Only the
    result window is clustered, never the corpus."""
    from .gate import docs_index
    from .operators.clustering import seeded_cluster_assign

    tables = docs_index(spark, sf_dir)
    return seeded_cluster_assign(
        tables, _clu_candidates(spark, sf_dir), [11, 4]
    ).orderBy("doc_id")


@gate(
    "fts_cluster_labels",
    f"""WITH {_CLU_CTE},
lab AS (SELECT b.seed, d.term, sum(d.freq) AS weight
        FROM best b JOIN dtf d USING (doc_id)
        WHERE b.rk = 1 GROUP BY b.seed, d.term),
rl AS (SELECT seed, term, CAST(weight AS BIGINT) AS weight,
              row_number() OVER (PARTITION BY seed
                                 ORDER BY weight DESC, term ASC) AS pos
       FROM lab)
SELECT CAST(seed AS BIGINT) AS seed, term, weight,
       CAST(pos AS BIGINT) AS pos
FROM rl WHERE pos <= 3 ORDER BY seed, pos""",
)
def fts_cluster_labels(spark, sf_dir):
    """Cluster labels: top-3 terms per result cluster by summed tf
    (operators/clustering.py cluster_labels — the Carrot2 label
    step)."""
    from .gate import docs_index
    from .operators.clustering import (
        cluster_labels, seeded_cluster_assign,
    )

    tables = docs_index(spark, sf_dir)
    assign = seeded_cluster_assign(
        tables, _clu_candidates(spark, sf_dir), [11, 4]
    )
    return cluster_labels(tables, assign, top_terms=3).orderBy(
        "seed", "pos"
    )


@gate(
    "fts_query_elevation",
    f"""WITH main AS ({bm25_sql(["spark", "merge"], "disjunctive", 50)}),
kept AS (SELECT doc_id, score FROM main WHERE doc_id <> 0),
ranked AS (
  SELECT doc_id, score,
    CASE WHEN doc_id = 11 THEN 1 WHEN doc_id = 4 THEN 2 ELSE 0 END
      AS elev_pos,
    row_number() OVER (ORDER BY
      CASE WHEN doc_id = 11 THEN 1 WHEN doc_id = 4 THEN 2 ELSE 3 END ASC,
      score DESC, doc_id ASC) AS rank
  FROM kept)
SELECT doc_id, score, CAST(elev_pos AS BIGINT) AS elev_pos,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10 ORDER BY rank""",
)
def fts_query_elevation(spark, sf_dir):
    """QueryElevationComponent: editorial pins [11, 4] jump to the top
    in elevation order, doc 0 is excluded, organic ranking continues
    below (search/elevation.py; reference solr/core/.../component/
    QueryElevationComponent.java). The pin rank is a constant CASE
    Column over the organic top-k — no join, no added shuffle."""
    from .gate import _bm25_spark
    from .search.elevation import elevate

    organic = _bm25_spark(
        spark, sf_dir, ["spark", "merge"], "disjunctive", 50
    )
    return elevate(organic, [11, 4], excluded=[0], k=10)


@gate(
    "fts_constant_score",
    f"""WITH toks AS ({_TOKS})
SELECT DISTINCT doc_id, 1.5 AS score FROM toks WHERE term = 'spark'
ORDER BY doc_id ASC""",
)
def fts_constant_score(spark, sf_dir):
    """ConstantScoreQuery: matching docs all score the wrapped constant
    (reference: search/ConstantScoreQuery.java)."""
    from .gate import docs_index

    tables = docs_index(spark, sf_dir)
    return (
        tables.postings.filter(F.col("term") == "spark")
        .select("doc_id", F.lit(1.5).alias("score"))
        .distinct()
        .orderBy("doc_id")
    )


@gate(
    "rel_fetch_enrich",
    """SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_nationkey
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey <= 512
ORDER BY o.o_orderkey""",
)
def rel_fetch_enrich(spark, sf_dir):
    """FetchStream: enrich a tuple stream by key lookup — a broadcast
    hash join against the (small) lookup table, no shuffle of the big
    side (reference: solr/solrj/.../io/stream/FetchStream.java)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 512)
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_custkey", "c_name", "c_nationkey")
        .orderBy("o_orderkey")
    )


@gate(
    "rel_point_in_set",
    """SELECT l_linenumber, count(*) AS n_items,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 3) AS sum_price
FROM lineitem WHERE l_linenumber IN (1, 3, 7)
GROUP BY l_linenumber ORDER BY l_linenumber""",
)
def rel_point_in_set(spark, sf_dir):
    """PointInSetQuery: value ∈ {set} over a numeric column, with the
    IN-set pushed to the parquet scan (reference:
    search/PointInSetQuery.java → BKD; here Catalyst In + parquet row-
    group stats pruning)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_linenumber").isin(1, 3, 7))
        .groupBy("l_linenumber")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
                .cast("double"), 3,
            ).alias("sum_price"),
        )
        .orderBy("l_linenumber")
    )


@gate(
    "rel_export_sorted",
    """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY acctbal DESC, c_custkey ASC""",
)
def rel_export_sorted(spark, sf_dir):
    """ExportStream (/export): full sorted result-set streaming, no row
    window — plain distributed sort + write, no collector heap needed
    (reference: solr/core/.../search/ExportQParserPlugin.java)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select(
            "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
        )
        .orderBy(F.desc("acctbal"), F.asc("c_custkey"))
    )


@gate(
    "fn_value_sources",
    """SELECT o_orderkey,
  round(2.0 * o_totalprice + 10.0, 4) AS lin,
  round(1000.0 / (1.0 * o_totalprice + 1.0), 6) AS rc,
  round(CASE WHEN o_totalprice BETWEEN 0 AND 50000 THEN 0.0
             ELSE o_totalprice END, 4) AS mapped,
  round(CASE WHEN greatest(length(o_orderpriority), 8) = 0 THEN 1.0
             ELSE 1.0 - levenshtein(o_orderpriority, '1-URGENT')
                  / CAST(greatest(length(o_orderpriority), 8) AS DOUBLE)
        END, 6) AS pri_sim,
  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
FROM orders WHERE o_orderkey <= 256
ORDER BY o_orderkey""",
)
def fn_value_sources(spark, sf_dir):
    """Solr function queries (ValueSourceParser.java:131-932): linear,
    recip, map, strdist, if — composable JVM-native Column expressions
    (functions/valuesource.py), zero UDFs."""
    from .functions.valuesource import (
        if_value, linear, map_value, recip, strdist,
    )

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 256)
    return o.select(
        "o_orderkey",
        F.round(linear(F.col("o_totalprice"), 2.0, 10.0), 4).alias("lin"),
        F.round(recip(F.col("o_totalprice"), 1.0, 1000.0, 1.0), 6).alias("rc"),
        F.round(
            map_value(F.col("o_totalprice"), 0, 50000, 0.0), 4
        ).alias("mapped"),
        F.round(
            strdist(F.col("o_orderpriority"), F.lit("1-URGENT")), 6
        ).alias("pri_sim"),
        if_value(
            F.col("o_orderpriority") == "1-URGENT", F.lit(1), F.lit(0)
        ).alias("is_urgent"),
    ).orderBy("o_orderkey")


@gate(
    "fts_analysis_chain",
    """WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS raw,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) + 1)) AS pos
  FROM documents),
syn AS (SELECT doc_id, pos,
               CASE raw WHEN 'fast' THEN 'quick' WHEN 'big' THEN 'large'
                        ELSE raw END AS term
        FROM tok),
kept AS (SELECT doc_id, term,
                row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
         FROM syn
         WHERE term NOT IN ('the', 'a') AND length(term) BETWEEN 2 AND 30),
sh AS (SELECT a.doc_id, a.term || ' ' || b.term AS shingle
       FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1)
SELECT shingle, count(*) AS cnt FROM sh
GROUP BY shingle ORDER BY cnt DESC, shingle ASC LIMIT 20""",
)
def fts_analysis_chain(spark, sf_dir):
    """Analyzer chain: tokenize → SynonymFilter (fast→quick, big→large)
    → StopFilter → LengthFilter(2..30) → ShingleFilter (word bigrams),
    top shingles by frequency. All JVM-native array transforms
    (analysis/filters.py). Reference: analysis/synonym/SynonymFilter
    .java, analysis/core/StopFilter.java, analysis/miscellaneous/
    LengthFilter.java, analysis/shingle/ShingleFilter.java."""
    from .analysis.filters import (
        length_filter, shingle_filter, stop_filter, synonym_filter,
    )
    from .index.builder import simple_tokens

    docs = load(spark, sf_dir, "documents")
    chain = shingle_filter(
        length_filter(
            stop_filter(
                synonym_filter(
                    simple_tokens("text"), {"fast": "quick", "big": "large"}
                ),
                ["the", "a"],
            ),
            2,
            30,
        ),
        2,
    )
    toks = docs.select("doc_id", chain.alias("shingles"))
    return (
        toks.select(F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("shingle"))
        .limit(20)
    )


@gate(
    "fts_payload_score",
    """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         unnest(range(0, len(string_split(text, ' ')))) AS pos
  FROM documents),
pl AS (SELECT doc_id, term, (doc_id + pos) % 5 AS payload FROM tok)
SELECT doc_id, count(*) AS n_occ,
       CAST(sum(payload) AS DOUBLE) AS pay_sum,
       CAST(max(payload) AS DOUBLE) AS pay_max,
       round(avg(payload), 6) AS pay_avg
FROM pl WHERE term = 'spark' GROUP BY doc_id ORDER BY doc_id""",
)
def fts_payload_score(spark, sf_dir):
    """Payload pipeline end-to-end: tokens are serialized with
    deterministic delimited payloads ("spark|3"), re-parsed by the
    DelimitedPayloadTokenFilter analog into a payload posting relation,
    and PayloadScoreQuery aggregates Sum/Max/Average payload per doc
    for 'spark' (analysis/payloads.py; reference lucene/analysis/
    common/.../payloads/DelimitedPayloadTokenFilter.java,
    lucene/queries/.../payloads/PayloadScoreQuery.java)."""
    from .analysis.payloads import delimited_payload_postings

    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    payloaded = F.concat_ws(
        " ",
        F.transform(
            toks,
            lambda t, i: F.concat(
                t, F.lit("|"), ((F.col("doc_id") + i) % 5).cast("string")
            ),
        ),
    )
    postings = delimited_payload_postings(
        docs.select("doc_id", payloaded.alias("text"))
    )
    return (
        postings.filter(F.col("term") == "spark")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_occ"),
            F.sum(F.col("payload").cast("double")).alias("pay_sum"),
            F.max(F.col("payload").cast("double")).alias("pay_max"),
            F.round(F.avg(F.col("payload").cast("double")), 6).alias(
                "pay_avg"
            ),
        )
        .orderBy("doc_id")
    )


@gate(
    "fts_word_delimiter",
    """WITH inp AS (
  SELECT concat('PowerShot', CAST(doc_id % 30 AS VARCHAR), '-Src',
                substr(source, 4), 'MkII') AS s
  FROM documents),
rw AS (SELECT regexp_replace(regexp_replace(regexp_replace(regexp_replace(s,
         '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),
         '([a-z0-9])([A-Z])', '\\1 \\2', 'g'),
         '([A-Za-z])([0-9])', '\\1 \\2', 'g'),
         '([0-9])([A-Za-z])', '\\1 \\2', 'g') AS s FROM inp),
parts AS (SELECT unnest(string_split_regex(s, '[^A-Za-z0-9]+')) AS part
          FROM rw)
SELECT part, count(*) AS cnt FROM parts WHERE part <> ''
GROUP BY part ORDER BY part ASC""",
)
def fts_word_delimiter(spark, sf_dir):
    """WordDelimiterGraphFilter over synthesized product-code strings
    (PowerShot<N>-Src<k>MkII): case/digit/delimiter sub-word splits,
    counted per part (analysis/filters.py word_delimiter_filter;
    reference lucene/analysis/common/.../miscellaneous/
    WordDelimiterGraphFilter.java)."""
    from .analysis.filters import word_delimiter_filter

    docs = load(spark, sf_dir, "documents")
    inp = F.concat(
        F.lit("PowerShot"),
        (F.col("doc_id") % 30).cast("string"),
        F.lit("-Src"),
        F.substring("source", 4, 10),
        F.lit("MkII"),
    )
    parts = docs.select(
        F.explode(word_delimiter_filter(F.array(inp))).alias("part")
    )
    return (
        parts.groupBy("part")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.asc("part"))
    )


@gate(
    "fts_pattern_trim",
    """WITH inp AS (
  SELECT concat('  ', upper(source), '-', lang, ' ') AS s FROM documents),
norm AS (SELECT regexp_replace(trim(s), '[0-9]+', '#', 'g') AS tok
         FROM inp)
SELECT tok, count(*) AS cnt FROM norm GROUP BY tok ORDER BY tok ASC""",
)
def fts_pattern_trim(spark, sf_dir):
    """TrimFilter + PatternReplaceFilter chain: padded '  SRC12-en '
    tokens are trimmed then digit-runs collapsed to '#'
    (analysis/filters.py trim_filter / pattern_replace_filter;
    reference lucene/analysis/common/.../miscellaneous/TrimFilter.java,
    .../pattern/PatternReplaceFilter.java)."""
    from .analysis.filters import pattern_replace_filter, trim_filter

    docs = load(spark, sf_dir, "documents")
    inp = F.concat(
        F.lit("  "), F.upper("source"), F.lit("-"), F.col("lang"),
        F.lit(" "),
    )
    toks = pattern_replace_filter(
        trim_filter(F.array(inp)), "[0-9]+", "#"
    )
    return (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.asc("tok"))
    )


@gate(
    "fts_parsed_phrase",
    f"""WITH toks AS ({_TOKS}),
tokp AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) + 1)) AS pos
  FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
nt(lo, hi, qdl) AS (VALUES {{NORM_VALUES}}),
qd AS (SELECT dl.doc_id, nt.qdl FROM dl JOIN nt ON dl.dl BETWEEN nt.lo AND nt.hi),
stats AS (SELECT count(*) AS doc_count, sum(dl) AS sum_ttf FROM dl),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
        WHERE term IN ('slow', 'query', 'fast') GROUP BY term),
phidf AS (SELECT sum(ln(1 + (s.doc_count - d.df + 0.5) / (d.df + 0.5))) AS widf
          FROM dfs d CROSS JOIN stats s WHERE d.term IN ('slow', 'query')),
ph AS (SELECT a.doc_id, count(DISTINCT b.pos) AS pf
       FROM tokp a JOIN tokp b
         ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 3
       WHERE a.term = 'slow' AND b.term = 'query' GROUP BY a.doc_id),
phs AS (SELECT ph.doc_id,
               p.widf * (ph.pf / (ph.pf
                 + 1.2 * (1.0 - 0.75 + 0.75 * qd.qdl / (s.sum_ttf / s.doc_count))))
                 AS ph_score
        FROM ph JOIN qd USING (doc_id) CROSS JOIN stats s CROSS JOIN phidf p),
tff AS (SELECT doc_id, count(*) AS freq FROM toks WHERE term = 'fast'
        GROUP BY doc_id),
fs AS (SELECT tff.doc_id,
              ln(1 + (s.doc_count - d.df + 0.5) / (d.df + 0.5))
                * (tff.freq / (tff.freq
                   + 1.2 * (1.0 - 0.75 + 0.75 * qd.qdl / (s.sum_ttf / s.doc_count))))
                AS fscore
       FROM tff JOIN qd USING (doc_id) CROSS JOIN stats s
       JOIN dfs d ON d.term = 'fast')
SELECT phs.doc_id, round(phs.ph_score + coalesce(fs.fscore, 0), 4) AS score
FROM phs LEFT JOIN fs USING (doc_id)
WHERE phs.doc_id NOT IN (SELECT DISTINCT doc_id FROM toks WHERE term = 'vector')
ORDER BY score DESC, doc_id ASC LIMIT 10""".replace("{NORM_VALUES}", _NORM_VALUES),
)
def fts_parsed_phrase(spark, sf_dir):
    """Query-lifecycle gate: parse '\"slow query\"~2 fast -vector' and
    execute — sloppy phrase REQUIRED via the positional index, 'fast' an
    OPTIONAL score contribution (ReqOptSumScorer), 'vector' excluded
    (ReqExclScorer). Reference: queryparser/classic, search/
    Boolean2ScorerSupplier.java:106-174, ReqOptSumScorer.java."""
    from .gate import docs_index, docs_pos_index
    from .search.executor import execute_parsed

    res = execute_parsed(
        '"slow query"~2 fast -vector',
        docs_index(spark, sf_dir),
        docs_pos_index(spark, sf_dir),
        k=10,
        precision="double",
    )
    return res.select("doc_id", F.round("score", 4).alias("score")).orderBy(
        F.desc("score"), F.asc("doc_id")
    )


# ------------------------------------------------- graph traversal streams

_GRAPH_EDGES_SQL = (
    "SELECT CAST(n_nationkey AS BIGINT) AS src, "
    "CAST((3 * n_nationkey + 1) % 25 AS BIGINT) AS dst FROM nation "
    "UNION ALL SELECT CAST(n_nationkey AS BIGINT), "
    "CAST((7 * n_nationkey + 2) % 25 AS BIGINT) FROM nation"
)


def _graph_edges(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    e1 = n.select(
        F.col("n_nationkey").cast("long").alias("src"),
        ((3 * F.col("n_nationkey") + 1) % 25).cast("long").alias("dst"),
    )
    e2 = n.select(
        F.col("n_nationkey").cast("long").alias("src"),
        ((7 * F.col("n_nationkey") + 2) % 25).cast("long").alias("dst"),
    )
    return e1.unionByName(e2)


@gate(
    "rel_graph_gather",
    f"""WITH RECURSIVE edges AS ({_GRAPH_EDGES_SQL}),
bfs(node, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION ALL
  SELECT e.dst, b.depth + 1 FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.depth < 2)
SELECT node, CAST(min(depth) AS INTEGER) AS depth
FROM bfs GROUP BY node ORDER BY node""",
)
def rel_graph_gather(spark, sf_dir):
    """GatherNodesStream analog: unique nodes within 2 hops of node 0
    over the deterministic nation-derived edge relation, with minimum
    depth (operators/graph.py — BFS as bounded iterative joins;
    reference solr/solrj/.../io/graph/GatherNodesStream.java)."""
    from .operators.graph import gather_nodes

    return gather_nodes(_graph_edges(spark, sf_dir), [0], hops=2).orderBy(
        "node"
    )


@gate(
    "rel_graph_path",
    f"""WITH RECURSIVE edges AS ({_GRAPH_EDGES_SQL}),
bfs(node, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION ALL
  SELECT e.dst, b.depth + 1 FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.depth < 6)
SELECT CAST(0 AS BIGINT) AS src, node AS dst,
       CAST(min(depth) AS INTEGER) AS depth
FROM bfs WHERE node = 13 GROUP BY node""",
)
def rel_graph_path(spark, sf_dir):
    """ShortestPathStream analog: hop distance 0 → 13 over the same
    edge relation (reference solr/solrj/.../io/graph/
    ShortestPathStream.java — 'a distributed breadth first search')."""
    from .operators.graph import shortest_path_length

    return shortest_path_length(_graph_edges(spark, sf_dir), 0, 13, 6)


@gate(
    "rel_graph_score",
    f"""WITH edges AS ({_GRAPH_EDGES_SQL}),
arr AS (SELECT dst AS node, count(*) AS cnt FROM edges
        WHERE src IN (0, 1, 2) GROUP BY dst),
ind AS (SELECT dst AS node, count(*) AS in_degree FROM edges GROUP BY dst),
tot AS (SELECT count(*) AS n_edges FROM edges)
SELECT a.node, CAST(a.cnt AS BIGINT) AS cnt,
       CAST(i.in_degree AS BIGINT) AS in_degree,
       round(a.cnt * ln(CAST(t.n_edges AS DOUBLE) / i.in_degree), 6)
         AS score
FROM arr a JOIN ind i USING (node) CROSS JOIN tot t
ORDER BY node""",
)
def rel_graph_score(spark, sf_dir):
    """ScoreNodesStream: tf-idf node relevance for one gather round
    from roots {0,1,2} — cnt * ln(n_edges / in_degree)
    (operators/graph.py score_nodes; reference solr/solrj/.../io/
    stream/ScoreNodesStream.java)."""
    from .operators.graph import score_nodes

    return (
        score_nodes(_graph_edges(spark, sf_dir), [0, 1, 2])
        .withColumn("score", F.round("score", 6))
        .orderBy("node")
    )


@gate(
    "fts_span_near",
    """WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) + 1)) AS pos
  FROM documents)
SELECT b.doc_id AS doc_id, count(DISTINCT b.pos) AS phrase_freq
FROM tok a JOIN tok b
  ON a.doc_id = b.doc_id AND abs(b.pos - a.pos) BETWEEN 1 AND 3
WHERE a.term = 'slow' AND b.term = 'query'
GROUP BY b.doc_id
ORDER BY doc_id ASC""",
)
def fts_span_near(spark, sf_dir):
    """SpanNearQuery inOrder=false: 'slow' and 'query' within an
    unordered window of slop=2 (|pa-pb| <= 3), answered from the
    positional index; freq = distinct qualifying 'query' positions
    (reference lucene/core/.../search/spans/SpanNearQuery.java:44-66,
    NearSpansUnordered.java)."""
    from .gate import docs_pos_index
    from .search.phrase import search_phrase

    index = docs_pos_index(spark, sf_dir)
    return (
        search_phrase(index, ["slow", "query"], slop=2, ordered=False)
        .select("doc_id", "phrase_freq")
        .orderBy("doc_id")
    )


@gate(
    "fts_term_range",
    f"""WITH toks AS ({_TOKS})
SELECT term, count(DISTINCT doc_id) AS df FROM toks
WHERE term >= 'sc' AND term < 'sp'
GROUP BY term ORDER BY term ASC""",
)
def fts_term_range(spark, sf_dir):
    """TermRangeQuery: lexicographic term-dictionary range scan
    ['sc', 'sp') (reference search/TermRangeQuery.java — the automaton
    walks the sorted term dict; here a range filter over the tiny
    dictionary table)."""
    tables = docs_index(spark, sf_dir)
    return (
        tables.dictionary.filter(
            (F.col("term") >= "sc") & (F.col("term") < "sp")
        )
        .select("term", "df")
        .orderBy(F.asc("term"))
    )


@gate(
    "fts_parsed_simple",
    f"""WITH {bm25_scored_cte(["spark", "merge", "vector"])},
tokp AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) + 1)) AS pos
  FROM documents),
dfs2 AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         WHERE term IN ('fast', 'query') GROUP BY term),
phidf AS (SELECT sum(ln(1 + (s.doc_count - d.df + 0.5) / (d.df + 0.5))) AS widf
          FROM dfs2 d CROSS JOIN stats s),
ph AS (SELECT a.doc_id, count(DISTINCT b.pos) AS pf
       FROM tokp a JOIN tokp b
         ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 2
       WHERE a.term = 'fast' AND b.term = 'query' GROUP BY a.doc_id),
phs AS (SELECT ph.doc_id,
               p.widf * (ph.pf / (ph.pf
                 + 1.2 * (1.0 - 0.75 + 0.75 * qd.qdl / (s.sum_ttf / s.doc_count))))
                 AS ph_score
        FROM ph JOIN qd USING (doc_id) CROSS JOIN stats s CROSS JOIN phidf p),
req AS (SELECT doc_id, sum(term_score) AS s,
               count(DISTINCT CASE WHEN term = 'spark' THEN term END) AS n_must,
               max(CASE WHEN term IN ('merge', 'vector') THEN 1 ELSE 0 END) AS g0
        FROM scored GROUP BY doc_id)
SELECT r.doc_id, round(r.s + p.ph_score, 4) AS score
FROM req r JOIN phs p USING (doc_id)
WHERE r.n_must = 1 AND r.g0 = 1
  AND r.doc_id NOT IN (SELECT DISTINCT doc_id FROM toks WHERE term = 'slow')
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def fts_parsed_simple(spark, sf_dir):
    """SimpleQueryParser syntax end-to-end:
    'spark + merge | vector -slow "fast query"~1' — '+' conjunction,
    '|' disjunction group, '-' prohibition, slop'd phrase, all through
    the shared full-grammar executor (search/simpleparser.py; reference
    lucene/queryparser/.../simple/SimpleQueryParser.java — the
    never-throws end-user syntax)."""
    from .gate import docs_index, docs_pos_index
    from .search.simpleparser import execute_simple

    res = execute_simple(
        'spark + merge | vector -slow "fast query"~1',
        docs_index(spark, sf_dir),
        pos_index=docs_pos_index(spark, sf_dir),
        k=None,
        precision="double",
    )
    return (
        res.withColumn("score", F.round("score", 4))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


_RTG_CACHE: dict = {}


def _rtg_store(spark, sf_dir: str) -> str:
    """Docstore + uncommitted tlog fixture: documents (doc_id < 300)
    committed at gen-0; then three UNCOMMITTED op batches — rev-A
    upserts (%13), rev-B upserts (%26, newer, must win), deletes
    (%19)."""
    import tempfile

    if sf_dir not in _RTG_CACHE:
        from .index.realtime import docstore_init, tlog_add

        d = tempfile.mkdtemp(prefix="lss_rtg_")
        docs = load(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 300
        ).select("doc_id", "text")
        docstore_init(docs, d)
        reva = docs.filter(F.col("doc_id") % 13 == 0).select(
            "doc_id",
            F.concat(F.lit("rtg rev A "), F.col("doc_id").cast("string"))
            .alias("text"),
            F.lit("add").alias("op"),
        )
        revb = docs.filter(F.col("doc_id") % 26 == 0).select(
            "doc_id",
            F.concat(F.lit("rtg rev B "), F.col("doc_id").cast("string"))
            .alias("text"),
            F.lit("add").alias("op"),
        )
        dels = docs.filter(F.col("doc_id") % 19 == 0).select(
            "doc_id", F.lit(None).cast("string").alias("text"),
            F.lit("delete").alias("op"),
        )
        tlog_add(reva, d)
        tlog_add(revb, d)
        tlog_add(dels, d)
        _RTG_CACHE[sf_dir] = d
    return _RTG_CACHE[sf_dir]


@gate(
    "mut_realtime_get",
    """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
reva AS (SELECT doc_id, concat('rtg rev A ', CAST(doc_id AS VARCHAR)) AS text
         FROM base WHERE doc_id % 13 = 0),
revb AS (SELECT doc_id, concat('rtg rev B ', CAST(doc_id AS VARCHAR)) AS text
         FROM base WHERE doc_id % 26 = 0),
live AS (
  SELECT b.doc_id,
         coalesce(rb.text, ra.text, b.text) AS text,
         (rb.doc_id IS NOT NULL OR ra.doc_id IS NOT NULL) AS from_tlog
  FROM base b
  LEFT JOIN reva ra USING (doc_id)
  LEFT JOIN revb rb USING (doc_id)
  WHERE b.doc_id % 19 <> 0)
SELECT doc_id, from_tlog, CAST(length(text) AS BIGINT) AS rtg_text_len
FROM live ORDER BY doc_id""",
)
def mut_realtime_get(spark, sf_dir):
    """RealTimeGet: /get spans the UNCOMMITTED update log — newest tlog
    add per id wins over older adds and the committed doc, tlog deletes
    hide ids, everything else falls back to the committed generation;
    search keeps reading committed-only (pytest pins that divergence
    and the commit fold). Reference solr/core/.../handler/component/
    RealTimeGetComponent.java:101, update/UpdateLog.java
    (index/realtime.py)."""
    from .index.realtime import realtime_get

    store = _rtg_store(spark, sf_dir)
    return (
        realtime_get(spark, store)
        .select(
            "doc_id",
            F.col("_from_tlog").alias("from_tlog"),
            F.length("text").cast("long").alias("rtg_text_len"),
        )
        .orderBy("doc_id")
    )


@gate(
    "fts_parsed_surround",
    f"""WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
nt(lo, hi, qdl) AS (VALUES {_NORM_VALUES}),
qd AS (SELECT dl.doc_id, nt.qdl FROM dl JOIN nt ON dl.dl BETWEEN nt.lo AND nt.hi),
stats AS (SELECT count(*) AS doc_count, sum(dl) AS sum_ttf FROM dl),
tf AS (SELECT doc_id, term, count(*) AS freq FROM toks
       WHERE term = 'spark' OR term LIKE 'sor%' GROUP BY doc_id, term),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (s.doc_count - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.freq / (tf.freq
              + 1.2 * (1.0 - 0.75 + 0.75 * qd.qdl / (s.sum_ttf / s.doc_count))))
           AS term_score
  FROM tf JOIN dfs USING (term) JOIN qd ON qd.doc_id = tf.doc_id
  CROSS JOIN stats s),
tokp AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) + 1)) AS pos
  FROM documents),
dfs2 AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         WHERE term IN ('fast', 'query', 'merge') GROUP BY term),
phidf AS (SELECT sum(ln(1 + (s.doc_count - d.df + 0.5) / (d.df + 0.5))) AS widf
          FROM dfs2 d CROSS JOIN stats s),
ph AS (SELECT b.doc_id, count(DISTINCT b.pos) AS pf
       FROM tokp a JOIN tokp b
         ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 3
       WHERE a.term = 'fast' AND b.term IN ('query', 'merge')
       GROUP BY b.doc_id),
phs AS (SELECT ph.doc_id,
               2.0 * p.widf * (ph.pf / (ph.pf
                 + 1.2 * (1.0 - 0.75 + 0.75 * qd.qdl / (s.sum_ttf / s.doc_count))))
                 AS ph_score
        FROM ph JOIN qd USING (doc_id) CROSS JOIN stats s CROSS JOIN phidf p),
spk AS (SELECT doc_id, term_score AS s FROM scored WHERE term = 'spark'),
srt AS (SELECT doc_id, sum(term_score) AS s FROM scored
        WHERE term LIKE 'sor%' GROUP BY doc_id)
SELECT p.doc_id, round(p.ph_score + k.s + r.s, 4) AS score
FROM phs p JOIN spk k USING (doc_id) JOIN srt r USING (doc_id)
WHERE p.doc_id NOT IN (SELECT DISTINCT doc_id FROM toks WHERE term = 'slow')
ORDER BY score DESC, doc_id ASC LIMIT 10""",
)
def fts_parsed_surround(spark, sf_dir):
    """Surround query language end-to-end:
    '(3W(fast, OR(query, merge)))^2 AND spark AND sor* NOT slow' —
    ordered distance with SpanOr slot alternatives (slop = 3-1), '^'
    weight, infix AND summing subscores, scored prefix truncation,
    NOT exclusion (binds tighter than AND, so it guards the sor*
    branch). search/surround.py; reference lucene/queryparser/.../
    surround/parser/QueryParser.jj, surround/query/DistanceQuery.java:97
    (slop = opDistance - 1)."""
    from .gate import docs_index, docs_pos_index
    from .search.surround import execute_surround

    res = execute_surround(
        "(3W(fast, OR(query, merge)))^2 AND spark AND sor* NOT slow",
        docs_index(spark, sf_dir),
        pos_index=docs_pos_index(spark, sf_dir),
        k=None,
        precision="double",
    )
    return (
        res.withColumn("score", F.round("score", 4))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


@gate(
    "fts_parsed_xml",
    f"""WITH toks AS ({_TOKS}),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
nt(lo, hi, qdl) AS (VALUES {_NORM_VALUES}),
qd AS (SELECT dl.doc_id, nt.qdl FROM dl JOIN nt ON dl.dl BETWEEN nt.lo AND nt.hi),
stats AS (SELECT count(*) AS doc_count, sum(dl) AS sum_ttf FROM dl),
tf AS (SELECT doc_id, term, count(*) AS freq FROM toks
       WHERE term IN ('spark', 'vector') GROUP BY doc_id, term),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (s.doc_count - dfs.df + 0.5) / (dfs.df + 0.5))
           * (tf.freq / (tf.freq
              + 1.2 * (1.0 - 0.75 + 0.75 * qd.qdl / (s.sum_ttf / s.doc_count))))
           AS term_score
  FROM tf JOIN dfs USING (term) JOIN qd ON qd.doc_id = tf.doc_id
  CROSS JOIN stats s),
dmx AS (
  SELECT doc_id, max(s) + 0.3 * (sum(s) - max(s)) AS s
  FROM (SELECT doc_id,
               CASE WHEN term = 'vector' THEN 2 * term_score
                    ELSE term_score END AS s
        FROM scored)
  GROUP BY doc_id),
tokp AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         unnest(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) + 1)) AS pos
  FROM documents),
dfs2 AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
         WHERE term IN ('fast', 'query', 'merge') GROUP BY term),
phidf AS (SELECT sum(ln(1 + (s.doc_count - d.df + 0.5) / (d.df + 0.5))) AS widf
          FROM dfs2 d CROSS JOIN stats s),
ph AS (SELECT b.doc_id, count(DISTINCT b.pos) AS pf
       FROM tokp a JOIN tokp b
         ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 3
       WHERE a.term = 'fast' AND b.term IN ('query', 'merge')
       GROUP BY b.doc_id),
phs AS (SELECT ph.doc_id,
               p.widf * (ph.pf / (ph.pf
                 + 1.2 * (1.0 - 0.75 + 0.75 * qd.qdl / (s.sum_ttf / s.doc_count))))
                 AS ph_score
        FROM ph JOIN qd USING (doc_id) CROSS JOIN stats s CROSS JOIN phidf p)
SELECT d.doc_id, round(d.s + coalesce(p.ph_score, 0), 4) AS score
FROM dmx d
JOIN documents doc ON doc.doc_id = d.doc_id AND doc.n_chars >= 60
LEFT JOIN phs p ON p.doc_id = d.doc_id
WHERE d.doc_id NOT IN (SELECT DISTINCT doc_id FROM toks WHERE term = 'slow')
ORDER BY score DESC, d.doc_id ASC LIMIT 10""",
)
def fts_parsed_xml(spark, sf_dir):
    """XML query parser (CoreParser) end-to-end: a BooleanQuery whose
    MUST clause is a DisjunctionMaxQuery (tie=0.3, boosted child),
    SHOULD clause a SpanNear(slop=2, inOrder) with SpanOrTerms slot
    alternatives, FILTER clause a PointRangeQuery on the stored
    n_chars field (restricts, contributes 0 score), MUST_NOT a term —
    all through search/xmlparser.py. Reference lucene/queryparser/.../
    xml/CoreParser.java:77-117 and xml/builders/*."""
    from .gate import docs_index, docs_pos_index
    from .search.xmlparser import execute_xml

    q = """<BooleanQuery>
      <Clause occurs="must">
        <DisjunctionMaxQuery tieBreaker="0.3">
          <TermQuery>spark</TermQuery>
          <TermQuery boost="2">vector</TermQuery>
        </DisjunctionMaxQuery>
      </Clause>
      <Clause occurs="should">
        <SpanNear slop="2" inOrder="true">
          <SpanTerm>fast</SpanTerm>
          <SpanOrTerms>query merge</SpanOrTerms>
        </SpanNear>
      </Clause>
      <Clause occurs="filter">
        <PointRangeQuery fieldName="n_chars" lowerTerm="60"/>
      </Clause>
      <Clause occurs="mustNot"><TermQuery>slow</TermQuery></Clause>
    </BooleanQuery>"""
    res = execute_xml(
        q,
        docs_index(spark, sf_dir),
        pos_index=docs_pos_index(spark, sf_dir),
        stored=load(spark, sf_dir, "documents").select("doc_id", "n_chars"),
        k=None,
        precision="double",
    )
    return (
        res.withColumn("score", F.round("score", 4))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


@gate(
    "rel_graph_gather_capped",
    f"""WITH RECURSIVE edges AS ({_GRAPH_EDGES_SQL}),
keep AS (SELECT dst FROM edges GROUP BY dst HAVING count(*) <= 2),
fe AS (SELECT e.src, e.dst FROM edges e JOIN keep k ON k.dst = e.dst),
bfs(node, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION ALL
  SELECT e.dst, b.depth + 1 FROM bfs b JOIN fe e ON e.src = b.node
  WHERE b.depth < 2)
SELECT node, CAST(min(depth) AS INTEGER) AS depth
FROM bfs GROUP BY node ORDER BY node""",
)
def rel_graph_gather_capped(spark, sf_dir):
    """GraphTermsQuery super-node prune: the same 2-hop gather but
    destination nodes with more than maxDocFreq=2 incoming edges are
    never expanded into (reference solr/core/.../search/
    GraphTermsQParserPlugin.java — GraphTermsQuery drops traversal
    terms above the docFreq cap so celebrity nodes can't fan the
    frontier out). One broadcast frequency semi-join filters the edge
    relation before the walk (operators/graph.py gather_nodes
    max_doc_freq)."""
    from .operators.graph import gather_nodes

    return gather_nodes(
        _graph_edges(spark, sf_dir), [0], hops=2, max_doc_freq=2
    ).orderBy("node")
