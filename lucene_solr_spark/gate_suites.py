"""Curated driver registry: exactly 50 gates, every SURVEY §2 family.

The driver verifies the FIRST 50 registered queries only, so the final
QUERIES/ORACLE_SQL registry is curated to exactly 50 entries. Operators
that share a family are composed into ONE "suite" gate whose output is
a tagged union (kind, k1, k2, v1, v2, v3) — or a doc-keyed join for
per-document metric families — of the member parts, on BOTH engines.
One driver hash row therefore evidences every member operator, and the
local checker (scripts/check_gate.py) sees the identical 50-gate set
the driver sees: no gate exists outside the verified window.

Normalization rules (cross-engine exact):
- key columns  → VARCHAR (BIGINT/bool casts print identically in
  Spark and DuckDB); missing key slots are ''.
- value columns → DOUBLE (members already ROUND their floats; counts
  are exact in double far below 2^53); missing slots are 0.0.
Each member part remains individually runnable via gate.PARTS /
gate.PARTS_SQL (tests and scripts use them directly).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from .gate import ORACLE_SQL, PARTS, PARTS_SQL, QUERIES, load

# ------------------------------------------------------- suite machinery


def _norm_df(df, kind, keys, vals):
    cols = [F.lit(kind).alias("kind")]
    for i in range(2):
        c = F.col(keys[i]).cast("string") if i < len(keys) else F.lit("")
        cols.append(c.alias(f"k{i + 1}"))
    for i in range(4):
        c = F.col(vals[i]).cast("double") if i < len(vals) else F.lit(0.0)
        cols.append(c.alias(f"v{i + 1}"))
    return df.select(*cols)


def _norm_sql(sql, kind, keys, vals):
    ks = [
        (f"CAST({keys[i]} AS VARCHAR) AS k{i + 1}" if i < len(keys)
         else f"'' AS k{i + 1}")
        for i in range(2)
    ]
    vs = [
        (f"CAST({vals[i]} AS DOUBLE) AS v{i + 1}" if i < len(vals)
         else f"CAST(0.0 AS DOUBLE) AS v{i + 1}")
        for i in range(4)
    ]
    return (
        f"SELECT '{kind}' AS kind, " + ", ".join(ks + vs) + f" FROM ({sql})"
    )


def _suite(suite_name: str, members) -> None:
    """Register a tagged-union suite over ``members``:
    [(kind, part_name, keys, vals), ...]."""

    def fn(spark, sf_dir, _members=tuple(members)):
        out = None
        for kind, part, keys, vals in _members:
            d = _norm_df(PARTS[part](spark, sf_dir), kind, keys, vals)
            out = d if out is None else out.unionByName(d)
        return out.orderBy("kind", "k1", "k2", "v1", "v2", "v3", "v4")

    fn.__name__ = suite_name
    fn.__doc__ = "Suite of: " + ", ".join(m[1] for m in members)
    sql = "\nUNION ALL\n".join(
        _norm_sql(PARTS_SQL[part], kind, keys, vals)
        for kind, part, keys, vals in members
    )
    QUERIES[suite_name] = fn
    ORACLE_SQL[suite_name] = (
        f"SELECT * FROM (\n{sql}\n) ORDER BY kind, k1, k2, v1, v2, v3, v4"
    )


def _join_suite(suite_name: str, part_names, key: str) -> None:
    """Register a key-joined suite (per-``key`` metric families whose
    member columns are disjoint): inner-join all members on ``key``."""

    def fn(spark, sf_dir, _parts=tuple(part_names)):
        out = None
        for p in _parts:
            d = PARTS[p](spark, sf_dir)
            out = d if out is None else out.join(d, key)
        return out.orderBy(key)

    fn.__name__ = suite_name
    fn.__doc__ = "Join-suite of: " + ", ".join(part_names)
    subqs = [f"({PARTS_SQL[p]}) q{i}" for i, p in enumerate(part_names)]
    sql = f"SELECT * FROM {subqs[0]}"
    for sq in subqs[1:]:
        sql += f" JOIN {sq} USING ({key})"
    QUERIES[suite_name] = fn
    ORACLE_SQL[suite_name] = sql + f" ORDER BY {key}"


def _passthrough(*names) -> None:
    for name in names:
        QUERIES[name] = PARTS[name]
        if name in PARTS_SQL:
            ORACLE_SQL[name] = PARTS_SQL[name]


# -------------------------------------------- source-loader gates (§2.1)
# Wire-format ingestion parity: the update-handler loaders (JSON/CSV/XML
# — reference solr/core/.../handler/loader/{JsonLoader,CSVLoader,
# XMLLoader}.java) must all yield the identical pinned-schema DataFrame.
# The oracle recomputes the transcript derivation straight from the
# documents table, so a hash match proves write→read round-trip identity
# per row (the north rule's per-turn text-equality invariant).

_N_LOADER_DOCS = 300

_TRANSCRIPT_SQL = f"""
SELECT concat('conv', lpad(CAST(CAST(floor(doc_id / 8) AS BIGINT) AS VARCHAR), 8, '0')) AS conv_id,
       CAST(doc_id % 8 AS INTEGER) AS turn_idx,
       CASE WHEN doc_id % 3 = 0 THEN 'user'
            WHEN doc_id % 3 = 1 THEN 'assistant' ELSE 'tool' END AS role,
       text,
       CASE WHEN doc_id % 3 = 2 THEN 'search' ELSE '' END AS tool_s,
       strftime(TIMESTAMP '2026-01-01 00:00:00' + to_seconds(doc_id),
                '%Y-%m-%d %H:%M:%S') AS ts_s
FROM documents WHERE doc_id < {_N_LOADER_DOCS}"""


def _transcript_frame(spark, sf_dir):
    """The deterministic transcript derivation of the documents table
    (same shape as __spark_entry__.entry's flagship input)."""
    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _N_LOADER_DOCS
    )
    return docs.select(
        F.concat(
            F.lit("conv"),
            F.lpad((F.col("doc_id") / 8).cast("long").cast("string"), 8, "0"),
        ).alias("conv_id"),
        (F.col("doc_id") % 8).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 3 == 0, "user")
        .when(F.col("doc_id") % 3 == 1, "assistant")
        .otherwise("tool")
        .alias("role"),
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 2, "search").alias("tool"),
        (
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("doc_id"))
        ).alias("ts"),
    )


def _loader_output(df):
    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.coalesce(F.col("tool"), F.lit("")).alias("tool_s"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
    ).orderBy("conv_id", "turn_idx")


def src_xml_roundtrip(spark, sf_dir):
    """XMLLoader analog end-to-end: derive transcripts → write Spark 4
    native XML (rowTag=turn) → read back with the pinned schema → the
    oracle recomputes the derivation directly, so a match proves the
    XML wire round-trip is the identity (reference solr/core/.../
    handler/loader/XMLLoader.java)."""
    from .sources.loaders import read_transcripts_xml, write_transcripts_xml

    tr = _transcript_frame(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="lss_gate_xml_")
    write_transcripts_xml(tr, d)
    return _loader_output(read_transcripts_xml(spark, d))


def src_formats_parity(spark, sf_dir):
    """CSV + JSONL loader parity (CSVLoader/JsonLoader analogs): write
    both formats, read both back, inner-join per (conv_id, turn_idx)
    and emit the CSV row plus a per-row equality attestation against
    the JSONL row — the cross-format per-row invariant. The oracle
    recomputes the derivation and asserts TRUE."""
    from .sources.loaders import (
        read_transcripts_csv,
        read_transcripts_json,
        write_transcripts_csv,
        write_transcripts_json,
    )

    tr = _transcript_frame(spark, sf_dir)
    dc = tempfile.mkdtemp(prefix="lss_gate_csv_")
    dj = tempfile.mkdtemp(prefix="lss_gate_jsonl_")
    write_transcripts_csv(tr, dc)
    write_transcripts_json(tr, dj)
    c = read_transcripts_csv(spark, dc)
    j = read_transcripts_json(spark, dj).select(
        "conv_id",
        "turn_idx",
        F.col("role").alias("j_role"),
        F.col("text").alias("j_text"),
        F.col("tool").alias("j_tool"),
        F.col("ts").alias("j_ts"),
    )
    both = c.join(j, ["conv_id", "turn_idx"])
    agree = (
        (F.col("role") == F.col("j_role"))
        & (F.col("text") == F.col("j_text"))
        & (F.col("tool").eqNullSafe(F.col("j_tool")))
        & (F.col("ts") == F.col("j_ts"))
    )
    return both.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.coalesce(F.col("tool"), F.lit("")).alias("tool_s"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        agree.alias("formats_agree"),
    ).orderBy("conv_id", "turn_idx")


_XML_SQL = f"""WITH tr AS ({_TRANSCRIPT_SQL})
SELECT conv_id, turn_idx, role, text, tool_s, ts_s FROM tr
ORDER BY conv_id, turn_idx"""

_PARITY_SQL = f"""WITH tr AS ({_TRANSCRIPT_SQL})
SELECT conv_id, turn_idx, role, text, tool_s, ts_s, TRUE AS formats_agree
FROM tr ORDER BY conv_id, turn_idx"""


# --------------------------------------------------- the curated 50 gates
# Registration order == the driver's verified window (all 50 fit).

# 1-3: headline BM25 scoring paths
_passthrough("fts_bm25_disjunctive", "fts_bm25_conjunctive", "fts_bm25_term")

# 4: BooleanQuery modes — ReqExclScorer, minimumShouldMatch, DisMax
_suite("fts_bool_modes", [
    ("must_not", "fts_bool_must_not", ("doc_id",), ("score",)),
    ("min_should", "fts_minshouldmatch", ("doc_id",), ("score",)),
    ("dismax", "fts_dismax", ("doc_id",), ("score",)),
    ("dismax_tie", "fts_dismax_tie", ("doc_id",), ("score",)),
    ("msm_spec", "fts_msm_spec", ("doc_id",), ("score",)),
    ("edismax_qf", "fts_edismax_fields", ("doc_id",), ("score",)),
    ("edismax_pf", "fts_edismax_pf", ("doc_id",), ("score",)),
    ("edismax_pf2", "fts_edismax_pf2", ("doc_id",), ("score",)),
    ("multireader", "fts_multireader_shards", ("doc_id",), ("score",)),
    ("covering", "fts_covering_query",
     ("doc_id",), ("n_matched", "min_required", "score")),
    ("common_terms", "fts_common_terms", ("doc_id",), ("score",)),
])

# 5: TermInSetQuery/TotalHitCount + FacetField term stats
_suite("fts_term_stats", [
    ("terms_component", "fts_terms_component",
     ("mode", "term"), ("df",)),
    ("phrases_id", "fts_phrases_identify",
     ("phrase", "pos_start"), ("pos_len", "score")),
    ("in_set_count", "fts_term_in_set_count", (), ("n_docs",)),
    ("facet_terms", "fts_facet_terms", ("term",), ("df",)),
    # index-statistic ValueSources: per-doc termfreq/tf/idf/dl; the
    # corpus constants (docfreq, cf, numdocs, sumttf) fold into k2 so
    # one hash row still verifies them
    ("index_stats", "fn_index_stats_packed", ("doc_id", "consts"),
     ("termfreq", "tf_classic", "idf", "dl")),
    ("term_vectors", "fts_term_vectors",
     ("doc_id", "term"), ("tf", "df", "tfidf")),
    ("facet_params", "fts_facet_params", ("term",), ("df",)),
    ("facet_contains", "fts_facet_contains", ("term",), ("df",)),
    ("high_freq", "fts_high_freq_terms", ("mode", "term"), ("val",)),
])

# 6: multi-term expansion — Prefix/Wildcard/Fuzzy/Regexp
_suite("fts_expand_multi", [
    ("prefix", "fts_prefix_expand", ("term",), ("df",)),
    ("wildcard", "fts_wildcard_expand", ("term",), ("df",)),
    ("rev_wildcard", "fts_rev_wildcard", ("term",), ("df",)),
    ("fuzzy", "fts_fuzzy_expand", ("term",), ("df",)),
    ("fuzzy_dl", "fts_fuzzy_dl_expand", ("term",), ("df",)),
    ("regexp", "fts_regexp_expand", ("term",), ("df",)),
    ("term_range", "fts_term_range", ("term",), ("df",)),
    ("phonetic", "fts_phonetic_codes", ("term", "code"), ("df",)),
])

# 7: positional phrase family — exact / sloppy / multi-term slot
_suite("fts_phrase_family", [
    ("exact", "fts_phrase_match", ("doc_id",), ("phrase_freq",)),
    ("sloppy", "fts_phrase_sloppy", ("doc_id",), ()),
    ("multi", "fts_multiphrase", ("doc_id",), ("phrase_freq",)),
    ("span_unordered", "fts_span_near", ("doc_id",), ("phrase_freq",)),
    ("span_first", "fts_span_first", ("doc_id",), ("span_freq", "score")),
    ("span_posrange", "fts_span_posrange",
     ("doc_id",), ("span_freq", "score")),
    ("span_not", "fts_span_not", ("doc_id",), ("span_freq", "score")),
    ("span_or", "fts_span_or", ("doc_id",), ("span_freq", "score")),
    ("span_within", "fts_span_within", ("doc_id",), ("span_freq", "score")),
    ("span_containing", "fts_span_containing",
     ("doc_id",), ("span_freq", "score")),
    ("interval", "fts_interval_ordered",
     ("doc_id",), ("span_freq", "score")),
    ("interval_unordered", "fts_interval_unordered",
     ("doc_id",), ("span_freq", "score")),
    ("interval_maxgaps", "fts_interval_maxgaps",
     ("doc_id",), ("span_freq", "score")),
    ("interval_containing", "fts_interval_containing",
     ("doc_id",), ("span_freq", "score")),
    ("interval_not_containing", "fts_interval_not_containing",
     ("doc_id",), ("span_freq", "score")),
    ("interval_phrase", "fts_interval_phrase",
     ("doc_id",), ("span_freq", "score")),
    ("interval_at_least", "fts_interval_at_least",
     ("doc_id",), ("span_freq", "score")),
    ("interval_within", "fts_interval_within",
     ("doc_id",), ("span_freq", "score")),
    ("interval_prefix", "fts_interval_prefix",
     ("doc_id",), ("span_freq", "score")),
    ("interval_or", "fts_interval_or",
     ("doc_id",), ("span_freq", "score")),
    ("term_automaton", "fts_term_automaton", ("doc_id",), ("score",)),
    ("phrase_over_synonym", "fts_phrase_over_synonym",
     ("doc_id", "phrase"), ()),
])

# 8-10: index statistics + significant terms
_passthrough(
    "fts_docfreq_stats", "fts_index_invariants", "fts_significant_terms"
)

# 11: classic QueryParser grammar end-to-end (8 constructs)
_suite("fts_parsed_suite", [
    ("and_not", "fts_parsed_query", ("doc_id",), ("score",)),
    ("mixed_req_opt", "fts_parsed_mixed", ("doc_id",), ("score",)),
    ("group_range", "fts_parsed_group_range", ("doc_id",), ("score",)),
    ("phrase_opt", "fts_parsed_phrase", ("doc_id",), ("score",)),
    ("expand", "fts_parsed_expand", ("doc_id",), ("score",)),
    ("fieldgroup", "fts_parsed_fieldgroup", ("doc_id",), ("score",)),
    ("escaped", "fts_parsed_escaped", ("doc_id",), ("score",)),
    ("complex_phrase", "fts_complex_phrase",
     ("doc_id",), ("phrase_freq", "score")),
    ("simple_syntax", "fts_parsed_simple", ("doc_id",), ("score",)),
    ("surround_syntax", "fts_parsed_surround", ("doc_id",), ("score",)),
    ("xml_syntax", "fts_parsed_xml", ("doc_id",), ("score",)),
    ("flexible_multifield", "fts_parsed_flexible", ("doc_id",), ("score",)),
    ("extended_syntax", "fts_parsed_extended", ("doc_id",), ("score",)),
])

# 12: score shaping — BoostQuery + ConstantScoreQuery
_suite("fts_score_shaping", [
    ("boost", "fts_boost_clauses", ("doc_id",), ("score",)),
    ("constant", "fts_constant_score", ("doc_id",), ("score",)),
    ("query_fn", "fn_query_boost", ("doc_id",), ("score",)),
    ("fuzzy_scored", "fts_fuzzy_scored", ("doc_id",), ("score",)),
    ("payload", "fts_payload_score",
     ("doc_id",), ("n_occ", "pay_sum", "pay_max", "pay_avg")),
    ("span_payload", "fts_span_payload_check",
     ("doc_id",), ("span_freq",)),
    ("synonym", "fts_synonym_query", ("doc_id",), ("score",)),
    ("classic_tfidf", "fts_classic_tfidf", ("doc_id",), ("score",)),
    ("boolean_sim", "fts_boolean_sim", ("doc_id",), ("score",)),
    ("additive_boost", "fn_additive_boost", ("doc_id",), ("score",)),
    ("elevate", "fts_query_elevation",
     ("doc_id",), ("score", "elev_pos", "rank")),
    ("sim_lm", "fts_sim_lm", ("model", "doc_id"), ("score",)),
    ("sim_dfr_ib", "fts_sim_dfr_ib", ("model", "doc_id"), ("score",)),
    ("sim_dfi_ax", "fts_sim_dfi_ax", ("model", "doc_id"), ("score",)),
    ("sim_misc", "fts_sim_misc", ("model", "doc_id"), ("score",)),
    ("sim_per_field", "fts_sim_per_field", ("doc_id",), ("score",)),
    ("bm25f", "fts_bm25f", ("doc_id",), ("score",)),
    ("fuzzy_like_this", "fts_fuzzy_like_this", ("doc_id",), ("score",)),
    ("expr_rerank", "fn_jsexpr_rerank",
     ("doc_id",), ("rr_score", "base_score")),
    ("feature_field", "fts_feature_field",
     ("doc_id",), ("freq", "sat_auto", "logv", "sig")),
    ("distance_feature", "fts_distance_feature",
     ("doc_id",), ("dfq_score",)),
])

# 13-14: analysis chains
# 13: analysis chains — the synonym/stop/length/shingle chain plus the
# WordDelimiterGraph sub-word splitter and Trim+PatternReplace chain
_suite("fts_analysis_suite", [
    ("chain", "fts_analysis_chain", ("shingle",), ("cnt",)),
    ("word_delim", "fts_word_delimiter", ("part",), ("cnt",)),
    ("pattern_trim", "fts_pattern_trim", ("tok",), ("cnt",)),
    ("stem_override", "fts_stem_override", ("stem",), ("cnt",)),
    ("common_grams", "fts_common_grams", ("gram",), ("cnt",)),
    ("light_stem", "fts_light_stemmers", ("lang_term", "stem"), ()),
    ("icu_fold", "fts_icu_folding", ("word", "folded"), ()),
    ("more_filters", "fts_more_filters", ("filt_input", "output_s"), ()),
    ("decompound", "fts_decompound", ("comp_input", "output_s"), ()),
    ("charfilter", "fts_charfilter", ("cf_input", "output_s"), ()),
    ("path_hier", "fts_pathhier", ("doc_id", "tok"), ("pos",)),
    ("auto_stop", "fts_auto_stopwords", ("stop_term",), ("df",)),
    ("wikipedia", "fts_wikipedia", ("wk_input", "output_s"), ()),
    ("classic", "fts_classic", ("cl_input", "output_s"), ()),
    ("uax29", "fts_uax29", ("ux_input", "output_s"), ()),
    ("chartok", "fts_chartokenizers", ("ct_input", "output_s"), ()),
    ("simplepattern", "fts_simplepattern", ("sp_input", "output_s"), ()),
    ("wdgf_full", "fts_wdgf_full", ("wd_input", "output_s"), ()),
    ("minhash", "fts_minhash", ("mh_input", "output_s"), ()),
    ("phonetic_enc", "fts_phonetic_encoders", ("enc_term", "code"), ()),
    ("hunspell", "fts_hunspell", ("suite_word", "stems"), ()),
    ("keyword_repeat", "fts_keyword_repeat",
     ("term", "forms"), ("n_forms",)),
    ("syn_graph", "fts_syngraph_tokens",
     ("doc_id", "term", "node", "is_syn"), ("pos_len",)),
])
_passthrough("fts_porter_stemmed_terms")

# 15: highlighter — classic first-match best-fragment (Highlighter/
# SimpleFragmenter) + passage-SCORED unified highlighting
# (UnifiedHighlighter/PassageScorer: BM25-weighted token windows,
# per-doc argmax, markup)
_suite("fts_highlight", [
    ("first", "fts_highlight", ("doc_id", "fragment"), ("first_pos",)),
    ("passage", "fts_passage_highlight", ("doc_id", "passage_text"),
     ("passage_score", "n_terms", "n_matches", "passage")),
    ("fvh", "fts_fvh_fragments", ("doc_id", "snippet"),
     ("frag", "span_start", "span_end", "score")),
    ("fvh_w", "fts_fvh_weighted", ("doc_id",),
     ("frag", "span_start", "span_end", "wscore")),
    ("fvh_mv", "fts_fvh_multivalued", ("doc_id", "snippet"),
     ("frag", "span_start", "span_end", "score")),
])

# 16: MoreLikeThis — term selection + retrieval
_suite("fts_mlt", [
    ("terms", "fts_mlt_terms", ("term",), ("tf", "df", "mlt_score")),
    ("retrieve", "fts_morelikethis", ("doc_id",), ("overlap",)),
    ("cluster", "fts_result_clusters", ("doc_id", "seed"), ("sim",)),
    ("cluster_labels", "fts_cluster_labels",
     ("seed", "term"), ("weight", "pos")),
])

# 17: suggest + spellcheck — term-prefix, direct spellcheck, plus the
# analyzed multi-token suggesters (AnalyzingSuggester lookup and
# FuzzySuggester typo-tolerant prefix)
_suite("fts_suggest_spell", [
    ("suggest", "fts_suggest_prefix", ("term",), ("weight",)),
    ("spellcheck", "fts_spellcheck", ("term",), ("distance", "df")),
    ("jaro_winkler", "fts_jaro_winkler", ("term",), ("jw",)),
    ("analyzing", "fts_suggest_analyzing", ("key",), ("weight",)),
    ("fuzzy", "fts_suggest_fuzzy", ("key",), ("weight", "distance")),
    ("word_breaks", "fts_word_breaks",
     ("input", "lft"), ("df_left", "df_right", "freq_sum")),
    ("collation", "fts_spell_collation",
     ("collated",), ("n_terms", "n_hits")),
    ("context", "fts_suggest_context", ("key", "ctx_s"), ("weight",)),
    ("freetext", "fts_freetext_suggest", ("completion",), ("score",)),
    ("blended_infix", "fts_suggest_blended_infix",
     ("key",), ("weight", "position", "score")),
])

# 18-19: percolator + explain
_passthrough("fts_percolate", "fts_explain_scores")

# 20: mutations
# 20: mutations — upsert/delete plus Solr atomic field modifiers
_suite("mut_suite", [
    ("upsert_delete", "mut_upsert_delete",
     ("doc_id", "is_updated"), ("text_len",)),
    ("atomic", "mut_atomic_update",
     ("doc_id", "state"), ("n_chars", "n_tags")),
    ("realtime_get", "mut_realtime_get",
     ("doc_id", "from_tlog"), ("rtg_text_len",)),
    ("nested", "mut_nested_flatten",
     ("doc_id", "nest_path"), ("root", "parent", "level")),
    ("update_chain", "mut_update_chain",
     ("doc_id", "ktags"), ("text_len", "n_uniq", "cat_len", "is_expired")),
    ("pk_split", "fts_pk_split_search", ("doc_id",), ("score",)),
])

# 21-22: source loaders (§2.1 wire formats)
QUERIES["src_xml_roundtrip"] = src_xml_roundtrip
ORACLE_SQL["src_xml_roundtrip"] = _XML_SQL
QUERIES["src_formats_parity"] = src_formats_parity
ORACLE_SQL["src_formats_parity"] = _PARITY_SQL

# 23-27: relational core
_passthrough(
    "rel_rollup_pricing", "rel_join_top_customers", "rel_brand_part_join",
    "rel_leftouter_nation_counts", "rel_having_frequent_buyers",
)

# 28: graph traversal — gatherNodes + shortestPath (BFS over edges)
_suite("rel_graph", [
    ("gather", "rel_graph_gather", ("node",), ("depth",)),
    ("gather_capped", "rel_graph_gather_capped", ("node",), ("depth",)),
    ("shortest_path", "rel_graph_path", ("src", "dst"), ("depth",)),
    ("score_nodes", "rel_graph_score",
     ("node",), ("cnt", "in_degree", "score")),
])

# 29: top-docs-per-group — grouping module + collapse
_suite("rel_topk_groups", [
    ("group_facet", "rel_group_facet",
     ("pri",), ("n_groups", "n_docs")),
    ("top2", "rel_window_top2_orders",
     ("o_custkey", "o_orderkey"), ("o_totalprice", "rnk")),
    ("group_query", "rel_group_query",
     ("grp", "o_orderkey"), ("o_totalprice", "rnk")),
    ("diversified", "rel_diversified_topk",
     ("o_orderkey", "o_orderpriority"), ("o_totalprice",)),
    ("collapse", "rel_collapse_best_order",
     ("o_custkey", "o_orderkey"), ("o_totalprice",)),
    ("expand", "rel_expand_groups",
     ("o_custkey", "o_orderkey"), ("o_totalprice", "rnk")),
    ("ngroups", "rel_group_ngroups", (), ("n_groups", "n_docs")),
])

# 30: FacetRange + TimeSeriesStream histograms
_suite("rel_facet_time", [
    ("timeseries", "rel_timeseries_daily",
     ("day", "event_type"), ("n_events", "total_value")),
    ("range_buckets", "rel_facet_range_buckets",
     ("bucket_lo",), ("cnt", "revenue")),
    ("date_math", "rel_date_math_window",
     ("day",), ("n_events", "total_value")),
    ("intervals", "rel_interval_facets", ("ival",), ("n",)),
])

# 31: UniqueStream + MergeStream + RandomStream (deterministic samples)
_suite("rel_stream_setops", [
    ("unique", "rel_unique_status_priority",
     ("o_orderstatus", "o_orderpriority"), ()),
    ("merge_sorted", "rel_merge_sorted_union",
     ("o_orderkey",), ("o_totalprice",)),
    ("random_sample", "td_random_sample", ("doc_id", "lang"), ()),
    ("stratified_sample", "td_stratified_sample",
     ("lang",), ("n_total", "n_sampled")),
])

# 32: StatsComponent
_passthrough("rel_stats_lineitem")

# 33: PointRangeQuery + PointInSetQuery
_suite("rel_point_filters", [
    ("range", "rel_range_query_events", ("event_type",), ("n",)),
    ("in_set", "rel_point_in_set",
     ("l_linenumber",), ("n_items", "sum_price")),
    ("frange", "rel_frange_query", ("o_orderkey",), ("fval",)),
    ("inet", "rel_inet_point",
     ("c_custkey", "ip_hex"), ("in_cidr", "in_range", "in_set")),
    ("range_fields", "rel_range_fields",
     ("o_orderkey",), ("within", "contains", "crosses")),
])

# 34: searchAfter paging + ExportStream full sort
_suite("rel_paging_export", [
    ("search_after", "rel_search_after_page",
     ("o_orderkey",), ("o_totalprice",)),
    ("export", "rel_export_sorted", ("c_custkey", "c_name"), ("acctbal",)),
    ("sort_missing", "rel_sort_missing",
     ("c_custkey",), ("bal_disp", "n_missing")),
])

# 35: block join + cartesian + semi/anti + JoinUtil score modes
_suite("rel_join_specials", [
    ("block_join", "rel_blockjoin_orders_with_big_item",
     ("o_orderkey",), ("o_totalprice",)),
    ("block_join_child", "rel_blockjoin_children",
     ("l_orderkey", "l_linenumber"), ("l_quantity",)),
    ("cartesian", "rel_cartesian_explode", ("r_name", "n_name"), ()),
    ("semi", "rel_semijoin_segments", ("c_mktsegment",), ("n_customers",)),
    ("anti", "rel_antijoin_no_orders", ("c_custkey", "c_name"), ()),
    ("scored_join", "fts_join_scores",
     ("source", "n_matching"),
     ("score_max", "score_min", "score_total", "score_avg")),
    ("child_docs", "rel_childdoc_transform",
     ("o_orderkey", "l_linenumber"), ("l_quantity",)),
    ("childfield_sort", "rel_childfield_sort",
     ("o_orderkey",), ("max_child_price",)),
])

# 36: percentile + HLL approx aggregates
_suite("rel_agg_approx", [
    ("dv_stats", "rel_dv_stats",
     ("event_type",), ("cnt", "missing", "mean", "variance")),
    ("percentile", "rel_percentile_prices",
     ("o_orderpriority",), ("p50", "p90")),
    ("hll", "rel_hll_user_count",
     ("event_type", "hll_ok"), ("exact_users",)),
    ("relatedness", "rel_relatedness_skg",
     ("term",), ("relatedness", "fg_pop", "bg_pop", "fg_count")),
])

# 37: FetchStream
_passthrough("rel_fetch_enrich")

# 38: facet nesting + taxonomy (lucene/facet): nested JSON facet,
# all-levels taxonomy counts, drill-down children
_suite("rel_facet_nested", [
    ("nested", "rel_facet_nested",
     ("n_name", "c_mktsegment"), ("nation_cnt", "cnt")),
    ("taxonomy", "rel_facet_taxonomy", ("path",), ("depth", "cnt")),
    ("drilldown", "rel_facet_drilldown", ("child",), ("cnt",)),
    ("pivot", "rel_facet_pivot", ("level", "path"), ("cnt",)),
    ("unique_block", "rel_unique_block",
     ("flag",), ("n_parents", "n_children")),
    ("bucket_stats", "rel_facet_bucket_stats",
     ("bucket",), ("cnt", "avg_price", "min_key", "n_cust")),
    ("drill_sideways", "rel_drill_sideways", ("dim", "label"), ("cnt",)),
    ("assoc_sums", "rel_facet_assoc",
     ("path",), ("sum_int", "sum_float")),
    ("long_values", "rel_facet_longvals", ("value",), ("cnt",)),
    ("domain_child", "rel_facet_domain", ("flag",), ("cnt", "qty")),
    ("domain_parent", "rel_facet_domain_parent",
     ("pri",), ("n_parents", "parent_price")),
    ("multiselect", "rel_facet_multiselect",
     ("pri",), ("cnt_excl_own", "cnt_all_filters")),
    ("sampled", "rel_facet_sampled",
     ("o_orderpriority",), ("sampled_cnt", "est_cnt")),
])

# 39: function queries — linear/recip/map/strdist/if + scale + the
# arithmetic/math/boolean/ordinal families + trig/hyperbolic/rounding/
# constants/concat (joined per order key)
_join_suite(
    "fn_value_scale",
    ["fn_value_sources", "fn_scale_query", "fn_math_funcs",
     "fn_trig_funcs", "fn_currency", "fn_vs_misc", "fn_jsexpr"],
    "o_orderkey",
)

# 40: statistical stream evaluators — corr/covar/OLS + distribution
# moments (stddev/skewness/kurtosis/geometric mean) + vector distances
# (euclidean/manhattan/chebyshev/canberra) + comparison bools
_suite("fn_evaluators", [
    ("ir_quality", "fn_ir_quality",
     ("qid",), ("avp", "mrr", "p10", "recall")),
    ("hyp_tests3", "fn_eval_tests4",
     ("pair_id",), ("paired_p", "gtest_p", "mean_diff", "sum_diff")),
    ("knn_regress", "fn_knn_regress",
     ("qid",), ("pred", "pred_robust")),
    ("corr_ols", "fn_eval_stats",
     ("l_linestatus", "n"), ("corr_qty_price", "covar_qty_price",
                             "slope", "intercept")),
    ("dist_moments", "fn_eval_dist",
     ("l_returnflag", "n"), ("stddev_pop", "skewness", "kurtosis",
                             "gmean")),
    ("vec_dist", "fn_eval_vecdist",
     ("vec_a", "vec_b"), ("euclid", "manhattan", "chebyshev",
                          "canberra")),
    ("cmp_bool", "fn_cmp_bools",
     ("o_orderpriority", "n_eq"), ("n_gt", "n_lt", "n_gte", "n_lte")),
    ("series", "fn_eval_series",
     ("o_orderkey", "n"), ("ma_first", "ma_last", "diff_sum", "q_max")),
    ("hyp_tests", "fn_eval_tests", ("stat",), ("v1", "v2")),
    ("hyp_tests2", "fn_eval_tests2",
     ("pair_id",), ("mw_u", "mw_p", "ks_d")),
    ("polyfit", "fn_eval_polyfit",
     ("pair_id",), ("p_first", "p_last", "p_sum", "n")),
    ("spline", "fn_eval_spline",
     ("pair_id",), ("mid_first", "d_first", "d_last", "integral")),
    ("loess", "fn_eval_loess",
     ("pair_id",), ("s_first", "s_last", "s_sum", "n")),
    ("transform", "fn_eval_transform",
     ("pair_id",), ("re2", "im2", "re_mass", "ak_first")),
    ("geometry", "fn_eval_geometry",
     ("pair_id",), ("hull_sig", "bary_x", "disk_r", "disk_c")),
    ("math_powlog", "fn_eval_math_powlog",
     ("x",), ("pw", "ln_x", "log10_x", "sqrt_x")),
    ("math_trig", "fn_eval_math_trig",
     ("x",), ("sin_x", "cos_x", "tan_x", "atan_x")),
    ("math_trig2", "fn_eval_math_trig2",
     ("x",), ("asin_x", "acos_x", "sinh_x", "tanh_x")),
    ("math_int", "fn_eval_math_int",
     ("x",), ("fact_x", "binom_x", "mod_x", "cbrt_x")),
    ("arr_norms", "fn_eval_arrays_norms",
     ("vec_a", "vec_b"), ("dot_ab", "cos_sim", "l1_a", "linf_a")),
    ("arr_scale", "fn_eval_arrays_scale",
     ("vec_id",), ("z_first", "mm_first", "unit_first", "grand_sum")),
    ("arr_ops", "fn_eval_arrays_ops",
     ("vec_a", "vec_b"), ("ebe_add_sum", "ebe_mul_sum", "scalar_add_sum",
                          "lshift_sum")),
    ("temporal_a", "fn_eval_temporal_a", ("d",), ("yr", "mo", "dy", "ep")),
    ("temporal_b", "fn_eval_temporal_b",
     ("d",), ("qtr", "wk", "doy", "doq")),
    ("matrix", "fn_eval_matrix",
     ("mid",), ("gram_trace", "row0_sum", "col0_sum", "mm_01")),
    ("signal", "fn_eval_signal",
     ("o_orderkey", "n"), ("conv3", "conv_sum", "delay", "mode_first")),
    ("distrib", "fn_eval_distrib",
     ("x",), ("norm_cdf", "binom_pmf", "poisson_pmf", "geom_cdf")),
    ("distrib2", "fn_eval_distrib2",
     ("x",), ("weibull_cdf", "lognorm_cdf", "zipf_pmf", "tri_cdf")),
    ("sliding", "fn_eval_sliding",
     ("o_orderkey", "n"), ("ema_last", "ema_first", "movmed_last",
                           "movmad_last")),
    ("anova", "fn_eval_anova",
     ("pair_id",), ("f_ratio", "p_value", "emd")),
    ("kmeans", "fn_eval_kmeans", ("cid", "n"), ("cx", "cy")),
    ("markov", "fn_eval_markovchain", ("step",), ("state",)),
    ("multikmeans", "fn_eval_multikmeans",
     ("restart", "cid"), ("n", "cx", "cy", "sse")),
    ("fuzzykmeans", "fn_eval_fuzzykmeans",
     ("cid",), ("n", "cx", "cy")),
    ("gaussfit", "fn_eval_gaussfit",
     ("curve",), ("p_a", "p_b", "p_c")),
    ("harmonicfit", "fn_eval_harmonicfit",
     ("curve",), ("p_a", "p_b", "p_c")),
    ("montecarlo", "fn_eval_montecarlo",
     ("stat", "n_in"), ("pi_hat", "integral_hat")),
    ("describe", "fn_eval_describe",
     ("pair_id",), ("d_mean", "d_std", "d_min", "d_max")),
    ("olsreg", "fn_eval_olsreg",
     ("pair_id",), ("b0", "b1", "b2", "rsq")),
    ("distrib3", "fn_eval_distrib3",
     ("x",), ("gamma_cdf", "beta_cdf", "enum_pmf", "enum_cdf")),
    ("hyp_tests3", "fn_eval_tests3",
     ("pair_id",), ("welch_p", "corr_p", "chi2_p")),
])

# 41: geodist + spatial bbox + at-rest cell-index box query
_suite("fn_geo", [
    ("geodist", "fn_geodist", ("c_custkey",), ("lat", "lon", "dist_km")),
    ("geohash", "fn_geo_hash", ("c_custkey", "ghash"), ("gh_dist_km",)),
    ("bbox", "fn_spatial_bbox",
     ("c_custkey", "c_name"), ("lat", "lon", "dist_km")),
    ("cell_index", "fn_geo_cells",
     ("c_custkey", "geo_cell"), ("lat", "lon")),
    ("polygon", "fn_geo_polygon", ("c_custkey",), ("lat", "lon")),
    ("polygon_general", "fn_geo_polygon_general",
     ("c_custkey",), ("lat", "lon")),
    ("heatmap", "fn_geo_heatmap", ("grid_row", "grid_col"), ("cnt",)),
    ("dist_rings", "fn_geo_dist_rings",
     ("ring",), ("cnt", "min_km", "max_km")),
    ("nearest", "fn_geo_nearest", ("c_custkey",), ("dist_km",)),
    ("geo3d", "fn_geo3d_polygon", ("c_custkey",), ("lat", "lon")),
    ("vincenty", "fn_geo_vincenty",
     ("c_custkey",), ("lat", "lon", "dist_scaled")),
])

# 42: Solr SQL surface
_passthrough("sql_analytics_surface")

# 43: classification + learning-to-rank rerank (solr/contrib/ltr)
_suite("ml_classify_rank", [
    ("naive_bayes", "ml_naive_bayes_lang",
     ("doc_id", "label"), ("score",)),
    ("knn_classifier", "ml_knn_classifier",
     ("label",), ("cnt", "vote")),
    ("ltr_rerank", "ml_ltr_rerank",
     ("doc_id", "n_matched"), ("f_bm25", "dl", "ltr_score")),
    ("rerank_query", "fts_rerank_query", ("doc_id",), ("score",)),
])

# 44: TextLogit classification
_passthrough("ml_textlogit_classify")

# 45: exact dedup
_passthrough("td_dedup_exact")

# 46: near-dup text family — MinHash-LSH / SimHash / n-gram Jaccard /
# chunk-level copy-paste contamination
_suite("td_dedup_near", [
    ("minhash_lsh", "td_dedup_minhash_lsh", ("doc_a", "doc_b"), ("jaccard",)),
    ("simhash", "td_dedup_simhash", ("doc_a", "doc_b"), ("hamming",)),
    ("ngram_jaccard", "td_ngram_jaccard", ("doc_a", "doc_b"), ("jaccard",)),
    ("chunk_shared", "td_chunk_dedup",
     ("doc_id",), ("n_chunks", "n_shared_chunks", "shared_ratio")),
    ("clusters", "td_dedup_clusters",
     ("doc_id", "canonical"), ("cluster_size",)),
])

# 47: embedding near-dup — exact all-pairs oracle + LSH scale path
_suite("td_dedup_embedding", [
    ("exact", "td_dedup_embedding_cosine", ("vec_a", "vec_b"), ("cosine",)),
    ("lsh", "td_dedup_embedding_lsh", ("vec_a", "vec_b"), ("cosine",)),
])

# 48: ANN top-k — brute-force + at-rest LSH bucket index + at-rest IVF
_suite("td_ann", [
    ("brute", "td_ann_cosine_topk", ("vec_id",), ("score",)),
    ("lsh_index", "td_ann_lsh_topk", ("vec_id",), ("score",)),
    ("ivf_index", "td_ann_ivf_topk", ("vec_id",), ("score",)),
    ("int8_flat", "td_ann_int8_topk", ("vec_id",), ("score",)),
])

# 49: per-document text metrics — lang ID / quality / tokens / fingerprint
_join_suite(
    "td_text_metrics",
    ["td_lang_id", "td_quality_score", "td_token_count", "td_fingerprint",
     "td_redaction", "td_cjk_tokens", "td_zh_tokens", "td_ngram_ppl",
     "td_seq_packing", "td_gopher_repetition", "td_gopher_quality",
     "td_c4_lines", "td_url_dedup", "td_importance",
     "td_decontamination"],
    "doc_id",
)

# 50: multimodal/binary — feature extraction + video frame sampling +
# Tika-style content extraction (sniff/dispatch/extract over binary)
_suite("td_multimodal", [
    ("features", "td_multimodal_features",
     ("media_id", "kind"), ("n_bytes", "f0")),
    ("frames", "td_multimodal_frames", ("media_id", "frame_ms"), ()),
    ("extract", "td_binary_extract",
     ("doc_id", "text"), ("ct_code", "n_chars", "is_stub")),
])

assert len(QUERIES) == 50, f"curated registry must be 50, got {len(QUERIES)}"
