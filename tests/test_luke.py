"""Index inspector (Luke analog): the inspector's report must equal
values recomputed from the raw corpus — CheckIndex-style cross-checks
(reference lucene/luke UI surfaces; index/CheckIndex.java stats)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts"),
)

from lucene_solr_spark.index.builder import simple_tokens
from lucene_solr_spark.index.segments import build_segmented_index
from lucene_solr_spark.sources.synth import synth_transcripts


@pytest.fixture(scope="module")
def luke_report(spark, tmp_path_factory):
    from luke import inspect

    idx_dir = str(tmp_path_factory.mktemp("lukeidx"))
    corpus = synth_transcripts(spark, 300)
    build_segmented_index(
        corpus, idx_dir, num_segments=4, seg_group_size=2, n_buckets=8,
        analyzer="simple",
    )
    return corpus, inspect(idx_dir, top=10)


def test_luke_stats_match_corpus(spark, luke_report):
    corpus, info = luke_report
    toks = corpus.select(F.explode(simple_tokens("text")).alias("term"))
    assert info["doc_count"] == 300
    assert info["sum_total_term_freq"] == toks.count()
    assert info["n_terms"] == toks.distinct().count()
    assert info["n_segments"] == 4
    assert info["blocks"] > 0 and info["payload_bytes"] > 0


def test_luke_top_terms_match_recount(spark, luke_report):
    corpus, info = luke_report
    base = corpus.select(
        F.monotonically_increasing_id().alias("rid"), "text"
    )
    df_true = {
        r["term"]: (r["df"], r["cf"])
        for r in base.select(
            "rid", F.explode(simple_tokens("text")).alias("term")
        )
        .groupBy("term")
        .agg(
            F.countDistinct("rid").alias("df"), F.count("*").alias("cf")
        )
        .collect()
    }
    for term, df, cf in info["top_terms"]:
        assert df_true[term] == (df, cf)


def test_luke_histogram_covers_all_docs(luke_report):
    _, info = luke_report
    assert sum(c for _, c in info["dl_histogram"]) == 300
