"""Source-format loaders: JSONL / CSV round-trip the transcript schema.

Per-row invariant (BASELINE.json input_hint): text equality under stable
(conv_id, turn_idx) ordering must hold regardless of wire format.
"""

import tempfile

from pyspark.sql import functions as F

import pytest

from lucene_solr_spark.sources.loaders import (
    TRANSCRIPT_SCHEMA,
    read_transcripts_csv,
    read_transcripts_json,
    read_transcripts_xml,
    write_transcripts_csv,
    write_transcripts_json,
    write_transcripts_xml,
)
from lucene_solr_spark.sources.synth import synth_transcripts


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_transcripts(spark, 500).cache()


def _sorted_rows(df):
    return [
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
        for r in df.orderBy("conv_id", "turn_idx").collect()
    ]


def test_jsonl_roundtrip(spark, corpus):
    path = tempfile.mkdtemp(prefix="lss_jsonl_")
    write_transcripts_json(corpus, path)
    back = read_transcripts_json(spark, path)
    assert back.schema == TRANSCRIPT_SCHEMA
    assert _sorted_rows(back) == _sorted_rows(corpus)


def test_csv_roundtrip(spark, corpus):
    path = tempfile.mkdtemp(prefix="lss_csv_")
    write_transcripts_csv(corpus, path)
    back = read_transcripts_csv(spark, path)
    assert back.schema == TRANSCRIPT_SCHEMA
    assert _sorted_rows(back) == _sorted_rows(corpus)


def test_no_inference_pass(spark, corpus):
    # schema-on-read: the loaded frame carries the pinned schema even on
    # an empty directory glob (no sampling job, no surprise types)
    path = tempfile.mkdtemp(prefix="lss_jsonl_")
    write_transcripts_json(corpus.limit(1), path)
    df = read_transcripts_json(spark, path)
    assert [f.dataType for f in df.schema.fields] == [
        f.dataType for f in TRANSCRIPT_SCHEMA.fields
    ]


def test_xml_roundtrip(spark, corpus):
    """XMLLoader analog over Spark 4's native XML data source: one <turn>
    element per row; per-row invariant holds vs the in-memory corpus."""
    path = tempfile.mkdtemp(prefix="lss_xml_")
    write_transcripts_xml(corpus, path)
    back = read_transcripts_xml(spark, path)
    assert back.schema == TRANSCRIPT_SCHEMA
    assert _sorted_rows(back) == _sorted_rows(corpus)


def test_xml_roundtrip_hostile_text(spark):
    """Markup-hostile text (<, >, &, entities) must survive XML escaping."""
    rows = [
        ("c0", 0, "user", 'x < y && z > "w" &amp; <turn>fake</turn>', None),
        ("c0", 1, "assistant", "plain", "search"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.lit("2026-01-01 00:00:00").cast("timestamp"))
    path = tempfile.mkdtemp(prefix="lss_xml_hostile_")
    write_transcripts_xml(df, path)
    back = read_transcripts_xml(spark, path)
    assert _sorted_rows(back) == _sorted_rows(df)


def test_csv_roundtrip_hostile_text(spark):
    """Text with embedded newlines, commas, and quotes must survive the
    CSV round-trip (multiLine + RFC-4180 quoting)."""
    rows = [
        ("c0", 0, "user", 'line one\nline "two", with comma', None),
        ("c0", 1, "assistant", "plain", "search"),
        # empty-string text must round-trip as "" (not NULL): the
        # empty-as-null rule is scoped to the `tool` column only
        ("c0", 2, "tool", "", "calc"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.lit("2026-01-01 00:00:00").cast("timestamp"))
    path = tempfile.mkdtemp(prefix="lss_csv_hostile_")
    write_transcripts_csv(df, path)
    back = read_transcripts_csv(spark, path)
    assert _sorted_rows(back) == _sorted_rows(df)


def test_binary_extraction_dispatch(spark):
    """Tika-analog: magic-byte sniff routes HTML (HTMLStripCharFilter),
    plaintext (decode), and PDF (real pdfminimal parse) — over a real
    binary column; the PDF branch must round-trip a Flate-compressed
    page back to its source text."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.sources.extraction import extract
    from lucene_solr_spark.sources.pdfminimal import pdf_build_minimal

    rows = [
        (0, bytes("<html><b>hello</b> world</html>", "utf-8")),
        (1, bytes("plain café text", "utf-8")),
        (2, pdf_build_minimal("secret pdf body (café)", flate=True)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in extract(df).collect()}
    assert got[0]["content_type"] == "text/html"
    assert got[0]["text"] == "hello world"
    assert got[1]["content_type"] == "text/plain"
    assert got[1]["text"] == "plain café text"
    assert got[2]["content_type"] == "application/pdf"
    assert got[2]["text"] == "secret pdf body (café)"
    assert got[2]["is_stub"] == 0 and got[0]["is_stub"] == 0
