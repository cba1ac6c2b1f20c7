"""Minimal PDF text extraction (sources/pdfminimal.py) — the real
parser behind the Tika-analog extract() PDF branch
(solr/contrib/extraction ExtractingRequestHandler dispatch).

Pure-Python tests for the parser/writer pair plus one Spark
round-trip through the binary-column pipeline.
"""

import zlib

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.sources.extraction import extract
from lucene_solr_spark.sources.pdfminimal import (
    pdf_build_minimal,
    pdf_extract_text,
)

TEXTS = [
    "hello world",
    "",
    "a",
    "(parens) and \\backslash\\ mix",
    "newline\nin\ntext and tab\there",
    "unicode: é ü ß 中文テスト 🙂 end",
    "literal endstream inside the text",
    "  leading and trailing whitespace  ",
    "close)" * 4 + "(open" * 4,
    "long " * 2000,
]


@pytest.mark.parametrize("flate", [False, True])
@pytest.mark.parametrize("tj", [False, True])
def test_roundtrip_all_variants(flate, tj):
    for t in TEXTS:
        blob = pdf_build_minimal(t, flate=flate, use_tj_array=tj)
        assert blob.startswith(b"%PDF-")
        assert pdf_extract_text(blob) == t.strip()


def test_length_key_protects_flate_trailing_eol():
    # a Flate payload whose compressed bytes end in 0x0A/0x0D must not
    # be corrupted by EOL trimming — /Length bounds the stream exactly
    for seed in range(200):
        t = f"doc {seed} " + "word " * (seed % 37)
        blob = pdf_build_minimal(t, flate=True)
        assert pdf_extract_text(blob) == t.strip()


def test_unsupported_filter_yields_no_text():
    content = b"BT (secret) Tj ET"
    body = (
        b"<< /Length %d /Filter /DCTDecode >>\nstream\n" % len(content)
        + content
        + b"\nendstream"
    )
    assert pdf_extract_text(b"%PDF-1.4\n1 0 obj\n" + body + b"\nendobj") == ""


def test_corrupt_flate_yields_no_text():
    junk = b"\x00\x01notzlib\xff"
    body = (
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(junk)
        + junk
        + b"\nendstream"
    )
    assert pdf_extract_text(b"%PDF-1.4\n" + body) == ""


def test_escapes_and_hex_strings():
    # octal escapes, continuations and hex strings per PDF 32000-1 §7.3.4
    stream = (
        b"BT (oct: \\101\\102\\103) Tj (cont\\\ninued) Tj "
        b"<48454C4C4F> Tj ET"
    )
    body = (
        b"<< /Length %d >>\nstream\n" % len(stream) + stream + b"\nendstream"
    )
    assert (
        pdf_extract_text(b"%PDF-1.4\n" + body) == "oct: ABCcontinuedHELLO"
    )


def test_line_advance_operators_insert_newlines():
    stream = b"BT (line one) Tj 0 -14 Td (line two) Tj T* (three) ' ET"
    body = (
        b"<< /Length %d >>\nstream\n" % len(stream) + stream + b"\nendstream"
    )
    assert pdf_extract_text(b"%PDF-1.4\n" + body) == (
        "line one\nline two\nthree"
    )


def test_multiple_streams_and_blocks():
    s1 = b"BT (alpha) Tj ET BT (beta) Tj ET"
    s2 = zlib.compress(b"BT (gamma) Tj ET")
    doc = (
        b"%PDF-1.4\n"
        + b"<< /Length %d >>\nstream\n" % len(s1)
        + s1
        + b"\nendstream\n"
        + b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(s2)
        + s2
        + b"\nendstream"
    )
    assert pdf_extract_text(doc) == "alpha\nbeta\ngamma"


def test_spark_binary_pipeline_dispatch(spark):
    rows = [
        (0, pdf_build_minimal("pdf doc zero", flate=True)),
        (1, b"plain text one"),
        (2, b"<html><body><p>html two</p></body></html>"),
        (3, pdf_build_minimal("tj variant", use_tj_array=True)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {
        r["doc_id"]: r
        for r in extract(df).collect()
    }
    assert out[0]["content_type"] == "application/pdf"
    assert out[0]["text"] == "pdf doc zero"
    assert out[1]["content_type"] == "text/plain"
    assert out[1]["text"] == "plain text one"
    assert out[2]["content_type"] == "text/html"
    assert out[2]["text"] == "html two"
    assert out[3]["text"] == "tj variant"
    assert all(r["is_stub"] == 0 for r in out.values())
    assert all(
        r["n_chars"] == len(r["text"]) for r in out.values()
    )
