"""Binary-document content extraction — the ExtractingRequestHandler
(solr/contrib/extraction, Tika) analog.

Reference: solr/contrib/extraction/src/java/org/apache/solr/handler/
extraction/ExtractingRequestHandler.java + ExtractingDocumentLoader
.java: opaque uploaded bytes → content-type detection → extracted text
→ indexable fields.

Spark shape: the pipeline runs on a ``binary`` content column.
- Content-type sniffing is magic-byte prefix comparison — a pure
  Column expression over the first bytes (no Python, nothing decoded
  that isn't needed).
- Plaintext extraction is a UTF-8 decode (codegen).
- HTML extraction runs the reference-exact HTMLStripCharFilter
  (analysis/charfilter.py — JVM-oracle-verified over 16.7k docs) via
  the Arrow dispatcher.
- PDF extraction is REAL for the common case (sources/pdfminimal.py:
  Flate streams + BT…ET text operators with full string-escape
  handling; font-CMap decoding a declared simplification) — the
  former import-gated stub is gone. ``is_stub`` stays in the schema
  for API stability and is now always 0.

At 100 TB this is a narrow per-row projection; payload bytes never
shuffle — extraction happens where the scan reads them, and only the
(small) extracted text moves on.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

__all__ = ["sniff_content_type", "extract_text", "extract"]


def sniff_content_type(bin_col: Column) -> Column:
    """Magic-byte content-type detection (Tika Detector analog):
    %PDF- → application/pdf, leading '<' → text/html, else
    text/plain."""
    return (
        F.when(
            F.substring(bin_col, 1, 5) == F.lit(b"%PDF-"),
            "application/pdf",
        )
        .when(F.substring(bin_col, 1, 1) == F.lit(b"<"), "text/html")
        .otherwise("text/plain")
    )


@F.pandas_udf(StringType())
def _pdf_text_pd(blobs: pd.Series) -> pd.Series:
    from .pdfminimal import pdf_extract_text

    return pd.Series([
        None if b is None else pdf_extract_text(bytes(b)) for b in blobs
    ])


@F.pandas_udf(StringType())
def _html_text_pd(blobs: pd.Series) -> pd.Series:
    from ..analysis.charfilter import html_strip

    # decode happens here, not as a JVM expression: UDF argument
    # projections run on EVERY row (ArrowEvalPython is unconditional
    # even under CASE WHEN), and ANSI decode() would throw on the
    # binary PDF rows
    return pd.Series([
        None
        if b is None
        else html_strip(bytes(b).decode("utf-8", "replace")).strip()
        for b in blobs
    ])


def extract_text(bin_col: Column) -> Column:
    """Extracted text per content type: real PDF parse, reference
    HTMLStrip, plaintext decode."""
    ct = sniff_content_type(bin_col)
    return (
        F.when(ct == "application/pdf", _pdf_text_pd(bin_col))
        .when(ct == "text/html", _html_text_pd(bin_col))
        # plaintext decode stays a JVM codegen expression — CASE WHEN
        # branches are lazy per-row, so it never sees PDF bytes
        .otherwise(F.decode(bin_col, "UTF-8"))
    )


def extract(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Full extraction: (id, content_type, text, n_chars, is_stub)."""
    b = F.col(content_col)
    ct = sniff_content_type(b)
    txt = extract_text(b)
    return df.select(
        F.col(id_col),
        ct.alias("content_type"),
        txt.alias("text"),
        F.length(txt).cast("long").alias("n_chars"),
        F.lit(0).cast("long").alias("is_stub"),
    )
