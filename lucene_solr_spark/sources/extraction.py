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
- Plaintext and HTML extraction are real: UTF-8 decode and tag-strip
  regexp, all codegen.
- PDF/rich-document parsing is honestly STUBBED behind an import-try
  (no parser library ships in this container — the same declared
  pattern as ``operators/multimodal.decode_image``): the plumbing
  (binary column, sniff, dispatch, schema) is production-real, the
  parser hook swaps in when a library is present.

At 100 TB this is a narrow per-row projection; payload bytes never
shuffle — extraction happens where the scan reads them, and only the
(small) extracted text moves on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["HAVE_PDF", "sniff_content_type", "extract_text", "extract"]

try:  # pragma: no cover - not installed in this environment
    import pypdf  # noqa: F401

    HAVE_PDF = True
except Exception:  # pragma: no cover
    HAVE_PDF = False


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


def extract_text(bin_col: Column) -> Column:
    """Extracted text per content type. PDF returns the deterministic
    stub marker ``PDF_TEXT_UNAVAILABLE(<n_bytes>)`` unless a parser
    library is importable (HAVE_PDF)."""
    txt = F.decode(bin_col, "UTF-8")
    html = F.trim(F.regexp_replace(txt, "<[^>]*>", ""))
    if HAVE_PDF:  # pragma: no cover - library absent here
        raise NotImplementedError(
            "pypdf present: wire a pandas_udf parser here"
        )
    pdf = F.concat(
        F.lit("PDF_TEXT_UNAVAILABLE("),
        F.length(bin_col).cast("string"),
        F.lit(")"),
    )
    ct = sniff_content_type(bin_col)
    return (
        F.when(ct == "application/pdf", pdf)
        .when(ct == "text/html", html)
        .otherwise(txt)
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
        (ct == "application/pdf").cast("long").alias("is_stub"),
    )
