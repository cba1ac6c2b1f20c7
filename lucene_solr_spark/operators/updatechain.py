"""UpdateRequestProcessorChain: composable ingest-time field mutations.

Reference: solr/core/src/java/org/apache/solr/update/processor/ — Solr
runs every incoming document through a configured chain of
UpdateRequestProcessors before indexing (UpdateRequestProcessorChain
.java; each FieldMutatingUpdateProcessor mutates one field of the
in-flight SolrInputDocument). The rebuilt chain is the same concept
over a DataFrame: each processor factory returns a ``DataFrame →
DataFrame`` stage of pure Column expressions, and ``apply_chain`` folds
them in order. Everything is narrow (no shuffle, no UDF), so the chain
fuses into the ingest scan's WholeStageCodegen at any scale.

Processor analogs (reference file in update/processor/):
- ``clone_field``        CloneFieldUpdateProcessorFactory.java
- ``trim_field``         TrimFieldUpdateProcessorFactory.java
- ``regex_replace``      RegexReplaceProcessorFactory.java (replace-all)
- ``default_value``      DefaultValueUpdateProcessorFactory.java
- ``timestamp_field``    TimestampUpdateProcessorFactory.java (pinned
                         NOW for determinism — Solr stamps wall-clock)
- ``truncate_field``     TruncateFieldUpdateProcessorFactory.java
- ``field_length``       FieldLengthUpdateProcessorFactory.java
- ``html_strip``         HTMLStripFieldUpdateProcessorFactory.java
- ``concat_field``       ConcatFieldUpdateProcessorFactory.java
- ``count_field_values`` CountFieldValuesUpdateProcessorFactory.java
- ``first_value`` / ``last_value`` / ``max_value`` / ``min_value``
                         {First,Last,Max,Min}FieldValueUpdateProcessorFactory.java
- ``uniq_values``        UniqFieldsUpdateProcessorFactory.java
- ``remove_blank``       RemoveBlankFieldUpdateProcessorFactory.java
- ``ignore_field``       IgnoreFieldUpdateProcessorFactory.java
- ``doc_expiration``     DocExpirationUpdateProcessorFactory.java
                         (computes _expire_at_ = NOW + _ttl_; the
                         reaper's delete = ``expired_filter``)

Ingest-time signature dedup (SignatureUpdateProcessorFactory.java) and
language-id (LangIdentifierUpdateProcessor) live in streaming/dedup.py
and operators/textqual.py respectively; atomic updates
(AtomicUpdateDocumentMerger.java) in operators/atomic.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "apply_chain", "clone_field", "trim_field", "regex_replace",
    "default_value", "timestamp_field", "truncate_field", "field_length",
    "html_strip", "concat_field", "count_field_values", "first_value",
    "last_value", "max_value", "min_value", "uniq_values", "remove_blank",
    "ignore_field", "doc_expiration", "expired_filter",
]


def apply_chain(df: DataFrame, processors) -> DataFrame:
    """Run ``df`` through the processor chain in order
    (UpdateRequestProcessorChain.java: each processor's processAdd
    delegates to the next)."""
    for proc in processors:
        df = proc(df)
    return df


def _with(field: str, expr_fn):
    def proc(df: DataFrame) -> DataFrame:
        return df.withColumn(field, expr_fn(df))

    return proc


def clone_field(src: str, dest: str):
    """Copy source field to dest (CloneFieldUpdateProcessorFactory)."""
    return _with(dest, lambda df: F.col(src))


def trim_field(field: str):
    """Strip surrounding whitespace (TrimFieldUpdateProcessorFactory)."""
    return _with(field, lambda df: F.trim(F.col(field)))


def regex_replace(field: str, pattern: str, replacement: str):
    """Replace-all regex rewrite (RegexReplaceProcessorFactory —
    literalReplacement default true is Solr's quoteReplacement; here the
    replacement is used verbatim, group refs not expanded by choice of
    replacement strings)."""
    return _with(
        field, lambda df: F.regexp_replace(F.col(field), pattern, replacement)
    )


def default_value(field: str, value):
    """Fill missing values (DefaultValueUpdateProcessorFactory)."""
    return _with(field, lambda df: F.coalesce(F.col(field), F.lit(value)))


def timestamp_field(field: str, now: str):
    """Stamp ingest time on docs that don't already carry one
    (TimestampUpdateProcessorFactory sets the field only when absent).
    ``now`` is pinned by the caller for determinism; Solr stamps
    wall-clock."""

    def proc(df: DataFrame) -> DataFrame:
        stamp = F.to_timestamp(F.lit(now))
        if field in df.columns:
            return df.withColumn(field, F.coalesce(F.col(field), stamp))
        return df.withColumn(field, stamp)

    return proc


def truncate_field(field: str, max_len: int):
    """Cap value length (TruncateFieldUpdateProcessorFactory)."""
    return _with(field, lambda df: F.substring(F.col(field), 1, max_len))


def field_length(field: str, dest: str):
    """Replace/attach character length
    (FieldLengthUpdateProcessorFactory maps value → value.length())."""
    return _with(dest, lambda df: F.length(F.col(field)))


def html_strip(field: str):
    """Drop markup tags (HTMLStripFieldUpdateProcessorFactory — the
    same tag-strip rule sources/extraction.py uses)."""
    return _with(
        field,
        lambda df: F.trim(F.regexp_replace(F.col(field), "<[^>]*>", " ")),
    )


def concat_field(field: str, dest: str, delimiter: str = ", "):
    """Join multivalues into one string
    (ConcatFieldUpdateProcessorFactory, default delimiter ", ")."""
    return _with(dest, lambda df: F.array_join(F.col(field), delimiter))


def count_field_values(field: str, dest: str):
    """Replace multivalue with its count
    (CountFieldValuesUpdateProcessorFactory)."""
    return _with(dest, lambda df: F.size(F.col(field)))


def first_value(field: str, dest: str):
    """Keep the first value (FirstFieldValueUpdateProcessorFactory);
    NULL for an empty multivalue (try_element_at — ANSI-safe)."""
    return _with(dest, lambda df: F.try_element_at(F.col(field), F.lit(1)))


def last_value(field: str, dest: str):
    """Keep the last value (LastFieldValueUpdateProcessorFactory);
    NULL for an empty multivalue."""
    return _with(dest, lambda df: F.try_element_at(F.col(field), F.lit(-1)))


def max_value(field: str, dest: str):
    """Keep the maximum value (MaxFieldValueUpdateProcessorFactory —
    natural ordering of the values)."""
    return _with(dest, lambda df: F.array_max(F.col(field)))


def min_value(field: str, dest: str):
    """Keep the minimum value (MinFieldValueUpdateProcessorFactory)."""
    return _with(dest, lambda df: F.array_min(F.col(field)))


def uniq_values(field: str):
    """De-duplicate multivalues, first-seen order preserved
    (UniqFieldsUpdateProcessorFactory)."""
    return _with(field, lambda df: F.array_distinct(F.col(field)))


def remove_blank(field: str):
    """Null out zero-length strings
    (RemoveBlankFieldUpdateProcessorFactory)."""
    return _with(
        field,
        lambda df: F.when(F.col(field) == "", None).otherwise(F.col(field)),
    )


def ignore_field(field: str):
    """Drop the field entirely (IgnoreFieldUpdateProcessorFactory)."""

    def proc(df: DataFrame) -> DataFrame:
        return df.drop(field)

    return proc


def doc_expiration(
    ttl_days_col: str,
    now: str,
    dest: str = "_expire_at_",
):
    """Compute the expiration timestamp from a per-doc TTL
    (DocExpirationUpdateProcessorFactory: _expire_at_ = NOW + _ttl_;
    ``now`` pinned by the caller). The reaper's periodic
    deleteByQuery(_expire_at_:[* TO NOW]) is ``expired_filter``."""
    return _with(
        dest,
        lambda df: F.to_timestamp(F.lit(now))
        + F.make_interval(days=F.col(ttl_days_col)),
    )


def expired_filter(as_of: str, field: str = "_expire_at_") -> Column:
    """The reaper predicate: docs whose expiration has passed at
    ``as_of`` (DocExpirationUpdateProcessorFactory's
    DeleteExpiredDocsRunnable)."""
    return F.col(field) <= F.to_timestamp(F.lit(as_of))
