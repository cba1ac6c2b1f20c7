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
    "parse_numeric", "parse_date", "parse_boolean", "uuid_field",
    "ignore_large_document", "version_constraints",
    "flatten_nested",
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


def parse_numeric(field: str, dtype: str = "long"):
    """Parse{Int,Long,Float,Double}FieldUpdateProcessorFactory: replace
    a string value with its parsed numeric when parseable; an
    unparseable value becomes NULL in the typed column and is preserved
    verbatim in ``<field>_raw`` (the reference leaves the original
    string on the doc — a DataFrame column holds one type, so the raw
    survives beside it). ``try_cast`` keeps the stage codegen-fused."""
    def proc(df: DataFrame) -> DataFrame:
        parsed = F.expr(f"try_cast({field} AS {dtype})")
        keep_raw = F.when(
            F.col(field).isNotNull() & parsed.isNull(), F.col(field)
        )
        return df.withColumn(f"{field}_raw", keep_raw).withColumn(
            field, parsed
        )

    return proc


def parse_date(field: str, formats):
    """ParseDateFieldUpdateProcessorFactory: try each configured format
    in order, first success wins (the factory's format-list loop);
    unparseable → NULL + raw preserved."""
    def proc(df: DataFrame) -> DataFrame:
        parsed = F.coalesce(
            *[F.expr(f"try_to_timestamp({field}, '{fmt}')")
              for fmt in formats]
        )
        keep_raw = F.when(
            F.col(field).isNotNull() & parsed.isNull(), F.col(field)
        )
        return df.withColumn(f"{field}_raw", keep_raw).withColumn(
            field, parsed
        )

    return proc


def parse_boolean(
    field: str,
    true_values=("true", "t", "yes", "y", "on", "1"),
    false_values=("false", "f", "no", "n", "off", "0"),
):
    """ParseBooleanFieldUpdateProcessorFactory: configured
    caseInsensitive true/false value sets (factory defaults)."""
    tv = [v.lower() for v in true_values]
    fv = [v.lower() for v in false_values]

    def proc(df: DataFrame) -> DataFrame:
        low = F.lower(F.col(field))
        parsed = (
            F.when(low.isin(tv), F.lit(True))
            .when(low.isin(fv), F.lit(False))
        )
        keep_raw = F.when(
            F.col(field).isNotNull() & parsed.isNull(), F.col(field)
        )
        return df.withColumn(f"{field}_raw", keep_raw).withColumn(
            field, parsed
        )

    return proc


def uuid_field(dest: str, from_col: str):
    """UUIDUpdateProcessorFactory analog: a DETERMINISTIC name-based
    UUID (the v5 shape — md5 of the source key with version/variant
    bits formatted 8-4-4-4-12) instead of the reference's random v4,
    so re-ingest is idempotent and the value is reproducible in SQL."""
    def proc(df: DataFrame) -> DataFrame:
        h = F.md5(F.col(from_col).cast("string"))
        uid = F.concat_ws(
            "-",
            F.substring(h, 1, 8),
            F.substring(h, 9, 4),
            F.concat(F.lit("5"), F.substring(h, 14, 3)),
            F.concat(F.lit("8"), F.substring(h, 18, 3)),
            F.substring(h, 21, 12),
        )
        return df.withColumn(dest, uid)

    return proc


def ignore_large_document(max_bytes: int):
    """IgnoreLargeDocumentProcessorFactory: drop documents whose
    estimated serialized size exceeds the limit (the factory estimates
    the SolrInputDocument's size; here the JSON serialization of the
    row — a scan-fused filter, no shuffle)."""
    def proc(df: DataFrame) -> DataFrame:
        return df.filter(
            F.octet_length(F.to_json(F.struct(*df.columns)))
            <= max_bytes
        )

    return proc


def version_constraints(id_col: str, version_col: str):
    """DocBasedVersionConstraintsProcessorFactory: among competing
    updates for one id, only the highest user-version survives (ties
    keep one deterministically — the factory rejects non-increasing
    versions at ingest; batch analog = per-id argmax). One hash
    shuffle on the id, the same key the index is partitioned by."""
    from pyspark.sql import Window

    def proc(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(id_col).orderBy(
            F.desc(version_col), *[
                F.desc(c) for c in df.columns
                if c not in (id_col, version_col)
            ]
        )
        return (
            df.withColumn("_vc_rank", F.row_number().over(w))
            .filter(F.col("_vc_rank") == 1)
            .drop("_vc_rank")
        )

    return proc


def flatten_nested(
    df: DataFrame,
    id_col: str = "id",
    child_fields: tuple = ("_childDocuments_",),
) -> DataFrame:
    """NestedUpdateProcessorFactory analog (update/processor/
    NestedUpdateProcessorFactory.java): flatten a document tree into
    block rows, annotating every descendant with ``_root_`` (the tree's
    top id), ``_nest_path_`` ("/<childField>#<ordinal>" segments, the
    Solr path syntax), ``_nest_parent_``, and ``level``.  Parents emit
    path '' / parent -1.

    The input carries children as array<struct> columns named in
    ``child_fields``; each child struct has its own ``id_col`` and may
    itself carry any of the child fields (Spark schemas are finite, so
    the tree depth is the schema depth).  One ``posexplode`` per
    (level, child field) — all narrow, no shuffle: block construction
    cost is one pass over the tree rows regardless of corpus size."""
    from pyspark.sql import types as T

    base_cols = [
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(id_col).cast("long").alias("_root_"),
        F.lit("").alias("_nest_path_"),
        F.lit(-1).cast("long").alias("_nest_parent_"),
        F.lit(0).alias("level"),
    ]
    out = df.select(*base_cols)
    frontier = [(df, F.col(id_col).cast("long"), F.lit("").cast("string"),
                 F.lit(0))]
    level = 0
    while frontier:
        nxt = []
        level += 1
        for frame, root_expr, path_expr, _lvl in frontier:
            schema = {f.name: f.dataType for f in frame.schema.fields}
            for cf in child_fields:
                dt = schema.get(cf)
                if not isinstance(dt, T.ArrayType) or not isinstance(
                    dt.elementType, T.StructType
                ):
                    continue
                exploded = frame.select(
                    root_expr.alias("__root"),
                    F.col(id_col).cast("long").alias("__parent"),
                    path_expr.alias("__ppath"),
                    F.posexplode(F.col(cf)).alias("__ord", "__c"),
                )
                child = exploded.select(
                    "__root", "__parent", "__ord",
                    F.concat(
                        F.col("__ppath"), F.lit(f"/{cf}#"),
                        F.col("__ord").cast("string"),
                    ).alias("__path"),
                    F.col("__c.*"),
                )
                out = out.unionByName(
                    child.select(
                        F.col(id_col).cast("long").alias("doc_id"),
                        F.col("__root").alias("_root_"),
                        F.col("__path").alias("_nest_path_"),
                        F.col("__parent").alias("_nest_parent_"),
                        F.lit(level).alias("level"),
                    )
                )
                nxt.append((
                    child, F.col("__root"), F.col("__path"), F.lit(level)
                ))
        frontier = nxt
    return out
