"""Transcript source loaders: JSON-lines / CSV / parquet ingestion.

The reference accepts documents over several wire formats — Solr update
handlers for JSON, XML, and CSV (reference solr/core/src/java/org/apache/
solr/handler/loader/JsonLoader.java, CSVLoader.java, XMLLoader.java) and
the benchmark LineDocSource one-doc-per-line reader
(lucene/benchmark/.../feeds/LineDocSource.java). Spark-side, each format
is a `spark.read` with the PINNED transcript schema applied explicitly —
schema-on-read, never inference, so every format yields the identical
DataFrame shape (input_hint: conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp) and the per-row invariant (text
equality under stable (conv_id, turn_idx) ordering) holds regardless of
the wire format.

Scale notes: JSONL and CSV are splittable when uncompressed (Spark
assigns intra-file splits), so a 100 TB drop-zone ingests with full
parallelism; schema-on-read skips Spark's sampling pass entirely (no
inference job). XML uses Spark 4's native XML data source (rowTag-based,
SPARK-44265) — parallel across files, one file per update batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_COLS = [f.name for f in TRANSCRIPT_SCHEMA.fields]


def _normalize(df: DataFrame) -> DataFrame:
    """Project to the pinned column order (formats may reorder)."""
    return df.select(*_COLS)


def read_transcripts_parquet(spark: SparkSession, path: str) -> DataFrame:
    return _normalize(spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path))


def read_transcripts_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines, one turn per line (JsonLoader / LineDocSource analog).
    Explicit schema — no inference pass, splittable input. FAILFAST: a
    corrupt line is an error, not a silent all-null row (the reference
    loaders reject malformed updates)."""
    return _normalize(
        spark.read.schema(TRANSCRIPT_SCHEMA)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("mode", "FAILFAST")
        .json(path)
    )


def read_transcripts_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV with header (CSVLoader analog). Explicit schema + explicit
    timestamp format. NULL is spelled ``\\N`` on the wire (written and
    read symmetrically), so an empty-string `text` turn round-trips as
    ``""`` — distinct from NULL — matching parquet/JSONL semantics in
    every column. multiLine + RFC-4180 quoting so text containing
    newlines/commas/quotes round-trips (note: multiLine makes a single
    CSV file non-splittable — at scale prefer many files or JSONL for
    the drop zone). FAILFAST as above."""
    return _normalize(
        spark.read.schema(TRANSCRIPT_SCHEMA)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("nullValue", "\\N")
        .option("multiLine", "true")
        .option("escape", '"')
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_transcripts_xml(spark: SparkSession, path: str) -> DataFrame:
    """XMLLoader analog (reference solr/core/src/java/org/apache/solr/
    handler/loader/XMLLoader.java): one <turn> element per document.
    Spark 4 ships the XML data source natively (SPARK-44265) — pinned
    schema, explicit timestamp format, FAILFAST, splittable across files
    (one XML file parses as a unit; at scale the drop zone is many
    files, one per update batch, exactly like Solr update requests)."""
    return _normalize(
        spark.read.format("xml")
        .option("rowTag", "turn")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("mode", "FAILFAST")
        .schema(TRANSCRIPT_SCHEMA)
        .load(path)
    )


def write_transcripts_json(df: DataFrame, path: str) -> None:
    df.select(*_COLS).withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    ).write.mode("overwrite").json(path)


def write_transcripts_csv(df: DataFrame, path: str) -> None:
    df.select(*_COLS).withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    ).write.mode("overwrite").option("header", "true").option(
        "escape", '"'
    ).option("nullValue", "\\N").csv(path)


def write_transcripts_xml(df: DataFrame, path: str) -> None:
    """One <turn> element per row under a <transcripts> root (the update
    handler wire shape). NULL tool columns are omitted elements, which
    read back as NULL — the same round-trip contract as JSONL."""
    df.select(*_COLS).withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    ).write.mode("overwrite").format("xml").option("rowTag", "turn").option(
        "rootTag", "transcripts"
    ).save(path)
