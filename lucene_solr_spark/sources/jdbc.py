"""JDBCStream analog: external-RDBMS transcript source/sink.

Reference: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
JDBCStream.java — Solr streams tuples out of an external RDBMS through
a JDBC connection and merges them into stream pipelines. Spark-side the
same capability is `spark.read.jdbc` with an explicit partitioning
spec; this module pins the transcript contract on top of it:

- schema normalization: whatever SQL types the database reports
  (Derby VARCHAR, Postgres TEXT, ...) are cast to the pinned
  TRANSCRIPT_SCHEMA after the read, so a JDBC source yields the
  byte-identical DataFrame shape as parquet/JSONL/CSV/XML.
- **partitioned pull**: a single-connection JDBC read is a scale
  killer (one executor drains the whole table). `partition_column` +
  `num_partitions` splits the table into range predicates executed by
  parallel executors — the required shape for bulk-loading from an
  operational store. Predicates (`WHERE` pushdown) travel to the
  database, not Spark.

The round-trip is tested against the Derby engine embedded in the
Spark distribution (tests/test_jdbc.py) — no external service.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .loaders import TRANSCRIPT_SCHEMA, _COLS

# Column DDL is left to Spark's per-engine JdbcDialect (Derby maps
# StringType -> CLOB; overriding it with VARCHAR breaks the writer's
# setNull, which always uses the dialect's JDBC type).


def _normalize(df: DataFrame) -> DataFrame:
    """Cast the database's reported types to the pinned schema."""
    return df.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in TRANSCRIPT_SCHEMA.fields
        ]
    )


def read_transcripts_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = "turn_idx",
    num_partitions: int = 8,
    lower_bound: int = 0,
    upper_bound: int = 8,
    predicate: str | None = None,
    driver: str | None = None,
) -> DataFrame:
    """Partitioned JDBC pull of a transcript table.

    ``partition_column`` must be numeric; Spark issues ``num_partitions``
    range-bounded queries in parallel (JDBCStream's single cursor is the
    N=1 degenerate case). ``predicate`` is passed VERBATIM to the database
    (quote identifiers per the engine's rules — Spark's writer creates
    quoted lower-case column names) and is pushed into every
    partition's WHERE clause database-side.
    """
    src = table if predicate is None else (
        f"(SELECT * FROM {table} WHERE {predicate}) t"
    )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", src)
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    return _normalize(reader.load())


def write_transcripts_jdbc(
    df: DataFrame, url: str, table: str, *, driver: str | None = None
) -> None:
    """UpdateStream-to-RDBMS analog (sink side of the round-trip)."""
    writer = (
        df.select(*_COLS)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .mode("overwrite")
    )
    if driver:
        writer = writer.option("driver", driver)
    writer.save()
