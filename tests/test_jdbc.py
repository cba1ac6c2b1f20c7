"""JDBCStream analog round-trip against the embedded Derby engine that
ships in the Spark distribution — a real JDBC database, no external
service (reference solr/solrj/.../io/stream/JDBCStream.java)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.sources.jdbc import (
    read_transcripts_jdbc,
    write_transcripts_jdbc,
)
from lucene_solr_spark.sources.loaders import TRANSCRIPT_SCHEMA


def _derby_available(spark) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    if not _derby_available(spark):
        pytest.skip("embedded Derby driver not on the Spark classpath")
    d = tmp_path_factory.mktemp("derby")
    return f"jdbc:derby:{d}/transcripts_db;create=true"


@pytest.fixture(scope="module")
def transcripts(spark, tiny_corpus):
    from lucene_solr_spark.index.builder import transcripts_from_pandas

    return transcripts_from_pandas(spark, tiny_corpus)


def _key_sorted(df):
    return [
        tuple(r) for r in df.orderBy("conv_id", "turn_idx").collect()
    ]


def test_jdbc_roundtrip_identity(spark, derby_url, transcripts):
    write_transcripts_jdbc(transcripts, derby_url, "turns")
    back = read_transcripts_jdbc(spark, derby_url, "turns")
    assert back.schema == TRANSCRIPT_SCHEMA
    assert _key_sorted(back) == _key_sorted(transcripts)


def test_jdbc_partitioned_read_parallelism(spark, derby_url, transcripts):
    """The scale contract: the pull is split into range-bounded queries
    (one per partition), not one cursor."""
    write_transcripts_jdbc(transcripts, derby_url, "turns_p")
    back = read_transcripts_jdbc(
        spark, derby_url, "turns_p",
        partition_column="turn_idx", num_partitions=4,
        lower_bound=0, upper_bound=8,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == transcripts.count()


def test_jdbc_predicate_pushed_to_database(spark, derby_url, transcripts):
    # numeric predicate: Derby stores strings as CLOB, which its SQL
    # can't compare with '=' — the partition/filter columns are numeric
    # by contract (turn_idx), exactly like JDBCStream's sort columns
    write_transcripts_jdbc(transcripts, derby_url, "turns_f")
    back = read_transcripts_jdbc(
        spark, derby_url, "turns_f", predicate='"turn_idx" < 3'
    )
    expect = transcripts.filter(F.col("turn_idx") < 3)
    assert _key_sorted(back) == _key_sorted(expect)
