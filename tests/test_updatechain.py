"""UpdateRequestProcessorChain analogs: per-processor unit behavior.

Reference semantics per factory javadoc in
solr/core/src/java/org/apache/solr/update/processor/ (each case below
names its factory).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.updatechain import (
    apply_chain,
    clone_field,
    concat_field,
    count_field_values,
    default_value,
    doc_expiration,
    expired_filter,
    field_length,
    first_value,
    html_strip,
    ignore_field,
    last_value,
    max_value,
    min_value,
    regex_replace,
    remove_blank,
    timestamp_field,
    trim_field,
    truncate_field,
    uniq_values,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "  Hello <b>World</b> 42  ", "en", ["b", "a", "b", "c"]),
            (2, "", None, []),
        ],
        "id: long, text: string, lang: string, tags: array<string>",
    )


def test_scalar_processors(frame):
    out = apply_chain(frame, [
        clone_field("lang", "lang_orig"),
        remove_blank("text"),
        default_value("lang", "und"),
        html_strip("text"),
        regex_replace("text", "[0-9]+", "#"),
        regex_replace("text", "\\s+", " "),
        trim_field("text"),
        truncate_field("text", 7),
        field_length("text", "text_len"),
    ]).orderBy("id").collect()
    r1, r2 = out
    # html tags stripped, digits collapsed to '#', whitespace
    # normalized, trimmed, truncated to 7
    assert r1.text == "Hello W"
    assert r1.text_len == 7
    assert r1.lang == "en" and r1.lang_orig == "en"
    # blank text removed (null), null lang defaulted
    assert r2.text is None
    assert r2.lang == "und" and r2.lang_orig is None


def test_multivalue_processors(frame):
    out = apply_chain(frame, [
        first_value("tags", "first_t"),
        last_value("tags", "last_t"),
        max_value("tags", "max_t"),
        min_value("tags", "min_t"),
        concat_field("tags", "cat"),
        uniq_values("tags"),
        count_field_values("tags", "n_uniq"),
    ]).orderBy("id").collect()
    r1, r2 = out
    assert (r1.first_t, r1.last_t, r1.max_t, r1.min_t) == ("b", "c", "c", "a")
    assert r1.cat == "b, a, b, c"  # ConcatField default ", " delimiter
    assert r1.tags == ["b", "a", "c"]  # uniq keeps first-seen order
    assert r1.n_uniq == 3
    assert r2.n_uniq == 0 and r2.first_t is None and r2.max_t is None


def test_ignore_and_timestamp(frame):
    out = apply_chain(frame, [
        ignore_field("tags"),
        timestamp_field("ingest_ts", "2026-01-02 03:04:05"),
    ])
    assert "tags" not in out.columns
    row = out.orderBy("id").first()
    assert row.ingest_ts == datetime.datetime(2026, 1, 2, 3, 4, 5)
    # TimestampUpdateProcessor sets only when absent: existing survives
    pre = frame.withColumn(
        "ingest_ts", F.to_timestamp(F.lit("2020-06-06 00:00:00"))
    )
    kept = apply_chain(pre, [timestamp_field("ingest_ts", "2026-01-01 00:00:00")])
    assert kept.first().ingest_ts == datetime.datetime(2020, 6, 6)


def test_doc_expiration(spark):
    df = spark.createDataFrame([(1, 5), (2, 40)], "id: long, ttl: int")
    out = apply_chain(df, [doc_expiration("ttl", "2026-01-01 00:00:00")])
    live = out.filter(~expired_filter("2026-01-15 00:00:00")).collect()
    dead = out.filter(expired_filter("2026-01-15 00:00:00")).collect()
    assert [r.id for r in dead] == [1]  # expires Jan 6 < Jan 15
    assert [r.id for r in live] == [2]  # expires Feb 10
    assert dead[0]._expire_at_ == datetime.datetime(2026, 1, 6)
