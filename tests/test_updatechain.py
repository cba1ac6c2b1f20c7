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


def test_parse_numeric_and_raw_preservation(spark):
    from lucene_solr_spark.operators.updatechain import (
        apply_chain, parse_numeric,
    )

    df = spark.createDataFrame(
        [("1", "42"), ("2", "not-a-number"), ("3", None)],
        "id string, v string",
    )
    out = apply_chain(df, [parse_numeric("v", "long")]).orderBy("id")
    rows = out.collect()
    assert [r["v"] for r in rows] == [42, None, None]
    assert [r["v_raw"] for r in rows] == [None, "not-a-number", None]


def test_parse_date_format_list(spark):
    from lucene_solr_spark.operators.updatechain import (
        apply_chain, parse_date,
    )

    df = spark.createDataFrame(
        [("1", "2024-05-06"), ("2", "06/05/2024"), ("3", "junk")],
        "id string, d string",
    )
    out = apply_chain(
        df, [parse_date("d", ["yyyy-MM-dd", "dd/MM/yyyy"])]
    ).orderBy("id")
    rows = out.collect()
    assert str(rows[0]["d"]).startswith("2024-05-06")
    assert str(rows[1]["d"]).startswith("2024-05-06")
    assert rows[2]["d"] is None and rows[2]["d_raw"] == "junk"


def test_parse_boolean_defaults(spark):
    from lucene_solr_spark.operators.updatechain import (
        apply_chain, parse_boolean,
    )

    df = spark.createDataFrame(
        [("1", "Yes"), ("2", "off"), ("3", "maybe")],
        "id string, b string",
    )
    rows = apply_chain(df, [parse_boolean("b")]).orderBy("id").collect()
    assert [r["b"] for r in rows] == [True, False, None]
    assert rows[2]["b_raw"] == "maybe"


def test_uuid_field_deterministic_v5_shape(spark):
    import re

    from lucene_solr_spark.operators.updatechain import (
        apply_chain, uuid_field,
    )

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    rows = apply_chain(df, [uuid_field("uid", "k")]).collect()
    uids = [r["uid"] for r in rows]
    assert uids[0] == uids[1] != uids[2]
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-8[0-9a-f]{3}"
        r"-[0-9a-f]{12}$"
    )
    assert all(pat.match(u) for u in uids)


def test_ignore_large_document(spark):
    from lucene_solr_spark.operators.updatechain import (
        apply_chain, ignore_large_document,
    )

    df = spark.createDataFrame(
        [("1", "x"), ("2", "y" * 500)], "id string, body string"
    )
    out = apply_chain(df, [ignore_large_document(200)])
    assert [r["id"] for r in out.collect()] == ["1"]


def test_version_constraints_keeps_max_version(spark):
    from lucene_solr_spark.operators.updatechain import (
        apply_chain, version_constraints,
    )

    df = spark.createDataFrame(
        [("a", 1, "old"), ("a", 3, "new"), ("b", 2, "only")],
        "id string, ver int, body string",
    )
    rows = (
        apply_chain(df, [version_constraints("id", "ver")])
        .orderBy("id")
        .collect()
    )
    assert [(r["id"], r["ver"], r["body"]) for r in rows] == [
        ("a", 3, "new"), ("b", 2, "only"),
    ]


def test_flatten_nested_paths(spark):
    """NestedUpdateProcessor analog: _root_/_nest_path_/_nest_parent_
    annotations over a 3-level tree with two child collections."""
    from lucene_solr_spark.operators.updatechain import flatten_nested

    rows = [
        (1, [
            (11, [(111, None), (112, None)], None),
            (12, [], None),
        ], [(19, None, None)]),
        (2, [], None),
    ]
    schema = (
        "id long, "
        "items array<struct<id: long, "
        "  items: array<struct<id: long, items: array<struct<id: long>>>>, "
        "  notes: array<struct<id: long>>>>, "
        "notes array<struct<id: long, items: array<struct<id: long>>, "
        "  notes: array<struct<id: long>>>>"
    )
    df = spark.createDataFrame(rows, schema)
    out = {
        r["doc_id"]: (r["_root_"], r["_nest_path_"], r["_nest_parent_"],
                      r["level"])
        for r in flatten_nested(
            df, id_col="id", child_fields=("items", "notes")
        ).collect()
    }
    assert out[1] == (1, "", -1, 0)
    assert out[2] == (2, "", -1, 0)
    assert out[11] == (1, "/items#0", 1, 1)
    assert out[12] == (1, "/items#1", 1, 1)
    assert out[19] == (1, "/notes#0", 1, 1)
    assert out[111] == (1, "/items#0/items#0", 11, 2)
    assert out[112] == (1, "/items#0/items#1", 11, 2)
    assert len(out) == 7
