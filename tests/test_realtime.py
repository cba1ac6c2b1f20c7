"""RealTimeGet: tlog overlay, search/get divergence, commit fold."""

from pyspark.sql import functions as F

from lucene_solr_spark.index.realtime import (
    committed_read, docstore_init, realtime_get, rtg_commit, tlog_add,
    tlog_files,
)


def _store(spark, tmp_path):
    d = str(tmp_path / "rtg")
    docs = spark.createDataFrame(
        [(i, f"committed text {i}") for i in range(10)],
        "doc_id long, text string",
    )
    docstore_init(docs, d)
    return d


def _ops(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, op string")


def test_get_spans_tlog_search_does_not(spark, tmp_path):
    d = _store(spark, tmp_path)
    tlog_add(_ops(spark, [(3, "uncommitted v2", "add"),
                          (11, "brand new doc", "add"),
                          (5, None, "delete")]), d)
    # /get view: update visible, new doc visible, delete hides
    got = {r["doc_id"]: (r["text"], r["_from_tlog"])
           for r in realtime_get(spark, d).collect()}
    assert got[3] == ("uncommitted v2", True)
    assert got[11] == ("brand new doc", True)
    assert 5 not in got and got[0] == ("committed text 0", False)
    # SEARCH view: committed only — none of the above
    search = {r["doc_id"]: r["text"] for r in committed_read(spark, d).collect()}
    assert search[3] == "committed text 3" and 11 not in search and 5 in search
    # multi-id form
    assert {r["doc_id"] for r in realtime_get(spark, d, ids=[3, 5, 11]).collect()} == {3, 11}


def test_latest_op_wins_across_batches(spark, tmp_path):
    d = _store(spark, tmp_path)
    tlog_add(_ops(spark, [(2, "rev A", "add")]), d)
    tlog_add(_ops(spark, [(2, "rev B", "add")]), d)
    tlog_add(_ops(spark, [(4, "revived?", "add")]), d)
    tlog_add(_ops(spark, [(4, None, "delete")]), d)
    got = {r["doc_id"]: r["text"] for r in realtime_get(spark, d).collect()}
    assert got[2] == "rev B" and 4 not in got


def test_commit_folds_tlog_into_new_generation(spark, tmp_path):
    d = _store(spark, tmp_path)
    tlog_add(_ops(spark, [(1, "v2", "add"), (7, None, "delete")]), d)
    gen = rtg_commit(spark, d)
    assert gen == 1 and tlog_files(d) == []
    # search now sees what /get saw; /get == committed (empty tlog)
    search = {r["doc_id"]: r["text"] for r in committed_read(spark, d).collect()}
    assert search[1] == "v2" and 7 not in search and len(search) == 9
    got = {r["doc_id"]: r["text"] for r in realtime_get(spark, d).collect()}
    assert got == search
    # a second commit cycle keeps working
    tlog_add(_ops(spark, [(1, "v3", "add")]), d)
    assert rtg_commit(spark, d) == 2
    assert committed_read(spark, d).filter(
        F.col("doc_id") == 1
    ).first()["text"] == "v3"


def test_half_written_tlog_batch_invisible(spark, tmp_path):
    """A crashed writer leaves only a .tmp dir — readers must not see
    it (the tmp+rename publish rule)."""
    import os

    d = _store(spark, tmp_path)
    tlog_add(_ops(spark, [(0, "good", "add")]), d)
    # simulate a crash: half-written batch under the dot-tmp name
    _ops(spark, [(1, "torn", "add")]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/tlog/.tlog-0000000099.tmp")
    assert tlog_files(d) == ["tlog-0000000000.parquet"]
    got = {r["doc_id"]: r["text"] for r in realtime_get(spark, d).collect()}
    assert got[0] == "good" and got[1] == "committed text 1"
    assert os.path.isdir(f"{d}/tlog/.tlog-0000000099.tmp")
