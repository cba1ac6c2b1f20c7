"""facet.pivot value trees (PivotFacetProcessor analog)."""

from pyspark.sql import functions as F

from lucene_solr_spark.operators.facet import pivot_facets


def _rows(df):
    return {(r["level"], r["path"]): r["cnt"] for r in df.collect()}


def test_pivot_tree_counts(spark):
    df = spark.createDataFrame(
        [("us", "ca", "x"), ("us", "ca", "y"), ("us", "ny", "x"),
         ("fr", "id", "x")],
        "c string, s string, t string",
    )
    got = _rows(pivot_facets(df, ["c", "s", "t"]))
    assert got[(1, "us")] == 3 and got[(1, "fr")] == 1
    assert got[(2, "us/ca")] == 2 and got[(2, "us/ny")] == 1
    assert got[(3, "us/ca/x")] == 1 and got[(3, "us/ca/y")] == 1
    assert len(got) == 2 + 3 + 4


def test_pivot_mincount_and_null_values(spark):
    # a NULL field value must not be confused with a rollup level
    df = spark.createDataFrame(
        [("us", None), ("us", None), ("us", "ca"), ("fr", "id")],
        "c string, s string",
    )
    got = _rows(pivot_facets(df, ["c", "s"], mincount=2))
    assert got == {(1, "us"): 3, (2, "us"): 2}
    # (2, 'us') is the NULL-state bucket: concat_ws drops the null part;
    # mincount=2 pruned fr and us/ca


def test_pivot_limit_prunes_subtrees(spark):
    rows = (
        [("a", "p")] * 5 + [("a", "q")] * 2
        + [("b", "p")] * 3
        + [("c", "p")] * 1
    )
    df = spark.createDataFrame(rows, "c string, s string")
    got = _rows(pivot_facets(df, ["c", "s"], limit=2))
    # top-2 level-1 values by (cnt desc, value asc): a(7), b(3); c pruned
    assert (1, "c") not in got and (2, "c/p") not in got
    assert got[(1, "a")] == 7 and got[(1, "b")] == 3
    assert got[(2, "a/p")] == 5 and got[(2, "a/q")] == 2
    assert got[(2, "b/p")] == 3


def test_pivot_single_shuffle_plan(spark):
    """The whole tree must come from ONE rollup aggregation, not one
    groupBy per level: exactly one Expand node in the plan."""
    df = spark.createDataFrame(
        [("us", "ca", "x")], "c string, s string, t string"
    )
    plan = pivot_facets(df, ["c", "s", "t"])._jdf.queryExecution().toString()
    assert plan.count("Expand") >= 1
    assert "rollup" in plan.lower() or "expand" in plan.lower()
