"""Graph traversal streams (gatherNodes / shortestPath analogs):
BFS-as-iterative-joins must produce textbook BFS results."""

from pyspark.sql import functions as F

from lucene_solr_spark.operators.graph import (
    bfs_depths,
    gather_nodes,
    shortest_path_length,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_bfs_min_depths_on_known_graph(spark):
    # 0→1→2→3 chain plus shortcut 0→2: depth(2) must be 1, not 2
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 2)])
    got = {r["node"]: r["depth"] for r in bfs_depths(e, [0], 4).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_gather_respects_hop_bound_and_multi_roots(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (10, 11)])
    got = {r["node"]: r["depth"] for r in gather_nodes(e, [0, 10], hops=1).collect()}
    assert got == {0: 0, 10: 0, 1: 1, 11: 1}


def test_shortest_path_length_and_unreachable(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    row = shortest_path_length(e, 0, 3, max_depth=6).collect()
    assert [tuple(r) for r in row] == [(0, 3, 3)]
    assert shortest_path_length(e, 3, 0, max_depth=6).count() == 0


def test_bfs_handles_cycles(spark):
    e = _edges(spark, [(0, 1), (1, 0), (1, 2)])
    got = {r["node"]: r["depth"] for r in bfs_depths(e, [0], 5).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_score_nodes(spark):
    """ScoreNodesStream tf-idf: hubs reached by everything score below
    selectively-reached nodes with the same traversal count."""
    import math

    import pytest

    from lucene_solr_spark.operators.graph import score_nodes

    # 6 edges; node 9 is a hub (in-degree 4), node 5 rare (in-degree 1)
    edges = spark.createDataFrame(
        [(0, 9), (1, 9), (2, 9), (3, 9), (0, 5), (3, 6)],
        "src long, dst long",
    )
    rows = {
        r["node"]: (r["cnt"], r["in_degree"], r["score"])
        for r in score_nodes(edges, [0, 1]).collect()
    }
    assert set(rows) == {9, 5}
    cnt9, ind9, s9 = rows[9]
    cnt5, ind5, s5 = rows[5]
    assert (cnt9, ind9) == (2, 4) and (cnt5, ind5) == (1, 1)
    assert s9 == pytest.approx(2 * math.log(6 / 4))
    assert s5 == pytest.approx(1 * math.log(6 / 1))
    assert s5 > s9  # rarity outranks the hub despite half the count


def test_bfs_lineage_bounded_over_30_hops(spark):
    """Deep BFS must not grow its plan quadratically: with periodic
    localCheckpoint the analyzed-plan size at hop 30 stays bounded (a
    few checkpoint leaves), and the depths are still exact."""
    from lucene_solr_spark.operators.graph import bfs_depths

    # a 40-node chain: 0 -> 1 -> ... -> 39
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "src long, dst long"
    )
    out = bfs_depths(edges, [0], max_depth=30, checkpoint_interval=4)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 20_000, len(plan)  # unchecked growth is ~100x this
    got = {r["node"]: r["depth"] for r in out.collect()}
    assert got == {i: i for i in range(31)}


def test_bfs_unbounded_drains_and_stops(spark):
    """max_depth=None walks the whole component and terminates on a
    CYCLIC graph (frontier drains once visited covers the cycle)."""
    from lucene_solr_spark.operators.graph import (
        bfs_depths, shortest_path_length,
    )

    edges = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)] + [(3, 50), (50, 51)],
        "src long, dst long",
    )
    got = {r["node"]: r["depth"]
           for r in bfs_depths(edges, [0], max_depth=None).collect()}
    assert got[9] == 9 and got[50] == 4 and got[51] == 5 and len(got) == 12

    # unbounded shortest path early-exits when the target appears
    row = shortest_path_length(edges, 0, 51, max_depth=None).collect()
    assert [(r["src"], r["dst"], r["depth"]) for r in row] == [(0, 51, 5)]
    assert shortest_path_length(edges, 0, 999, max_depth=None).count() == 0
