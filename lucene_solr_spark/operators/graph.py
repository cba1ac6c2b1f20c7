"""Graph traversal streams: gatherNodes / shortestPath analogs.

Solr's graph expressions walk an edge relation stored in the index:
``gatherNodes`` expands a frontier one hop per call (collecting unique
nodes), ``shortestPath`` runs an iterative breadth-first join until the
target appears (reference solr/solrj/.../io/graph/GatherNodesStream
.java, ShortestPathStream.java — whose own implementation is literally
"a distributed breadth first search" by repeated joins).

Spark-first: BFS IS iterative joins —

    frontier(d+1) = distinct(frontier(d) ⋈ edges) ∖ visited

Each hop is one broadcast/shuffle join + anti-join; the LOOP is bounded
by ``max_depth`` and runs entirely as plan composition (no collect, no
driver data — the loop variable is just which DataFrame is the
frontier). At 10^12 edges each hop is a partitioned join on the edge
key; a Pregel-style engine only changes who schedules the hops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bfs_depths", "gather_nodes", "shortest_path_length"]


def bfs_depths(
    edges: DataFrame,
    roots,
    max_depth: int | None,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_interval: int = 4,
    stop_node: int | None = None,
) -> DataFrame:
    """(node, depth) — minimum hop count from any root, BFS bounded by
    ``max_depth`` (None = walk until the frontier drains — terminates
    on any finite graph since ``visited`` grows monotonically).
    ``roots``: list of node ids.

    Every ``checkpoint_interval`` hops the frontier and visited sets
    are eagerly localCheckpoint'ed: iterative plan composition
    otherwise grows the lineage quadratically with depth (the
    ShortestPathStream loop re-plans every prior hop), and the
    materialization point doubles as the termination probe —
    empty frontier, or ``stop_node`` reached (shortestPath's early
    exit; overshoot is < one interval and cannot corrupt depths: the
    anti-join keeps first-visit minima)."""
    import itertools

    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(int(r), 0) for r in roots], "node long, depth int"
    )
    frontier = visited.select("node")
    if max_depth is None and checkpoint_interval < 1:
        raise ValueError(
            "unbounded BFS needs checkpoint_interval >= 1 to probe "
            "frontier drain"
        )
    hops = (
        range(1, max_depth + 1) if max_depth is not None
        else itertools.count(1)
    )
    for d in hops:
        nxt = (
            frontier.join(edges, frontier.node == F.col(src_col))
            .select(F.col(dst_col).cast("long").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        visited = visited.unionByName(
            nxt.withColumn("depth", F.lit(d).cast("int"))
        )
        frontier = nxt
        if checkpoint_interval and d % checkpoint_interval == 0:
            frontier = frontier.localCheckpoint(eager=True)
            visited = visited.localCheckpoint(eager=True)
            if frontier.isEmpty():
                break
            if stop_node is not None and frontier.filter(
                F.col("node") == int(stop_node)
            ).limit(1).count():
                break
    return visited


def gather_nodes(
    edges: DataFrame,
    roots,
    hops: int = 1,
    src_col: str = "src",
    dst_col: str = "dst",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """GatherNodesStream analog: unique nodes within ``hops`` of the
    roots, with their minimum depth (roots at depth 0).

    ``max_doc_freq`` is the GraphTermsQParser super-node prune
    (reference solr/core/.../search/GraphTermsQParserPlugin.java —
    GraphTermsQuery drops traversal terms whose docFreq exceeds the
    cap): destination nodes with more than ``max_doc_freq`` incoming
    edges are never expanded INTO — one broadcast-able frequency agg
    filters the edge relation before the walk, so a celebrity node
    cannot fan the frontier out to the whole graph."""
    if max_doc_freq is not None:
        freq = edges.groupBy(dst_col).agg(F.count("*").alias("_df"))
        edges = (
            edges.join(
                F.broadcast(freq.filter(F.col("_df") <= max_doc_freq)),
                dst_col,
                "left_semi",
            )
        )
    return bfs_depths(edges, roots, hops, src_col, dst_col)


def shortest_path_length(
    edges: DataFrame,
    src: int,
    dst: int,
    max_depth: int | None = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """ShortestPathStream analog (hop count): one row
    (src, dst, depth) when ``dst`` is reachable within ``max_depth``,
    empty otherwise. ``max_depth=None`` walks until the target is
    found or the component drains (ShortestPathStream's own loop runs
    to maxDepth OR until the BFS finds the target — the early-exit,
    reference solr/solrj/.../io/graph/ShortestPathStream.java)."""
    depths = bfs_depths(
        edges, [src], max_depth, src_col, dst_col, stop_node=dst
    )
    return depths.filter(F.col("node") == dst).select(
        F.lit(int(src)).alias("src"),
        F.col("node").alias("dst"),
        "depth",
    )


def score_nodes(
    edges: DataFrame,
    roots,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """ScoreNodesStream analog (reference solr/solrj/.../io/stream/
    ScoreNodesStream.java): tf-idf relevance for the nodes of one
    gather round. tf = the node's traversal count (edges arriving from
    the root set — gatherNodes' count(*) aggregation); idf uses the
    node's global in-degree as its docFreq against the edge count as
    docCount: score = cnt * ln(n_edges / in_degree). Nodes every walk
    reaches (hubs) rank below selectively-reached ones, exactly the
    stream's purpose.

    → (node, cnt, in_degree, score). Plan: two hash-aggs over the edge
    relation plus one broadcast of the 1-row edge count — no driver
    collect, co-partitionable on dst at scale."""
    spark = edges.sparkSession
    roots = [int(r) for r in roots]
    arrivals = (
        edges.filter(F.col(src_col).isin(roots))
        .groupBy(F.col(dst_col).cast("long").alias("node"))
        .agg(F.count("*").alias("cnt"))
    )
    indeg = edges.groupBy(F.col(dst_col).cast("long").alias("node")).agg(
        F.count("*").alias("in_degree")
    )
    total = edges.agg(F.count("*").alias("n_edges"))
    return (
        arrivals.join(indeg, "node")
        .crossJoin(F.broadcast(total))
        .select(
            "node",
            "cnt",
            "in_degree",
            (
                F.col("cnt").cast("double")
                * F.log(
                    F.col("n_edges").cast("double")
                    / F.col("in_degree").cast("double")
                )
            ).alias("score"),
        )
    )
