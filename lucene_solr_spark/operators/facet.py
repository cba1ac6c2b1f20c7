"""Taxonomy / hierarchical facets — the lucene/facet module analog.

The reference's facet module counts documents per category path at
every level of a taxonomy ("Author/Bob", "Date/2010/March") and
supports drilling into a path (lucene/facet/src/java/org/apache/
lucene/facet/taxonomy/FastTaxonomyFacetCounts.java — ordinal counts
for all ancestors per doc; lucene/facet/.../DrillDownQuery.java —
term filter on the path prefix + child counts).

Spark shape:
- ``taxonomy_counts``: build the ancestor-prefix array per row with
  higher-order functions (split → transform over depth → concat_ws),
  explode, hash-aggregate — one shuffle of (prefix) pairs, map-side
  combined, regardless of taxonomy depth. The reference's ordinal
  arrays are replaced by the prefix strings themselves; at 100 TB the
  exploded rows are narrow (one small string per level).
- ``drill_down``: prefix filter (pushed to the scan as a startswith)
  + group-by on the next path component — DrillDownQuery + one
  getTopChildren call.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "path_col", "taxonomy_counts", "taxonomy_sum_associations",
    "long_value_counts", "drill_down", "pivot_facets",
    "relatedness_col", "round5",
]


def path_col(*parts) -> Column:
    """Assemble a facet path from component columns (FacetField's
    dim/path array, flattened with the module's '/' convention)."""
    return F.concat_ws("/", *parts)


def taxonomy_counts(
    df: DataFrame, path: str = "path", delim: str = "/"
) -> DataFrame:
    """Counts for every ancestor prefix of every row's path — the
    all-levels ordinal count table of FastTaxonomyFacetCounts.

    Returns (path, depth, cnt)."""
    parts = F.split(F.col(path), delim)
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.concat_ws(delim, F.slice(parts, F.lit(1), i)),
    )
    return (
        df.select(F.explode(prefixes).alias("path"))
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn(
            "depth", F.size(F.split(F.col("path"), delim)).cast("long")
        )
    )


def taxonomy_sum_associations(
    df: DataFrame,
    int_col: str,
    float_col: str,
    path: str = "path",
    delim: str = "/",
) -> DataFrame:
    """Association facets: per ancestor prefix, the SUM of each doc's
    int/float association value instead of a count — the reference's
    TaxonomyFacetSum{Int,Float}Associations over
    {Int,Float}AssociationFacetField payloads (lucene/facet/.../
    taxonomy/TaxonomyFacetSumIntAssociations.java,
    TaxonomyFacetSumFloatAssociations.java:70-90 — each doc adds its
    per-ordinal association to every matching ordinal). Same single
    exploded hash-agg shape as taxonomy_counts — the association
    values ride the exploded rows, map-side combined. The float leg
    keeps the caller's column type — pass a DECIMAL for an
    order-independent exact sum (double addition is order-dependent
    across partitions).

    Returns (path, depth, sum_int, sum_float)."""
    parts = F.split(F.col(path), delim)
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.concat_ws(delim, F.slice(parts, F.lit(1), i)),
    )
    return (
        df.select(
            F.explode(prefixes).alias("path"),
            F.col(int_col).cast("long").alias("_ai"),
            F.col(float_col).alias("_af"),
        )
        .groupBy("path")
        .agg(
            F.sum("_ai").alias("sum_int"),
            F.sum("_af").alias("sum_float"),
        )
        .withColumn(
            "depth", F.size(F.split(F.col("path"), delim)).cast("long")
        )
    )


def long_value_counts(
    df: DataFrame, value_col: str, top: int | None = None
) -> DataFrame:
    """LongValueFacetCounts: facet counts over the raw long values of
    a numeric docvalues field / LongValuesSource — no taxonomy, no
    string indexing (lucene/facet/.../LongValueFacetCounts.java —
    per-value counts via a hash map, getTopChildren by count desc then
    value asc). One hash-agg; the optional top-k cut is a
    TakeOrdered.

    Returns (value, cnt) ordered by (cnt desc, value asc)."""
    out = (
        df.select(F.col(value_col).cast("long").alias("value"))
        .filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("value"))
    )
    return out.limit(top) if top else out


def drill_down(
    df: DataFrame, prefix: str, path: str = "path", delim: str = "/"
) -> DataFrame:
    """DrillDownQuery(prefix) + getTopChildren: rows under ``prefix``,
    counted by the next path component.

    Returns (child, cnt)."""
    depth = len(prefix.split(delim))
    parts = F.split(F.col(path), delim)
    return (
        df.filter(F.col(path).startswith(prefix + delim))
        .select(F.element_at(parts, depth + 1).alias("child"))
        .groupBy("child")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def pivot_facets(
    df: DataFrame,
    fields,
    mincount: int = 1,
    limit: int | None = None,
    delim: str = "/",
) -> DataFrame:
    """Solr ``facet.pivot=f1,f2,...`` — the N-level value tree of
    counts (reference solr/core/.../handler/component/
    PivotFacetProcessor.java:53: per f1 value, its count plus the
    pivot of the remaining fields within it, recursively).

    Distributed shape: the whole tree in ONE shuffle via
    ``df.rollup(*fields)`` — every prefix grouping set is a partial
    aggregation of the same map-side combine, where Solr's processor
    recurses a per-value DocSet intersection (fine on one node, a
    per-value job at 10^12 rows). ``grouping_id`` keeps only the
    suffix-aggregated sets (the rollup prefixes), so NULL field values
    in the data cannot masquerade as aggregation levels.

    ``mincount`` drops nodes below the threshold (facet.mincount);
    ``limit`` keeps the top-``limit`` children per parent by
    (cnt desc, value asc) — facet.limit's default sort — via one
    window, applied level by level so a dropped parent drops its
    subtree (children of pruned parents can't appear in pivot output).

    → (level BIGINT 1-based, path '<v1>/<v2>/...', cnt BIGINT), one
    row per tree node."""
    from pyspark.sql import Window

    fields = list(fields)
    n = len(fields)
    if n < 1:
        raise ValueError("pivot_facets needs >= 1 field")
    agg = df.rollup(*fields).agg(
        F.count("*").alias("cnt"), F.grouping_id().alias("gid")
    )
    # suffix-aggregated grouping ids: level l (1..n) <-> gid = 2^(n-l)-1
    gid_of = {l: (1 << (n - l)) - 1 for l in range(1, n + 1)}
    agg = agg.filter(F.col("gid").isin(list(gid_of.values())))
    level = F.lit(None).cast("long")
    path = F.lit(None).cast("string")
    for l in range(1, n + 1):
        hit = F.col("gid") == gid_of[l]
        level = F.when(hit, F.lit(l).cast("long")).otherwise(level)
        path = F.when(hit, F.concat_ws(delim, *fields[:l])).otherwise(path)
    out = agg.select(
        level.alias("level"), path.alias("path"),
        F.element_at(F.split(path, delim), -1).alias("value"),
        F.col("cnt").cast("long").alias("cnt"),
    )
    if mincount:
        out = out.filter(F.col("cnt") >= mincount)
    if limit is not None:
        parent = F.when(
            F.col("level") > 1,
            F.expr("substring(path, 1, length(path) - length(value) - 1)"),
        ).otherwise(F.lit(""))
        w = Window.partitionBy("level", parent).orderBy(
            F.desc("cnt"), F.asc("value")
        )
        out = (
            out.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= limit)
            .drop("_rk")
        )
        # subtree pruning: a node survives only if its exact parent did
        # (a level-l path has l components, so prefix-matching a
        # surviving level-(l-1) path + delim IS the exact-parent test);
        # n-1 tiny broadcast semi-joins
        for l in range(2, n + 1):
            parents = out.filter(F.col("level") == l - 1).select(
                F.col("path").alias("_pp")
            )
            lvl_rows = out.filter(F.col("level") == l).join(
                F.broadcast(parents),
                F.col("path").startswith(F.concat("_pp", F.lit(delim))),
                "leftsemi",
            )
            out = out.filter(F.col("level") != l).unionByName(lvl_rows)
    return out.select("level", "path", "cnt")


def relatedness_col(
    fg_count: Column, fg_size: Column, bg_count: Column, bg_size: Column
) -> Column:
    """RelatednessAgg.computeRelatedness (solr/core/.../search/facet/
    RelatednessAgg.java:computeRelatedness): the "semantic knowledge
    graph" z-score of a bucket's foreground popularity against its
    background probability, squashed through the fixed 5-sigmoid blend
    and truncated to 5 digits (roundTo5Digits = floor(x*1e5+0.5)/1e5).
    Pure Column arithmetic — identical IEEE ops on any engine."""
    bg_prob = bg_count / bg_size
    num = fg_count - fg_size * bg_prob
    raw_denom = F.sqrt(fg_size * bg_prob * (F.lit(1.0) - bg_prob))
    denom = F.when(raw_denom == 0.0, F.lit(1e-10)).otherwise(raw_denom)
    z = num / denom

    def sig(off: float, scale: float) -> Column:
        return (z + off) / (scale + F.abs(z + off))

    raw = F.lit(0.2) * (
        sig(-80, 50) + sig(-30, 30) + sig(0, 30) + sig(30, 30) + sig(80, 50)
    )
    return F.floor(raw * 1e5 + F.lit(0.5)) / 1e5


def round5(x: Column) -> Column:
    """RelatednessAgg.roundTo5Digits (Math.round(v*1e5)/1e5)."""
    return F.floor(x * 1e5 + F.lit(0.5)) / 1e5
