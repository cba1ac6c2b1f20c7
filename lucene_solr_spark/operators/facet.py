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

__all__ = ["path_col", "taxonomy_counts", "drill_down"]


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
