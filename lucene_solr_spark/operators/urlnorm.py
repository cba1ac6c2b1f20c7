"""URL canonicalization + URL-level dedup for web-scale corpus curation.

Training-data pipelines dedup crawls by canonical URL before any
content-level pass (the cheap first stage ahead of MinHash/SimHash in
`operators/dedup.py`).  There is no single canonicalization standard;
the ruleset here is pinned (RFC 3986 §6 syntax-based normalization plus
the common crawl-pipeline extras) and implemented as pure Column
expressions so the DuckDB oracle can mirror it value-for-value:

1. trim, strip fragment (``#…``);
2. scheme lowercased (missing scheme → ``http``);
3. host lowercased, leading ``www.`` dropped, default port stripped
   (``:80`` for http, ``:443`` for https);
4. path: duplicate slashes collapsed, trailing slash dropped;
5. query: parameters split on ``&``, tracking params removed
   (``utm_*``, ``fbclid``, ``gclid``), remainder sorted and rejoined;
   empty query dropped.

Declared simplifications: no percent-encoding normalization, no
dot-segment (``/../``) resolution, and ``registered_domain`` takes the
last two host labels (no public-suffix list).

Everything is JVM-side Catalyst expression work; ``url_dedup`` shuffles
only (canonical-url, id) pairs with a map-side-combined min — the same
scale shape as exact content dedup (`dedup.py` h60 pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAMS",
    "url_canonicalize",
    "url_host",
    "registered_domain",
    "url_dedup",
]

TRACKING_PARAMS = ("utm_", "fbclid", "gclid")


def _hostport(rest: Column) -> Column:
    return F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))


def url_canonicalize(url: Column) -> Column:
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    host = _hostport(rest)
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(
        (scheme == "http"), F.regexp_replace(host, r":80$", "")
    ).otherwise(host)
    host = F.when(
        (scheme == "https"), F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.startswith("fbclid=")
            & ~p.startswith("gclid="),
        )
    )
    qnorm = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )


def url_host(url: Column) -> Column:
    """Canonical host (lowercased, www-stripped, port kept off)."""
    c = url_canonicalize(url)
    return F.regexp_extract(c, r"^[a-z][a-z0-9+.\-]*://([^/?:]*)", 1)


def registered_domain(url: Column) -> Column:
    """Last two host labels — the no-PSL approximation."""
    h = url_host(url)
    return F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on canonical URL: representative = min id per group.
    Returns (id, canonical_url, rep_id, group_size, is_dup)."""
    canon = df.select(
        F.col(id_col).alias("doc_id"),
        url_canonicalize(F.col(url_col)).alias("canonical_url"),
    )
    groups = canon.groupBy("canonical_url").agg(
        F.min("doc_id").alias("rep_id"),
        F.count("*").cast("long").alias("group_size"),
    )
    return (
        canon.join(groups, "canonical_url")
        .select(
            "doc_id",
            "canonical_url",
            "rep_id",
            "group_size",
            (F.col("doc_id") != F.col("rep_id")).cast("int").alias("is_dup"),
        )
    )
