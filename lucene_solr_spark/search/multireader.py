"""MultiReader — N per-shard indexes searched as ONE logical index.

Lucene composes leaf readers into a MultiReader with per-leaf docBase
offsets; every search statistic (docFreq, docCount, sumTotalTermFreq)
is the SUM over leaves, so scores over the composite are identical to
scores over a single index of the union (reference lucene/core/src/
java/org/apache/lucene/index/MultiReader.java, BaseCompositeReader
.java:31-58 — "starts" docBase array; IndexSearcher computes
collection statistics from the composite). This is also Solr's
distributed-search contract when global IDF is enabled
(ExactStatsCache: stats aggregated across shards before scoring).

Spark-first: each shard's tables are plain DataFrames, so the
composite is a UNION with a docBase offset column — the dictionary
re-aggregates (sum df/cf per term) and the scalar stats add. The
result is a regular IndexTables: every searcher in the engine works
on it unchanged, and the parity invariant (shard-composite ==
single-index-of-the-union) is gate-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..index.builder import IndexTables

__all__ = ["multi_reader"]


def multi_reader(shards) -> IndexTables:
    """Compose per-shard IndexTables into one logical index.

    Doc ids are offset by each shard's docBase = Σ max_doc of prior
    shards (BaseCompositeReader starts[]); max_doc per shard is taken
    as max(doc_id)+1 of its norms table when not set explicitly."""
    if not shards:
        raise ValueError("multi_reader needs at least one shard")
    bases = []
    base = 0
    for sh in shards:
        bases.append(base)
        try:
            mx = sh.max_doc
        except AttributeError:
            mx = None
        if mx is None:
            mx = sh.norms.agg(F.max("doc_id")).collect()[0][0]
            mx = int(mx) + 1 if mx is not None else 0
        base += int(mx)

    def offset(df, b):
        return df.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(int(b))).cast("long")
        )

    postings = None
    norms = None
    docmap = None
    stored = None
    for sh, b in zip(shards, bases):
        p = offset(sh.postings, b)
        n = offset(sh.norms, b)
        d = offset(sh.docmap, b)
        s = offset(sh.stored, b)
        postings = p if postings is None else postings.unionByName(p)
        norms = n if norms is None else norms.unionByName(n)
        docmap = d if docmap is None else docmap.unionByName(d)
        stored = s if stored is None else stored.unionByName(s)

    dictionary = None
    for sh in shards:
        d = sh.dictionary.select("term", "df", "cf")
        dictionary = d if dictionary is None else dictionary.unionByName(d)
    dictionary = dictionary.groupBy("term").agg(
        F.sum("df").alias("df"), F.sum("cf").alias("cf")
    )

    out = IndexTables(
        postings=postings,
        dictionary=dictionary,
        norms=norms,
        docmap=docmap,
        stored=stored,
        doc_count=sum(sh.doc_count for sh in shards),
        sum_total_term_freq=sum(sh.sum_total_term_freq for sh in shards),
    )
    out.set_max_doc(base)
    return out
