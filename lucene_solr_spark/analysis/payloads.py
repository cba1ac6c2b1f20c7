"""Payloads: delimited token payloads and payload-scored queries.

The reference attaches a per-position byte[] payload to postings
(index/PostingsEnum.PAYLOADS), fed from the analysis chain by
DelimitedPayloadTokenFilter ("token|1.5" → token with payload 1.5,
reference lucene/analysis/common/src/java/org/apache/lucene/analysis/
payloads/DelimitedPayloadTokenFilter.java, FloatEncoder.java) and
consumed at query time by PayloadScoreQuery with a PayloadFunction
(Sum/Max/Min/Average — lucene/queries/src/java/org/apache/lucene/
queries/payloads/PayloadScoreQuery.java, SumPayloadFunction.java…).

Spark-first layout: payloads live as a FLOAT column on the flat
positional posting relation (doc_id, term, pos, payload) — a columnar
payload stream beside the position stream, exactly how the codec
would lay it out at rest; partition/bucket by term for query
pruning like every posting table in this engine. Query-time payload
aggregation is one hash-agg over the term's postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["delimited_payload_postings", "payload_score"]


def delimited_payload_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "|",
) -> DataFrame:
    """DelimitedPayloadTokenFilter + float decoder over whitespace-split
    tokens: "boost|2.5 plain" → rows (doc_id, term='boost', pos=0,
    payload=2.5), (doc_id, 'plain', 1, 0.0). Tokens without a delimiter
    carry payload 0.0 (the reference leaves the payload attribute
    unset; pinned here as 0)."""
    import re

    d = delimiter
    d_rx = re.escape(d)  # F.split takes a regex; the delimiter is literal
    toks = F.split(F.col(text_col), r"\s+")
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "raw"),
    ).filter(F.col("raw") != "")
    before = F.substring_index(F.col("raw"), d, 1)
    # DelimitedPayloadTokenFilter splits at the FIRST delimiter and
    # encodes the entire remainder (DelimitedPayloadTokenFilter.java:
    # 58-62) — 'boost.2.5' with delimiter '.' carries payload 2.5.
    after = F.when(
        F.col("raw").contains(d),
        F.element_at(F.split(F.col("raw"), d_rx, 2), 2),
    )
    return exploded.select(
        "doc_id",
        before.alias("term"),
        F.col("pos").cast("int").alias("pos"),
        F.coalesce(after.cast("float"), F.lit(0.0)).alias("payload"),
    )


def payload_score(
    postings: DataFrame,
    term: str,
    func: str = "sum",
) -> DataFrame:
    """PayloadScoreQuery(SpanTermQuery(term), fn, includeSpanScore=
    false): per matching doc, the payload aggregate of the term's
    occurrences. func: sum | max | min | avg (SumPayloadFunction,
    MaxPayloadFunction, MinPayloadFunction, AveragePayloadFunction).

    → (doc_id, n_occ, score) ordered by (score desc, doc_id asc)."""
    aggs = {
        "sum": F.sum(F.col("payload").cast("double")),
        "max": F.max(F.col("payload").cast("double")),
        "min": F.min(F.col("payload").cast("double")),
        "avg": F.avg(F.col("payload").cast("double")),
    }
    if func not in aggs:
        raise ValueError(f"unknown payload function: {func!r}")
    return (
        postings.filter(F.col("term") == term)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_occ"),
            aggs[func].alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def span_payload_check(
    postings: DataFrame,
    terms,
    payloads,
) -> DataFrame:
    """SpanPayloadCheckQuery: count per doc the ordered ADJACENT spans
    ``terms[0] .. terms[n-1]`` whose per-position payloads equal
    ``payloads`` — a None slot matches ANY payload, exactly the
    reference's null-entry wildcard (lucene/queries/.../payloads/
    SpanPayloadCheckQuery.java:154-170 — checkPosition compares
    payloadToMatch[upto] per position, null accepts; the span iterates
    the match query's positions). The span here is the ordered
    SpanNearQuery(slop=0) of the given terms, evaluated as
    (doc_id, pos)-keyed offset equi-joins over the payload posting
    relation — term-pushed scans, no cartesian.

    → (doc_id, span_freq) ordered by doc_id."""
    if len(terms) != len(payloads):
        raise ValueError("one payload slot per span position")

    def leg(i):
        t, p = terms[i], payloads[i]
        d = postings.filter(F.col("term") == t)
        if p is not None:
            d = d.filter(F.col("payload") == float(p))
        return d.select("doc_id", (F.col("pos") - F.lit(i)).alias(f"p{i}"))

    m = leg(0).withColumnRenamed("p0", "start")
    for i in range(1, len(terms)):
        nxt = leg(i)
        m = m.join(
            nxt,
            (m["doc_id"] == nxt["doc_id"])
            & (F.col("start") == F.col(f"p{i}")),
        ).select(m["doc_id"], "start")
    return (
        m.groupBy("doc_id")
        .agg(F.count("*").alias("span_freq"))
        .orderBy("doc_id")
    )
