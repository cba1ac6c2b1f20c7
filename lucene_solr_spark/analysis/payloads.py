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
