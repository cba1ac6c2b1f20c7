"""Solr atomic updates — field-modifier merge against stored documents.

The reference merges partial documents carrying modifier maps
({"set": v, "inc": n, "add": v, "add-distinct": v, "remove": v}) into
the stored document (reference solr/core/src/java/org/apache/solr/
update/processor/AtomicUpdateDocumentMerger.java:117-220; doc syntax in
the ref guide's updating-parts-of-documents). Re-expressed as one
conditional-aggregation pivot of the update stream plus a single left
join — the MERGE INTO shape; every modifier is a Column expression, no
UDFs.

Update stream schema: (key, field, op, value) — op in {set, inc, add,
add_distinct, remove}, value as string (cast to the base column's type
at apply time). Multiple modifiers may target the same document;
fields are independent, later duplicate (field, op) rows for one doc
collapse via max() (the reference applies the last writer — with one
update batch per doc this is identity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_atomic_updates"]

_OPS = ("set", "inc", "add", "add_distinct", "remove")


def apply_atomic_updates(
    base: DataFrame, updates: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """→ base with the modifier stream applied. Array ops (add /
    add_distinct / remove) require the target column to be an array;
    inc requires a numeric column; set works on any atomic type."""
    fields = {f.name: f.dataType for f in base.schema.fields}
    pairs = sorted(
        {
            (r["field"], r["op"])
            for r in updates.select("field", "op").distinct().collect()
        }
    )
    for fld, op in pairs:
        if fld not in fields:
            raise ValueError(f"atomic update on unknown field {fld!r}")
        if op not in _OPS:
            raise ValueError(f"unknown atomic op {op!r}")
    agg_cols = [
        F.max(
            F.when(
                (F.col("field") == fld) & (F.col("op") == op),
                F.col("value"),
            )
        ).alias(f"__{op}__{fld}")
        for fld, op in pairs
    ]
    upd = updates.groupBy(F.col(key)).agg(*agg_cols)
    out = base.join(F.broadcast(upd), key, "left")
    for fld, op in pairs:
        c = F.col(f"__{op}__{fld}")
        dt = fields[fld]
        cur = F.col(fld)
        # A modifier against a MISSING (NULL) stored value CREATES the
        # field, as the reference merger does (AtomicUpdateDocumentMerger
        # "if field doesn't exist, add it") — inc starts from 0, array
        # ops start from []; remove-from-missing stays missing.
        if op == "set":
            expr = F.coalesce(c.cast(dt), cur)
        elif op == "inc":
            expr = F.when(
                c.isNotNull(),
                F.coalesce(cur, F.lit(0).cast(dt)) + c.cast(dt),
            ).otherwise(cur)
        else:
            elem = c.cast(dt.elementType)
            empty = F.array().cast(dt)
            if op == "add":
                applied = F.concat(F.coalesce(cur, empty), F.array(elem))
            elif op == "add_distinct":
                applied = F.array_union(
                    F.coalesce(cur, empty), F.array(elem)
                )
            else:  # remove: from a missing field it is a no-op
                applied = F.array_remove(cur, elem)
            expr = F.when(c.isNotNull(), applied).otherwise(cur)
        out = out.withColumn(fld, expr)
    return out.select(*fields.keys())
