"""StandardQueryParser — the flexible query-parser framework analog.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/
flexible/standard/StandardQueryParser.java — the "flexible" framework
parses the SAME syntax as the classic parser (StandardSyntaxParser.jj
accepts the classic grammar incl. open ranges `[5 TO *]`, which
OpenRangeQueryNodeProcessor normalizes) and differs in its
processor-pipeline architecture plus two user-visible behaviors this
rebuild pins:

1. **Multi-field expansion** (MultiFieldQueryNodeProcessor.java):
   with `setMultiFields(fields)`, every UNFIELDED clause expands into
   a per-field group combined as BooleanQuery SHOULD — scores are
   SUMMED across fields (unlike eDisMax's per-term max+tie). Summing
   is exactly the tie=1.0 degenerate of the dismax combiner
   (max + 1.0·(sum−max) = sum), so execution reuses the shared
   multi-field scorer with tie pinned to 1.0 and unit field boosts.
2. **Default-operator conjunction** (StandardQueryConfigHandler
   .setDefaultOperator(AND)): every term must match in AT LEAST ONE
   field; with multi-field expansion that is a HAVING
   matched-term-count = |terms| over the per-term combined rows.

Grammar reuse is deliberate and declared: parse via the classic
parser (search/queryparser.py — same token syntax, escaping included);
only the multi-field execution semantics are new here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .edismax import edismax
from .queryparser import ParsedQuery, parse_query

__all__ = ["parse_standard", "standard_multifield_search"]


def parse_standard(q: str, analyzer=None) -> ParsedQuery:
    """StandardSyntaxParser accepts the classic grammar — shared
    implementation (StandardSyntaxParser.jj ↔ QueryParser.jj)."""
    return parse_query(q, analyzer)


def standard_multifield_search(
    field_tables: dict,
    q: str,
    default_operator: str = "or",
    k: int | None = 10,
    analyzer=None,
    precision: str = "double",
) -> DataFrame:
    """Parse ``q`` and run it with multi-field expansion over
    ``field_tables`` ({field: IndexTables}): each unfielded term
    becomes a SHOULD group over every field, per-(doc, term) scores
    SUM across fields, AND default-operator requires every term
    matched somewhere."""
    p = parse_standard(q, analyzer)
    terms = [t for t, _ in (p.must or p.should)]
    if p.must and default_operator == "or":
        # '+term' syntax forced conjunction regardless of operator
        default_operator = "and"
    msm = len(terms) if default_operator == "and" else None
    return edismax(
        field_tables,
        terms,
        qf={f: 1.0 for f in field_tables},
        tie=1.0,
        k=k,
        min_should_match=msm,
        precision=precision,
    )
