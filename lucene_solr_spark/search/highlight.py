"""Highlighter: best-fragment extraction + term markup.

Re-expresses the reference highlighter module as pure JVM Column
expressions (no UDFs, whole-stage-codegen friendly):

- ``Highlighter.getBestFragment`` — pick the text window containing the
  first query-term match (reference
  lucene/highlighter/src/java/org/apache/lucene/search/highlight/Highlighter.java:60-96).
- ``SimpleFragmenter`` — fixed-size character fragments (reference
  .../highlight/SimpleFragmenter.java:25-30, default 100 chars).
- ``SimpleHTMLFormatter`` — wrap matched terms in ``<em>…</em>``
  (reference .../highlight/SimpleHTMLFormatter.java:24-32).

At 100 TB this stays a narrow per-row projection over the stored-fields
scan — no shuffle, no Python; Catalyst prunes to (id, text) columns.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def first_match_pos(text_col: Column, terms: Sequence[str]) -> Column:
    """1-based char offset of the earliest query-term occurrence in
    lower(text); 0 when none match (mirrors TokenGroup start offsets)."""
    lt = F.lower(text_col)
    positions = [F.instr(lt, t.lower()) for t in terms]
    # min over positive positions: map 0 (absent) to +inf via when()
    big = F.lit(2147483647)
    guarded = [F.when(p > 0, p).otherwise(big) for p in positions]
    pos = guarded[0] if len(guarded) == 1 else F.least(*guarded)
    return F.when(pos == big, F.lit(0)).otherwise(pos)


def best_fragment(
    text_col: Column,
    terms: Sequence[str],
    frag_size: int = 100,
    lead: int = 30,
    pre: str = "<em>",
    post: str = "</em>",
) -> Column:
    """Lowercased ``frag_size``-char window starting ``lead`` chars
    before the first match, with every query term wrapped pre/post.
    NULL when no term matches (caller filters, like getBestFragment
    returning null)."""
    pos = first_match_pos(text_col, terms)
    start = F.greatest(F.lit(1), pos - F.lit(lead))
    frag = F.lower(text_col.substr(start, F.lit(frag_size)))
    pattern = "(" + "|".join(re.escape(t.lower()) for t in terms) + ")"
    # pre/post land in a Java regex REPLACEMENT string — quote \ and $
    # (Matcher.quoteReplacement) so markup like "$x" or "\em" survives
    def _quote_repl(s: str) -> str:
        return s.replace("\\", "\\\\").replace("$", "\\$")

    marked = F.regexp_replace(
        frag, pattern, _quote_repl(pre) + "$1" + _quote_repl(post)
    )
    return F.when(pos > 0, marked)


def highlight(
    df: DataFrame,
    text_col: str,
    terms: Sequence[str],
    frag_size: int = 100,
    lead: int = 30,
) -> DataFrame:
    """Append (first_pos, fragment) columns and keep only matching rows."""
    return (
        df.withColumn("first_pos", first_match_pos(F.col(text_col), terms))
        .withColumn(
            "fragment", best_fragment(F.col(text_col), terms, frag_size, lead)
        )
        .filter(F.col("first_pos") > 0)
    )
