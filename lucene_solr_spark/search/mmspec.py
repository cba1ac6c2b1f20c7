"""Solr minimum-should-match spec parser.

The dismax/edismax ``mm`` parameter accepts a rich spec language —
absolute counts, negative counts, percentages, and conditional
``N<spec`` clauses — that Solr resolves to an integer
minimumNumberShouldMatch given the query's optional-clause count.
Reference: solr/core/src/java/org/apache/solr/util/
SolrPluginUtils.java (calculateMinShouldMatch / setMinShouldMatch);
spec grammar documented in solr/solr-ref-guide (the dismax mm param).

Semantics replicated exactly:

- ``"3"``      → 3 clauses required.
- ``"-2"``     → all but 2 required (optionalClauseCount - 2).
- ``"75%"``    → int(0.75 * optionalClauseCount) required (truncation).
- ``"-25%"``   → all but int(0.25 * optionalClauseCount).
- ``"2<-25%"`` → if optionalClauseCount <= 2 all are required,
                 otherwise -25% applies.
- multiple conditionals evaluate left to right; the LAST clause whose
  upper bound is below the clause count wins (Solr iterates and keeps
  re-assigning), e.g. ``"2<-25% 9<-3"``.
- the result is clamped to [0, optionalClauseCount].
"""

from __future__ import annotations

__all__ = ["calculate_min_should_match"]


def _simple(n_optional: int, spec: str) -> int:
    spec = spec.strip()
    if spec.endswith("%"):
        percent = int(spec[:-1])
        calc = (n_optional * percent) / 100.0
        result = n_optional + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = n_optional + calc if calc < 0 else calc
    return result


def calculate_min_should_match(n_optional: int, spec: str) -> int:
    """Resolve an mm spec to the effective minimumNumberShouldMatch for
    a query with ``n_optional`` optional (SHOULD) clauses."""
    import re

    result = n_optional
    # Solr strips spaces around '<' BEFORE collapsing whitespace
    # (SolrPluginUtils spaceAroundLessThanPattern
    # "(\\s+<\\s*)|(\\s*<\\s+)" → "<"), so "2 < -25%" is one clause
    spec = re.sub(r"(\s+<\s*)|(\s*<\s+)", "<", spec)
    spec = re.sub(r"\s+", " ", spec.strip())
    if "<" in spec:
        # conditional spec(s): "upperBound<innerSpec", space-separated.
        # Solr iterates left to right, re-assigning on every clause whose
        # bound is exceeded, and returns the RUNNING result the moment a
        # bound covers the clause count (SolrPluginUtils.java
        # calculateMinShouldMatch's early return) — so "2<-25% 9<-3"
        # with 5 clauses yields the -25% result, not 5.
        for s in spec.split(" "):
            if not s:
                continue
            upper_s, _, inner = s.partition("<")
            upper = int(upper_s.strip())
            if n_optional <= upper:
                return result
            result = max(0, min(n_optional, _simple(n_optional, inner)))
        return result
    return max(0, min(n_optional, _simple(n_optional, spec)))
