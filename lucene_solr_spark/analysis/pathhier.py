"""Path-hierarchy tokenizers — the reference ``analysis/path``
package re-expressed for Spark token pipelines.

* ``path_hierarchy_tokens`` — PathHierarchyTokenizer
  (lucene/analysis/common/src/java/org/apache/lucene/analysis/path/
  PathHierarchyTokenizer.java:108 ``incrementToken``): cumulative
  path prefixes cut at each delimiter (the delimiter opens the next
  prefix; a trailing delimiter yields one final token), the first
  ``skip`` delimiter-bounded segments dropped, delimiters rewritten
  to ``replacement``.
* ``reverse_path_hierarchy_tokens`` — ReversePathHierarchyTokenizer
  (path/ReversePathHierarchyTokenizer.java:116): cumulative SUFFIXES
  — for every delimiter position the token runs from there to the
  end minus the last ``skip`` segments.

Both are pure string→list functions; semantics pinned by every
reference JUnit vector (Test{,Reverse}PathHierarchyTokenizer.java)
in tests/test_pathhier.py. The Spark surface is the shared
Arrow-batched dispatcher in the ``fts_tokenizers2`` gate — useful at
100 TB for URL/path faceting (a narrow map, no shuffle).
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import ArrayType, StringType

__all__ = ["path_hierarchy_tokens", "reverse_path_hierarchy_tokens",
           "path_hierarchy_udf", "reverse_path_hierarchy_udf"]


def path_hierarchy_tokens(path: str, delimiter: str = "/",
                          replacement: Optional[str] = None,
                          skip: int = 0) -> List[str]:
    """PathHierarchyTokenizer: '/a/b/c' -> ['/a', '/a/b', '/a/b/c']."""
    if skip < 0:
        raise ValueError("skip cannot be negative")
    repl = delimiter if replacement is None else replacement
    tokens: List[str] = []
    result = ""            # resultToken
    end_delimiter = False
    skipped = 0
    pos, n = 0, len(path)

    while True:
        term = result
        added = False
        if end_delimiter:
            term += repl
            end_delimiter = False
            added = True
        while True:
            if pos >= n:
                if added and skipped > skip:
                    tokens.append(term)
                return tokens
            c = path[pos]
            pos += 1
            if not added:
                added = True
                skipped += 1
                if skipped > skip:
                    term += repl if c == delimiter else c
            else:
                if c == delimiter:
                    if skipped > skip:
                        end_delimiter = True
                        break
                    skipped += 1
                    if skipped > skip:
                        term += repl
                else:
                    if skipped > skip:
                        term += c
        tokens.append(term)
        result = term


def reverse_path_hierarchy_tokens(path: str, delimiter: str = "/",
                                  replacement: Optional[str] = None,
                                  skip: int = 0) -> List[str]:
    """ReversePathHierarchyTokenizer: '/a/b/c' ->
    ['/a/b/c', 'a/b/c', 'b/c', 'c']."""
    if skip < 0:
        raise ValueError("skip cannot be negative")
    repl = delimiter if replacement is None else replacement
    positions = [0]
    buf: List[str] = []
    for c in path:
        if c == delimiter:
            positions.append(len(buf) + 1)
            buf.append(repl)
        else:
            buf.append(c)
    if positions[-1] < len(buf):
        positions.append(len(buf))
    s = "".join(buf)
    idx = len(positions) - 1 - skip
    if idx < 0:
        return []
    end = positions[idx]
    return [s[positions[k]:end]
            for k in range(len(positions) - skip - 1)]


@F.pandas_udf(ArrayType(StringType()))
def _fwd_pd(paths: pd.Series) -> pd.Series:
    return pd.Series([
        None if p is None else path_hierarchy_tokens(p) for p in paths
    ])


@F.pandas_udf(ArrayType(StringType()))
def _rev_pd(paths: pd.Series) -> pd.Series:
    return pd.Series([
        None if p is None else reverse_path_hierarchy_tokens(p)
        for p in paths
    ])


def path_hierarchy_udf(path_col) -> Column:
    """Arrow-batched PathHierarchyTokenizer over a path/URL column."""
    return _fwd_pd(path_col)


def reverse_path_hierarchy_udf(path_col) -> Column:
    """Arrow-batched ReversePathHierarchyTokenizer."""
    return _rev_pd(path_col)
