"""Damerau-Levenshtein edit distance (FuzzyQuery's default metric).

Lucene's FuzzyQuery counts an adjacent transposition as ONE edit
(transpositions=true by default — reference search/FuzzyQuery.java:
68-88, util/automaton/LevenshteinAutomata.java builds the
transposition-aware automaton), so ``jions`` → ``joins`` is distance 1,
not the classic-Levenshtein 2. Spark has no builtin for it; since
fuzzy expansion only ever runs over the TERM DICTIONARY (thousands of
rows, never the corpus), an Arrow-batched pandas UDF is the right
tool here — the per-batch numpy DP is restricted-DL (optimal string
alignment), the same family the automaton accepts at maxEdits ≤ 2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dl_distance_py(a: str, b: str) -> int:
    """Restricted Damerau-Levenshtein (optimal string alignment)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return max(la, lb)
    d = np.zeros((la + 1, lb + 1), dtype=np.int32)
    d[:, 0] = np.arange(la + 1)
    d[0, :] = np.arange(lb + 1)
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i, j] = min(
                d[i - 1, j] + 1, d[i, j - 1] + 1, d[i - 1, j - 1] + cost
            )
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d[i, j] = min(d[i, j], d[i - 2, j - 2] + 1)
    return int(d[la, lb])


def damerau_levenshtein(col: Column, query: str) -> Column:
    """Column of restricted-DL distances from ``query`` (Arrow-batched;
    dictionary-scale inputs only — never put this on a corpus scan)."""

    @pandas_udf("int")
    def _dl(s: pd.Series) -> pd.Series:
        return s.fillna("").map(lambda t: dl_distance_py(t, query))

    return _dl(col)


__all__ = ["damerau_levenshtein", "dl_distance_py"]
