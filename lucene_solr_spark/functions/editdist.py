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


def jaro_winkler_py(s1: str, s2: str) -> float:
    """JaroWinklerDistance.getDistance (suggest/.../spell/
    JaroWinklerDistance.java): Jaro similarity over the half-max-length
    match window, transpositions halved, plus the Winkler common-prefix
    bonus (≤4 chars, scaling min(0.1, 1/maxLen)) applied only above the
    0.7 threshold.  DuckDB's jaro_winkler_similarity computes the
    identical value (verified on the reference's own test pairs), which
    is what makes the cross-engine gate possible."""
    if len(s1) > len(s2):
        mx, mn = s1, s2
    else:
        mx, mn = s2, s1
    rng = max(len(mx) // 2 - 1, 0)
    match_flags = [False] * len(mx)
    ms1 = []
    for mi, c1 in enumerate(mn):
        for xi in range(max(mi - rng, 0), min(mi + rng + 1, len(mx))):
            if not match_flags[xi] and c1 == mx[xi]:
                match_flags[xi] = True
                ms1.append(c1)
                break
    ms2 = [mx[i] for i in range(len(mx)) if match_flags[i]]
    m = len(ms1)
    if m == 0:
        return 0.0
    t = sum(1 for a, b in zip(ms1, ms2) if a != b) // 2
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b:
            break
        prefix += 1
    j = (m / len(s1) + m / len(s2) + (m - t) / m) / 3.0
    if j < 0.7:
        return j
    return j + min(0.1, 1.0 / max(len(s1), len(s2))) * min(prefix, 4) * (
        1.0 - j
    )


def jaro_winkler(col: Column, query: str) -> Column:
    """Column of Jaro-Winkler similarities vs ``query`` (Arrow-batched;
    dictionary-scale inputs only, like damerau_levenshtein)."""

    @pandas_udf("double")
    def _jw(s: pd.Series) -> pd.Series:
        return s.map(lambda t: jaro_winkler_py(t or "", query))

    return _jw(col)


def ngram_distance_py(source: str, target: str, n: int = 2) -> float:
    """NGramDistance.getDistance (spell/NGramDistance.java — Kondrak
    2005 n-gram edit distance): a Levenshtein DP where substitution
    cost is the per-position mismatch fraction of the aligned n-grams,
    with zero-prefix padding whose matches are discounted from the
    denominator; the short-string branch scores positional equality.
    Float32 accumulation replicated (the DP arrays are float[])."""
    sl, tl = len(source), len(target)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        cost = sum(
            1 for a, b in zip(source, target) if a == b
        )
        return float(np.float32(cost) / np.float32(max(sl, tl)))
    sa = ["\0"] * (n - 1) + list(source)
    p = [np.float32(i) for i in range(sl + 1)]
    d = [np.float32(0)] * (sl + 1)
    for j in range(1, tl + 1):
        if j < n:
            t_j = ["\0"] * (n - j) + list(target[:j])
        else:
            t_j = list(target[j - n : j])
        d[0] = np.float32(j)
        for i in range(1, sl + 1):
            cost = 0
            tn = n
            for ni in range(n):
                if sa[i - 1 + ni] != t_j[ni]:
                    cost += 1
                elif sa[i - 1 + ni] == "\0":
                    tn -= 1
            ec = np.float32(np.float32(cost) / np.float32(tn))
            d[i] = np.float32(
                min(min(d[i - 1] + np.float32(1), p[i] + np.float32(1)),
                    np.float32(p[i - 1] + ec))
            )
        p, d = d, p
    return float(np.float32(1.0) - np.float32(p[sl] / np.float32(max(tl, sl))))


def ngram_distance(col: Column, query: str, n: int = 2) -> Column:
    """Column of n-gram distances vs ``query`` (Arrow-batched;
    dictionary-scale inputs only)."""

    @pandas_udf("double")
    def _nd(s: pd.Series) -> pd.Series:
        return s.map(lambda t: ngram_distance_py(t or "", query, n))

    return _nd(col)
