"""Porter stemmer — the PorterStemFilter analog.

Faithful implementation of the public Porter (1980) algorithm, "An
algorithm for suffix stripping", as used by the reference's
analysis/common PorterStemFilter (reference lucene/analysis/common/src/
java/org/apache/lucene/analysis/en/PorterStemFilter.java wrapping
PorterStemmer.java, itself the paper's reference implementation).

Engine integration: `porter_stem_filter` maps the stemmer over token
arrays via a vectorized pandas UDF (Arrow batches — no per-row Python
round trips); the scoring-parity analyzer stays the pinned
StandardAnalyzer subset, stemming is an opt-in chain stage like the
other filters (analysis/filters.py).
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in c*(VC){m}v*."""
    m, i, n = 0, 0, len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2
        and w[-1] == w[-2]
        and _is_cons(w, len(w) - 1)
    )


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _replace(w: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If w ends suffix and m(stem) > min_m-ish rule, apply; else None."""
    if not w.endswith(suffix):
        return None
    stem = w[: len(w) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return w  # suffix matched but condition failed: stop searching


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2 (m > 0) — includes the author's two documented DEPARTURES
    # from the 1980 paper, matching the official implementation that the
    # reference's PorterStemmer.java ports: "abli"->"able" is replaced
    # by "bli"->"ble", and "logi"->"log" is added.
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("bli", "ble"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"), ("logi", "log"),
    ):
        r = _replace(w, suf, rep, 0)
        if r is not None:
            w = r
            break

    # step 3 (m > 0)
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        r = _replace(w, suf, rep, 0)
        if r is not None:
            w = r
            break

    # step 4 (m > 1)
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
        "ize",
    ):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _ends_double_cons(w) and w[-1] == "l" and _measure(w) > 1:
        w = w[:-1]
    return w


def porter_stem_filter(tokens_col):
    """Column[array<string>] → stemmed array, Arrow-vectorized
    (PorterStemFilter chain-stage analog)."""
    from pyspark.sql import functions as F

    def _stem(arrs):
        return arrs.map(
            lambda toks: [porter_stem(t) for t in toks]
            if toks is not None
            else None
        )

    return F.pandas_udf(_stem, "array<string>")(tokens_col)


def stem_with_overrides(tokens_col, overrides=None, keywords=()):
    """PorterStemFilter preceded by KeywordMarkerFilter +
    StemmerOverrideFilter (reference lucene/analysis/common/.../
    miscellaneous/KeywordMarkerFilter.java, StemmerOverrideFilter.java:
    both set KeywordAttribute so the downstream stemmer skips the
    token): ``keywords`` pass through unstemmed, ``overrides`` map
    straight to their dictated stem, everything else Porter-stems.
    Arrow-vectorized like porter_stem_filter."""
    from pyspark.sql import functions as F

    ov = dict(overrides or {})
    kw = frozenset(keywords)

    def _stem(arrs):
        return arrs.map(
            lambda toks: [
                t if t in kw else ov.get(t, porter_stem(t)) for t in toks
            ]
            if toks is not None
            else None
        )

    return F.pandas_udf(_stem, "array<string>")(tokens_col)
