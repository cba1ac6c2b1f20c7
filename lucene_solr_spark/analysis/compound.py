"""Compound-word decompounding — the reference ``analysis/compound``
package re-expressed for Spark token pipelines.

* ``dictionary_decompound`` — DictionaryCompoundWordTokenFilter
  (lucene/analysis/common/src/java/org/apache/lucene/analysis/compound/
  DictionaryCompoundWordTokenFilter.java:82 ``decompose``): every
  dictionary subword of length [minSubwordSize, maxSubwordSize] found
  at any offset of a token >= minWordSize is emitted after the
  original token (posInc 0 in the reference); ``onlyLongestMatch``
  keeps only the longest match per start offset.
* ``hyphenation_decompound`` — HyphenationCompoundWordTokenFilter
  (HyphenationCompoundWordTokenFilter.java:143 ``decompose``): parts
  between Liang hyphenation points, optionally dictionary-checked with
  the genitive-``s`` one-shorter fallback.
* ``parse_hyphenation_patterns`` / ``hyphenate`` — the TeX pattern
  engine (compound/hyphenation/{HyphenationTree,PatternParser}.java):
  patterns like ``he2n`` carry len+1 interletter digits; matching every
  pattern against every position of ``.word.`` max-combines the
  digits, and odd totals mark break points, clipped by
  remain/pushCharCount (=1,1 in the filter).

Semantics pinned by the reference JUnit vectors
(TestCompoundWordTokenFilter.java) in tests/test_compound.py; the
Danish pattern table used by those vectors is frozen as data in
fixtures_data/hyphenation_da.json (scripts/make_compound_fixture.py —
same provenance class as snowball_tables.json). The Spark surface is
the Arrow-batched ``compound_udf`` dispatcher; the driver gate
replays the frozen vocabulary fixture (fts_decompound member of
fts_analysis_suite).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import ArrayType, StringType

__all__ = [
    "parse_hyphenation_xml", "load_hyphenation_fixture", "hyphenate",
    "dictionary_decompound", "hyphenation_decompound",
    "COMPOUND_CASES", "compound_udf",
]

DEFAULT_MIN_WORD_SIZE = 5
DEFAULT_MIN_SUBWORD_SIZE = 2
DEFAULT_MAX_SUBWORD_SIZE = 15

_FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures_data")


def _simple_lower(ch: str) -> str:
    """Character.toLowerCase(cp) — single-codepoint mapping only
    (CharArraySet ignoreCase uses Character.toLowerCase per char)."""
    if ch == "İ":
        return "i"
    low = ch.lower()
    return low if len(low) == 1 else ch


def _fold(word: str) -> str:
    return "".join(_simple_lower(c) for c in word)


# ------------------------------------------------ TeX hyphenation engine

def parse_hyphenation_xml(text: str) -> Dict[str, object]:
    """Parse a TeX hyphenation-pattern XML (the FOP/OFFO format the
    reference loads via PatternParser.java) into a plain dict:
    ``classes`` char->normalized char, ``patterns`` chars->interletter
    digit string (len+1 values), ``exceptions`` word->break offsets.

    Token splitting mirrors PatternParser.readToken (whitespace) and
    getPattern/getInterletterValues (PatternParser.java:168-201).
    """
    classes: Dict[str, str] = {}
    patterns: Dict[str, str] = {}
    exceptions: Dict[str, List[int]] = {}
    hyphen_char = "-"

    m = re.search(r"<hyphen-char\s+value=\"(.)\"", text)
    if m:
        hyphen_char = m.group(1)

    def _inner(tag: str) -> str:
        mm = re.search(r"<%s>(.*?)</%s>" % (tag, tag), text, re.S)
        return mm.group(1) if mm else ""

    for tok in _inner("classes").split():
        if tok:
            norm = tok[0]
            for ch in tok:
                classes[ch] = norm

    for tok in _inner("patterns").split():
        chars = "".join(c for c in tok if not c.isdigit())
        vals = []
        padded = tok + "a"  # sentinel (PatternParser.java:190)
        i = 0
        while i < len(padded):
            c = padded[i]
            if c.isdigit():
                vals.append(c)
                i += 2
            else:
                vals.append("0")
                i += 1
        patterns[chars] = "".join(vals)

    exc = _inner("exceptions")
    if exc.strip():
        # exceptions are words with hyphenChar at break points; the
        # reference also supports <hyphen .../> elements — the test
        # files ship none, so only the simple form is parsed here.
        for tok in re.sub(r"<[^>]+>", " ", exc).split():
            parts = tok.split(hyphen_char)
            word = "".join(parts)
            offs, j = [], 0
            for p in parts[:-1]:
                j += len(p)
                offs.append(j)
            exceptions[word] = offs
    return {"classes": classes, "patterns": patterns,
            "exceptions": exceptions}


def load_hyphenation_fixture(name: str = "hyphenation_da") -> Dict[str, object]:
    """Load a frozen pattern table from fixtures_data/<name>.json."""
    with open(os.path.join(_FIXTURE_DIR, name + ".json"),
              encoding="utf-8") as f:
        return json.load(f)


def hyphenate(word: str, pats: Dict[str, object],
              remain: int = 1, push: int = 1) -> Optional[List[int]]:
    """HyphenationTree.hyphenate(w,0,len,remain,push)
    (HyphenationTree.java:295): returns [0, breaks..., len] over the
    letter-part of ``word``, or None if unbreakable / contains an
    interior non-letter."""
    classes = pats["classes"]
    n = len(word)
    ignore_at_beginning = 0
    end_of_letters = False
    letters: List[str] = []
    for i in range(1, n + 1):
        ch = word[i - 1]
        nc = classes.get(ch)
        if nc is None:
            if i == 1 + ignore_at_beginning:
                ignore_at_beginning += 1
            else:
                end_of_letters = True
        else:
            if end_of_letters:
                return None
            letters.append(nc)
    ln = len(letters)
    if ln < remain + push:
        return None

    result: List[int] = []
    sw = "".join(letters)
    exc = pats["exceptions"].get(sw)
    if exc is not None:
        for j in exc:
            if j >= remain and j < ln - push:
                result.append(j + ignore_at_beginning)
    else:
        padded = "." + sw + "."
        il = [0] * (ln + 3)
        patterns = pats["patterns"]
        maxlen = pats.get("maxlen")
        if maxlen is None:
            maxlen = pats["maxlen"] = _max_pattern_len(pats)
        for i in range(ln + 1):
            # all patterns that are prefixes of padded[i:]
            for plen in range(1, min(maxlen, len(padded) - i) + 1):
                vals = patterns.get(padded[i:i + plen])
                if vals is None:
                    continue
                for k, v in enumerate(vals):
                    iv = ord(v) - 48
                    if i + k < len(il) and iv > il[i + k]:
                        il[i + k] = iv
        for i in range(ln):
            if (il[i + 1] & 1) == 1 and remain <= i <= ln - push:
                result.append(i + ignore_at_beginning)
    if not result:
        return None
    return [0] + result + [ln]


def _max_pattern_len(pats: Dict[str, object]) -> int:
    return max((len(k) for k in pats["patterns"]), default=0)


# --------------------------------------------------------- decompounders

def dictionary_decompound(
        tokens: Sequence[str], dictionary: Sequence[str],
        min_word_size: int = DEFAULT_MIN_WORD_SIZE,
        min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
        max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
        only_longest_match: bool = False) -> List[str]:
    """DictionaryCompoundWordTokenFilter.decompose: emit each original
    token, then (for tokens >= minWordSize) every dictionary subword
    per start offset, longest-only when requested. Dictionary matching
    is ignoreCase (the reference tests build CharArraySet(..., true))."""
    dset = {_fold(w) for w in dictionary}
    out: List[str] = []
    for t in tokens:
        out.append(t)
        ln = len(t)
        if ln < min_word_size:
            continue
        folded = _fold(t)
        for i in range(0, ln - min_subword_size + 1):
            longest = None
            for j in range(min_subword_size, max_subword_size + 1):
                if i + j > ln:
                    break
                if folded[i:i + j] in dset:
                    if only_longest_match:
                        if longest is None or len(longest) < j:
                            longest = t[i:i + j]
                    else:
                        out.append(t[i:i + j])
            if only_longest_match and longest is not None:
                out.append(longest)
    return out


def hyphenation_decompound(
        tokens: Sequence[str], pats: Dict[str, object],
        dictionary: Optional[Sequence[str]] = None,
        min_word_size: int = DEFAULT_MIN_WORD_SIZE,
        min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
        max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
        only_longest_match: bool = False) -> List[str]:
    """HyphenationCompoundWordTokenFilter.decompose: parts spanning
    1..k consecutive hyphenation intervals, length-clipped; when a
    dictionary is given, a part must be in it — else retry one char
    shorter (genitive-s fallback, HyphenationCompoundWordTokenFilter
    .java:186)."""
    dset = None if dictionary is None else {_fold(w) for w in dictionary}
    out: List[str] = []
    for t in tokens:
        out.append(t)
        if len(t) < min_word_size:
            continue
        hyp = hyphenate(t, pats, 1, 1)
        if hyp is None:
            continue
        folded = _fold(t)
        for i in range(len(hyp)):
            start = hyp[i]
            longest = None
            for j in range(1, len(hyp) - i):
                part_len = hyp[i + j] - start
                if part_len > max_subword_size:
                    break
                if part_len < min_subword_size:
                    continue
                if dset is None or folded[start:start + part_len] in dset:
                    cand = t[start:start + part_len]
                elif folded[start:start + part_len - 1] in dset:
                    cand = t[start:start + part_len - 1]
                else:
                    continue
                if only_longest_match:
                    if longest is None or len(longest) < len(cand):
                        longest = cand
                else:
                    out.append(cand)
            if only_longest_match and longest is not None:
                out.append(longest)
    return out


# --------------------------------------------------- Spark gate surface

# Named decompound configurations replayed by the driver gate — each a
# (callable tokens->tokens) closure over frozen inputs. The Danish
# pattern table is lazy-loaded once per executor.
_DA_PATS: List[Optional[Dict[str, object]]] = [None]

_SE_DICT = ("Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
            "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare",
            "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad")
_SE_DICT_LM = _SE_DICT[:12] + ("Fiols", "Makare", "Gesäll", "Sko",
                               "Vind", "Rute", "Torkare", "Blad",
                               "Fiolsfodral")
_DA_DICT = ("læse", "hest", "basketball", "basket", "ball", "kurv")


def _da_pats() -> Dict[str, object]:
    if _DA_PATS[0] is None:
        _DA_PATS[0] = load_hyphenation_fixture("hyphenation_da")
    return _DA_PATS[0]


COMPOUND_CASES = {
    "dict_se": lambda ts: dictionary_decompound(ts, _SE_DICT),
    "dict_se_longest": lambda ts: dictionary_decompound(
        ts, _SE_DICT_LM, only_longest_match=True),
    "hyph_da_dict": lambda ts: hyphenation_decompound(
        ts, _da_pats(), _DA_DICT),
    "hyph_da_longest": lambda ts: hyphenation_decompound(
        ts, _da_pats(), _DA_DICT, max_subword_size=40,
        only_longest_match=True),
    "hyph_da_2_4": lambda ts: hyphenation_decompound(
        ts, _da_pats(), None, min_subword_size=2, max_subword_size=4),
    "hyph_da_4_10": lambda ts: hyphenation_decompound(
        ts, _da_pats(), None, min_subword_size=4, max_subword_size=10),
}


@F.pandas_udf(ArrayType(StringType()))
def _compound_pd(names: pd.Series, tokens: pd.Series) -> pd.Series:
    return pd.Series([
        None if ts is None else COMPOUND_CASES[n](list(ts))
        for n, ts in zip(names, tokens)
    ])


def compound_udf(name_col, tokens_col) -> Column:
    """Arrow-batched dispatcher: apply COMPOUND_CASES[name] per row."""
    return _compound_pd(name_col, tokens_col)
