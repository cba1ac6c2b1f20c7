"""Japanese lattice segmentation over the REAL kuromoji lexicon.

Reference: lucene/analysis/kuromoji/src/java/org/apache/lucene/
analysis/ja/JapaneseTokenizer.java — a Viterbi lattice over dictionary
entries found at every position (TokenInfoFST prefix walks) plus
unknown words formed from CharacterDefinition classes, scored by
per-word costs + connection costs, min-cost path wins.

Data reality (verified against the reference tree): kuromoji ships the
surface-form FST (TokenInfoDictionary$fst.dat — extracted to the
325,872-entry ja_lexicon fixture by scripts/make_kuromoji_fixture.py),
the connection matrix, and CharacterDefinition.dat, but NOT
TokenInfoDictionary$buffer.dat, which holds every word's cost and
left/right context ids.  Without per-word context ids the connection
matrix cannot be applied, so exact cost parity is impossible from this
source.  DECLARED substitute cost model over the exact real lexicon:

    cost(known word of length L)   = 10 - min(L, 6)     (longer known
                                                         words cheaper)
    cost(unknown word of length L) = 25*L + 10          (unknown chars
                                                         strictly dominated
                                                         by any dictionary
                                                         cover)

minimized by dynamic programming left-to-right; ties prefer the path
with fewer segments, then the longest last word.  Unknown words follow
CharacterDefinition grouping: consecutive same-class characters merge
into ONE unknown token when the class's group flag is set (KATAKANA,
ALPHA, NUMERIC, …), else fall back per character (KANJI) —
CharacterDefinition.java:41-43,89-97 via the frozen ja_chardef.bin.

This replaces greedy longest-match for ja runs: the lattice recovers
segmentations longest-match destroys (e.g. a greedy 2-char prefix that
orphans the rest of a 3-char word), while ko keeps the longest-match
path (nori ships neither its FST nor costs).  Pure Python over small
strings inside Arrow batches — the analysis-chain execution pattern.
"""

from __future__ import annotations

import gzip
import os
from functools import lru_cache

_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures_data",
)

# CharacterDefinition class ids (enum order, CharacterDefinition.java:42)
CLASS_NAMES = (
    "NGRAM", "DEFAULT", "SPACE", "SYMBOL", "NUMERIC", "ALPHA",
    "CYRILLIC", "GREEK", "HIRAGANA", "KATAKANA", "KANJI",
    "KANJINUMERIC",
)

_MAX_WORD = 16


@lru_cache(maxsize=1)
def _lexicon():
    words = set()
    prefixes = set()
    path = os.path.join(_DATA, "ja_lexicon.txt.gz")
    with gzip.open(path, "rt", encoding="utf-8") as f:
        for line in f:
            w = line.rstrip("\n")
            if not w or len(w) > _MAX_WORD:
                continue
            words.add(w)
            for i in range(1, len(w)):
                prefixes.add(w[:i])
    return words, prefixes


@lru_cache(maxsize=1)
def _chardef():
    raw = open(os.path.join(_DATA, "ja_chardef.bin"), "rb").read()
    n = raw[0]
    flags = [(raw[1 + i] & 1, (raw[1 + i] >> 1) & 1) for i in range(n)]
    classes = raw[1 + n :]
    return classes, flags


def char_class(ch: str) -> int:
    classes, _ = _chardef()
    cp = ord(ch)
    return classes[cp] if cp < 0x10000 else 1  # DEFAULT


def _group_flag(cls: int) -> bool:
    _, flags = _chardef()
    return bool(flags[cls][1])


def lattice_segment(text: str):
    """Min-cost segmentation of a (CJK) run against the real lexicon.

    Returns the token list.  DP state per end-position: (cost,
    n_segments, -len(last_word), start, word)."""
    words, prefixes = _lexicon()
    n = len(text)
    INF = (1 << 60, 0, 0)
    best = [None] * (n + 1)
    best[0] = (0, 0, 0, -1, "")
    for i in range(n):
        if best[i] is None:
            continue
        c0, s0 = best[i][0], best[i][1]
        # dictionary words starting at i
        j = i
        cand_end = []
        while j < n and j - i < _MAX_WORD:
            frag = text[i : j + 1]
            if frag in words:
                cand_end.append(j + 1)
            if frag not in prefixes:
                break
            j += 1
        for e in cand_end:
            w = text[i:e]
            key = (c0 + 10 - min(len(w), 6), s0 + 1, -len(w))
            cur = best[e]
            if cur is None or key < (cur[0], cur[1], cur[2]):
                best[e] = (*key, i, w)
        # unknown word: group same-class chars when the class groups,
        # else a single char
        cls = char_class(text[i])
        e = i + 1
        if _group_flag(cls):
            while e < n and char_class(text[e]) == cls:
                e += 1
        w = text[i:e]
        key = (c0 + 25 * len(w) + 10, s0 + 1, -len(w))
        cur = best[e]
        if cur is None or key < (cur[0], cur[1], cur[2]):
            best[e] = (*key, i, w)
        # always allow the single-char fallback too (grouping may
        # overshoot a dictionary word boundary)
        if e != i + 1:
            w1 = text[i : i + 1]
            key1 = (c0 + 25 + 10, s0 + 1, -1)
            cur = best[i + 1]
            if cur is None or key1 < (cur[0], cur[1], cur[2]):
                best[i + 1] = (*key1, i, w1)
    # backtrack
    toks = []
    pos = n
    while pos > 0:
        _, _, _, start, w = best[pos]
        toks.append(w)
        pos = start
    toks.reverse()
    return toks
