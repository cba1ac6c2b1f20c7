"""SmartChineseAnalyzer HHMM word segmentation — smartcn rebuild.

Reference: lucene/analysis/smartcn/.../hhmm/HHMMSegmenter.java (lattice
construction over the shipped coredict), BiSegGraph.java (bigram edge
weights + Viterbi shortest path), SegTokenFilter.java / WordSegmenter.java
(full-width folding, latin lowercasing, punctuation normalization to ','),
Utility.java getCharType (char classes incl. surrogate handling), and
hhmm/WordDictionary.java (prefix-extension dictionary walk).

Parity contract (verified word-for-word against the reference's own
implementation compiled as a JVM test oracle — scripts/
make_smartcn_fixture.py):

- The lattice walk, token order, smoothing weights, and strict-less-than
  Viterbi tie-break replicate the reference exactly. All offsets are
  UTF-16 code-unit offsets, as in Java.
- The reference source tree ships ``coredict.mem`` but NOT
  ``bigramdict.mem``/``.dct`` (lucene/analysis/smartcn/src/resources —
  the word-pair table is absent), so every
  ``BigramDictionary.getFrequency`` lookup against the shipped data
  returns 0 and the edge weight reduces to a function of the left
  token's unigram frequency. The JVM oracle runs the reference's own
  loader over exactly that data state; this module freezes the oracle's
  ``Math.log`` outputs per distinct frequency
  (fixtures_data/smartcn_weights.parquet) so the Viterbi comparisons
  are bit-identical to Java. A deployment holding the word-pair table
  can pass ``bigram_freq`` to restore the full bigram term.

Scale design: the dictionary (85.6k words, ~1.5 MB) ships inside the
package and is loaded lazily once per executor process — no broadcast,
no shuffle. Segmentation runs as an Arrow-batched pandas UDF
(never per-row Python registered into the JVM pipeline).
"""

from __future__ import annotations

import bisect
import os
import struct
from typing import Dict, List, Optional, Tuple

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import ArrayType, StringType

__all__ = [
    "segment_tokens", "segment_smartcn", "smartcn_tokens_udf", "ZH_PHRASES",
]

_FIX_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures_data")
_COREDICT = os.path.join(_FIX_DIR, "smartcn_coredict.parquet")
_WEIGHTS = os.path.join(_FIX_DIR, "smartcn_weights.parquet")

# CharType constants (Utility.getCharType / CharType.java)
_DELIMITER, _LETTER, _DIGIT, _HANZI, _SPACE_LIKE = 0, 1, 2, 3, 4
_FULLWIDTH_LETTER, _FULLWIDTH_DIGIT, _OTHER, _SURROGATE = 5, 6, 7, 8

# WordType constants (WordType.java)
_W_SENTENCE_BEGIN, _W_SENTENCE_END, _W_CHINESE_WORD = 0, 1, 2
_W_STRING, _W_NUMBER, _W_DELIMITER = 3, 4, 5
_W_FULLWIDTH_STRING, _W_FULLWIDTH_NUMBER = 6, 7

# Utility.java sentinel char arrays + constants
_STRING_CHARS = "未##串"   # 未##串
_NUMBER_CHARS = "未##数"   # 未##数
_START_CHARS = "始##始"    # 始##始
_END_CHARS = "末##末"      # 末##末
_MAX_FREQUENCE = 2079997 + 80000

_dict_cache: Optional[Tuple[Dict[str, List[str]], Dict[str, int],
                            Dict[int, float]]] = None


def _load_dict():
    """Lazy per-process load of the frozen coredict + weight tables."""
    global _dict_cache
    if _dict_cache is None:
        import pyarrow.parquet as pq

        core = pq.read_table(_COREDICT).to_pydict()
        suffixes: Dict[str, List[str]] = {}
        freq: Dict[str, int] = {}
        for head, suffix, f in zip(core["head"], core["suffix"],
                                   core["freq"]):
            suffixes.setdefault(head, []).append(suffix)
            freq[head + suffix] = f
        # rank order in the fixture is the reference's compareArray sort
        # order, which equals Python's lexicographic order on BMP text
        # (asserted at fixture build); bisect relies on it.
        wtab = pq.read_table(_WEIGHTS).to_pydict()
        weights = dict(zip(wtab["freq"], wtab["weight"]))
        _dict_cache = (suffixes, freq, weights)
    return _dict_cache


def _units(s: str) -> List[int]:
    """UTF-16 code units of s (Java char semantics; surrogates kept)."""
    b = s.encode("utf-16-le", "surrogatepass")
    return list(struct.unpack("<%dH" % (len(b) // 2), b))


def _from_units(units: List[int]) -> str:
    return struct.pack("<%dH" % len(units), *units).decode(
        "utf-16-le", "surrogatepass")


def _char_type(u: int) -> int:
    """Utility.getCharType(char) over a UTF-16 code unit."""
    if 0xD800 <= u <= 0xDFFF:
        return _SURROGATE
    if 0x4E00 <= u <= 0x9FA5:
        return _HANZI
    if 0x41 <= u <= 0x5A or 0x61 <= u <= 0x7A:
        return _LETTER
    if 0x30 <= u <= 0x39:
        return _DIGIT
    if u in (0x20, 0x09, 0x0D, 0x0A, 0x3000):
        return _SPACE_LIKE
    if 0x21 <= u <= 0xBB or 0x2010 <= u <= 0x2642 or 0x3001 <= u <= 0x301E:
        return _DELIMITER
    if 0xFF21 <= u <= 0xFF3A or 0xFF41 <= u <= 0xFF5A:
        return _FULLWIDTH_LETTER
    if 0xFF10 <= u <= 0xFF19:
        return _FULLWIDTH_DIGIT
    if 0xFE30 <= u <= 0xFF63:
        return _DELIMITER
    return _OTHER


def _prefix_exists(items: List[str], p: str) -> bool:
    """True iff some dictionary suffix under this head has prefix p —
    the WordDictionary.getPrefixMatch != -1 outcome (the reference's
    knownStart-bounded binary search finds the same first index because
    extensions of a matched prefix sort at or after it)."""
    i = bisect.bisect_left(items, p)
    return i < len(items) and items[i].startswith(p)


def _create_seg_graph(units: List[int], suffixes, freq):
    """HHMMSegmenter.createSegGraph: the token lattice, in the exact
    insertion order the reference produces (start-offset map + append)."""
    length = len(units)
    ctypes = [_char_type(u) for u in units]
    starts: Dict[int, List[list]] = {}
    order: List[int] = []   # starts in first-insertion order not needed;
    max_start = -1

    def add_token(text: str, s: int, e: int, wtype: int, f: int) -> None:
        nonlocal max_start
        starts.setdefault(s, []).append([text, s, e, wtype, f, -1])
        if s > max_start:
            max_start = s

    i = 0
    while i < length:
        ct = ctypes[i]
        if ct == _SPACE_LIKE:
            i += 1
        elif ct == _SURROGATE:
            # Character.codePointAt: high+low pair consumes 2 units
            n = 2 if (0xD800 <= units[i] <= 0xDBFF and i + 1 < length
                      and 0xDC00 <= units[i + 1] <= 0xDFFF) else 1
            add_token(_from_units(units[i:i + n]), i, i + n,
                      _W_CHINESE_WORD, 0)
            i += n
        elif ct == _HANZI:
            j = i + 1
            ch = chr(units[i])
            word = ch
            add_token(ch, i, j, _W_CHINESE_WORD, freq.get(ch, 0))
            items = suffixes.get(ch)
            found = items is not None   # getPrefixMatch on the single char
            while j <= length and found:
                if len(word) > 1 and word in freq:
                    add_token(word, i, j, _W_CHINESE_WORD, freq[word])
                while j < length and ctypes[j] == _SPACE_LIKE:
                    j += 1
                if j < length and ctypes[j] == _HANZI:
                    word += chr(units[j])
                    found = _prefix_exists(items, word[1:])
                    j += 1
                else:
                    break
            i += 1
        elif ct in (_LETTER, _FULLWIDTH_LETTER):
            has_fw = ct == _FULLWIDTH_LETTER
            j = i + 1
            while j < length and ctypes[j] in (_LETTER, _FULLWIDTH_LETTER):
                if ctypes[j] == _FULLWIDTH_LETTER:
                    has_fw = True
                j += 1
            add_token(_STRING_CHARS, i, j,
                      _W_FULLWIDTH_STRING if has_fw else _W_STRING,
                      freq.get(_STRING_CHARS, 0))
            i = j
        elif ct in (_DIGIT, _FULLWIDTH_DIGIT):
            has_fw = ct == _FULLWIDTH_DIGIT
            j = i + 1
            while j < length and ctypes[j] in (_DIGIT, _FULLWIDTH_DIGIT):
                if ctypes[j] == _FULLWIDTH_DIGIT:
                    has_fw = True
                j += 1
            add_token(_NUMBER_CHARS, i, j,
                      _W_FULLWIDTH_NUMBER if has_fw else _W_NUMBER,
                      freq.get(_NUMBER_CHARS, 0))
            i = j
        elif ct == _DELIMITER:
            add_token(chr(units[i]), i, i + 1, _W_DELIMITER, _MAX_FREQUENCE)
            i += 1
        else:
            add_token(_STRING_CHARS, i, i + 1, _W_STRING,
                      freq.get(_STRING_CHARS, 0))
            i += 1

    add_token(_START_CHARS, -1, 0, _W_SENTENCE_BEGIN,
              freq.get(_START_CHARS, 0))
    add_token(_END_CHARS, length, length + 1, _W_SENTENCE_END,
              freq.get(_END_CHARS, 0))
    return starts, max_start


def _edge_weight(one_word_freq: int, weights: Dict[int, float],
                 word_pair_freq: int = 0) -> float:
    """BiSegGraph.generateBiSegGraph smoothing weight. With the shipped
    data word_pair_freq is always 0, and the value comes from the frozen
    Java Math.log table for bit-exactness; the formula fallback covers
    frequencies outside the table (possible only with a caller-supplied
    bigram table)."""
    if word_pair_freq == 0:
        w = weights.get(one_word_freq)
        if w is not None:
            return w
    import math
    smooth = 0.1
    tiny = 1.0 / _MAX_FREQUENCE
    return -math.log(smooth * (1.0 + one_word_freq) / (_MAX_FREQUENCE + 0.0)
                     + (1.0 - smooth)
                     * ((1.0 - tiny) * word_pair_freq / (1.0 + one_word_freq)
                        + tiny))


def _shortest_path(starts, max_start, weights,
                   bigram_freq: Optional[Dict[str, int]] = None):
    """BiSegGraph: index tokens by start order, generate pair edges in
    reference order, then the strict-< Viterbi of getShortPath."""
    # SegGraph.makeIndex
    tokens: List[list] = []
    s = -1
    remaining = len(starts)
    while remaining:
        lst = starts.get(s)
        if lst is not None:
            for t in lst:
                t[5] = len(tokens)
                tokens.append(t)
            remaining -= 1
        s += 1

    edges: Dict[int, List[Tuple[int, float]]] = {}
    key = -1
    while key < max_start:
        lst = starts.get(key)
        if lst is not None:
            stop = False
            for t1 in lst:
                nxt = t1[2]
                next_tokens = None
                while nxt <= max_start:
                    next_tokens = starts.get(nxt)
                    if next_tokens is not None:
                        break
                    next_tokens = None
                    nxt += 1
                if next_tokens is None:
                    stop = True
                    break
                for t2 in next_tokens:
                    if bigram_freq:
                        wpf = bigram_freq.get(t1[0] + "@" + t2[0], 0)
                    else:
                        wpf = 0
                    w = _edge_weight(t1[4], weights, wpf)
                    edges.setdefault(t2[5], []).append((t1[5], w))
            if stop:
                pass
        key += 1

    node_count = len(edges)
    path_w = [0.0]
    path_pre = [0]
    for current in range(1, node_count + 1):
        min_w = float("inf")
        min_from = None
        for frm, w in edges[current]:
            cand = path_w[frm] + w
            if cand < min_w:
                min_w = cand
                min_from = frm
        path_w.append(min_w)
        path_pre.append(min_from)

    current = len(path_w) - 1
    rpath = [current]
    while current != 0:
        current = path_pre[current]
        rpath.append(current)
    return [tokens[i] for i in reversed(rpath)]


def segment_tokens(sentence: str,
                   bigram_freq: Optional[Dict[str, int]] = None
                   ) -> List[Tuple[int, int, int, str]]:
    """WordSegmenter.segmentSentence(sentence, 0): the Viterbi-best
    segmentation with SENTENCE_BEGIN/END stripped, offsets converted and
    tokens normalized by SegTokenFilter. Returns (startOffset,
    endOffset, wordType, text) with UTF-16 code-unit offsets."""
    suffixes, freq, weights = _load_dict()
    units = _units(sentence)
    starts, max_start = _create_seg_graph(units, suffixes, freq)
    path = _shortest_path(starts, max_start, weights, bigram_freq)
    if len(path) <= 2:
        return []
    out = []
    for text, s, e, wtype, _f, _i in path[1:-1]:
        # WordSegmenter.convertSegToken: raw substring for latin/number
        if wtype in (_W_STRING, _W_NUMBER, _W_FULLWIDTH_STRING,
                     _W_FULLWIDTH_NUMBER):
            toks = units[s:e]
        else:
            toks = _units(text)
        # SegTokenFilter.filter
        if wtype in (_W_FULLWIDTH_NUMBER, _W_FULLWIDTH_STRING):
            folded = []
            for u in toks:
                if u >= 0xFF10:
                    u -= 0xFEE0
                if 0x41 <= u <= 0x5A:
                    u += 0x20
                folded.append(u)
            toks = folded
        elif wtype == _W_STRING:
            toks = [u + 0x20 if 0x41 <= u <= 0x5A else u for u in toks]
        elif wtype == _W_DELIMITER:
            toks = [0x2C]  # Utility.COMMON_DELIMITER = ','
        out.append((s, e, wtype, _from_units(toks)))
    return out


def segment_smartcn(sentence: str) -> List[str]:
    """Token texts of the best segmentation (the HMMChineseTokenizer
    term stream before stop/stem filters)."""
    return [t[3] for t in segment_tokens(sentence)]


@F.pandas_udf(ArrayType(StringType()))
def _smartcn_tokens_pd(texts: pd.Series) -> pd.Series:
    return texts.map(lambda s: segment_smartcn(s) if s is not None else None)


def smartcn_tokens_udf(col) -> Column:
    """Arrow-batched segmentation of a text column into smartcn tokens."""
    return _smartcn_tokens_pd(col)


# Pinned phrases for the driver gate (doc_id-derived assignment, same
# pattern as analysis/cjk.py CJK_PHRASES): JUnit sentences from the
# reference test suite + mixed-script stress phrases.
ZH_PHRASES = [
    "我购买了道具和服装。",
    "我购买了道具和服装。 我购买了道具和服装。",
    "我购买 Tests 了道具和服装",
    "中华人民共和国成立于1949年",
    "北京大学的计算机科学与技术系",
    "数据处理ＡＢＣ１２３引擎",
    "搜索引擎的倒排索引结构",
    "自然语言处理模型训练数据",
    "今天天气很好, 我们去公园散步吧!",
    "上海证券交易所今日指数上涨 3.5%",
]
