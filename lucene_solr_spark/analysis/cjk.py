"""Dictionary-driven CJK segmentation — kuromoji/nori analog.

Reference: lucene/analysis/kuromoji/.../JapaneseTokenizer.java and
lucene/analysis/nori/.../KoreanTokenizer.java segment Han/kana/Hangul
runs against a bundled morpheme dictionary via a Viterbi cost lattice.
This engine pins the DETERMINISTIC core of that behavior — dictionary
longest-match, left to right, per-character fallback for
out-of-vocabulary runs (the StandardTokenizer ideographic rule the
rest of the pipeline already uses) — as a declared simplification: no
cost lattice, so ambiguity resolves to the longest dictionary entry,
not the minimum-cost path. Latin/digit runs tokenize as lowercase
words, other characters separate tokens.

The segmenter is pure Python over small strings, executed as an
Arrow-batched pandas UDF (never per-row Python in the JVM pipeline);
its input→output contract is frozen as a golden fixture parquet
(scripts/make_cjk_fixture.py) that the DuckDB gate oracle joins — the
same verification pattern as the Porter stemmer.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import ArrayType, StringType

__all__ = ["CJK_DICT", "segment_cjk", "cjk_tokens_udf"]

# Pinned morpheme dictionary (ja + ko), longest entries first at match
# time. Small by design: the segmentation CONTRACT (longest match +
# per-char fallback) is what is verified; a production deployment swaps
# in mecab-ipadic/mecab-ko-dic rows without touching the algorithm.
CJK_DICT = [
    # Japanese
    "日本語", "形態素", "解析", "検索", "索引", "東京", "大学",
    "エンジン", "データ", "処理", "変換", "学習", "言語", "日本",
    # Korean
    "한국어", "검색", "색인", "엔진", "데이터", "처리", "형태소",
    "분석", "학습",
]

_MAX_LEN = max(len(w) for w in CJK_DICT)
_DICT_SET = frozenset(CJK_DICT)

_CJK_RANGES = (
    (0x2E80, 0x9FFF),    # radicals, Kangxi, CJK ideographs
    (0x3040, 0x30FF),    # hiragana + katakana (inside above span)
    (0xAC00, 0xD7AF),    # Hangul syllables
    (0x1100, 0x11FF),    # Hangul jamo
    (0xF900, 0xFAFF),    # CJK compat ideographs
    (0xFF65, 0xFF9F),    # halfwidth katakana
)

_LATIN_RUN = re.compile(r"[a-z0-9]+")


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def _is_hangul(ch: str) -> bool:
    cp = ord(ch)
    return 0xAC00 <= cp <= 0xD7AF or 0x1100 <= cp <= 0x11FF


def _segment_longest_match(run: str) -> list:
    """ko path (nori ships neither its FST nor costs): pinned-dict
    longest match with per-char fallback."""
    out = []
    i, n = 0, len(run)
    while i < n:
        matched = None
        for ln in range(min(_MAX_LEN, n - i), 1, -1):
            cand = run[i:i + ln]
            if cand in _DICT_SET:
                matched = cand
                break
        if matched:
            out.append(matched)
            i += len(matched)
        else:
            out.append(run[i])
            i += 1
    return out


def segment_cjk(text: str) -> list:
    """Tokenize mixed text: Japanese-script CJK runs by a Viterbi
    lattice over the REAL kuromoji lexicon (325,872 surface forms
    extracted from the reference's shipped FST —
    analysis/kuromoji_lattice.py; round 5, replacing greedy
    longest-match for ja), Hangul runs by pinned-dict longest match,
    Latin/digit runs as lowercase words."""
    from .kuromoji_lattice import lattice_segment

    if not text:
        return []
    out = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if _is_cjk(ch):
            j = i
            while j < n and _is_cjk(text[j]):
                j += 1
            run = text[i:j]
            if any(_is_hangul(c) for c in run):
                out.extend(_segment_longest_match(run))
            else:
                out.extend(lattice_segment(run))
            i = j
        else:
            m = _LATIN_RUN.match(text.lower(), i)
            if m:
                out.append(m.group(0))
                i = m.end()
            else:
                i += 1
    return out


@F.pandas_udf(ArrayType(StringType()))
def cjk_tokens_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: segment_cjk(t or ""))


def cjk_tokens(col: Column) -> Column:
    return cjk_tokens_udf(col)


# Pinned phrase corpus for the driver gate (deterministic per-doc
# derivation: phrase_id = doc_id % len(CJK_PHRASES)) — exercises
# longest-match, per-char fallback, Hangul, and mixed Latin+CJK.
CJK_PHRASES = [
    "日本語の形態素解析",
    "Spark検索エンジンでデータ処理",
    "한국어 형태소 분석과 검색",
    "東京大学で言語学習",
    "색인 엔진과 데이터 처리",
    "検索と索引の変換処理",
    "mixed ASCII and 東京大学 text",
    "日本の大学で日本語を学習",
]
