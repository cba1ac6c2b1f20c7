"""StandardAnalyzer-subset tokenization, pure Python + regex.

Re-implements the analysis chain the engine pins (SURVEY.md §2.6):
StandardTokenizer (UAX#29-subset word breaks) → LowerCaseFilter, with an
EMPTY default stopword set — reference:
lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:36-85,
StandardTokenizer.java:40-77 (token types, maxTokenLength=255: longer
tokens are SKIPPED, not truncated).

Semantics covered (the documented subset this engine pins as its contract;
golden fixtures and both scorer paths share this exact function):

- ALPHANUM runs: letters/digits/underscore (UAX#29 ExtendNumLet keeps
  ``foo_bar`` as one token); ``camelCase`` is one token.
- MidNum/MidLetter: ``3.14`` and ``can't`` stay single tokens (the
  separator must be flanked by alphanumerics); ``hyphen-ated`` splits.
- IDEOGRAPHIC (Han) and HIRAGANA emit one token per char; KATAKANA and
  HANGUL emit runs — mirroring StandardTokenizer's type rules.
- EMOJI codepoints are tokens.
- Tokens longer than ``max_token_length`` (255) are dropped.

This is a deliberately pinned subset, not full UAX#29 (no ICU available);
both the index build and the oracle use it, so parity is by construction.
"""

from __future__ import annotations

import re
from typing import List

__all__ = [
    "tokenize",
    "token_count",
    "tokenize_with_positions",
    "MAX_TOKEN_LENGTH",
    "JVM_TOKEN_PATTERN",
]

MAX_TOKEN_LENGTH = 255

_HAN = "一-鿿㐀-䶿豈-﫿"
_HIRA = "぀-ゟ"
_KATA = "゠-ヿ"
_HANGUL = "가-힯"
_EMOJI = "\U0001f000-\U0001faff☀-➿←-⇿⬀-⯿"
_CJK = _HAN + _HIRA + _KATA + _HANGUL

# A "word" char: any \w (unicode letters/digits/underscore) that is not CJK.
_W = rf"(?:(?![{_CJK}])\w)"
# Mid-token joiners, valid only between word chars: . , ' ’ :
_MID = rf"(?:[.,'’:](?={_W}))"

_TOKEN_RE = re.compile(
    rf"[{_HAN}]"          # Han: one token per character
    rf"|[{_HIRA}]"        # Hiragana: one token per character
    rf"|[{_KATA}]+"       # Katakana: runs
    rf"|[{_HANGUL}]+"     # Hangul: runs
    rf"|[{_EMOJI}]"       # emoji codepoints
    rf"|{_W}(?:{_W}|{_MID})*",
    re.UNICODE,
)


# The same pattern compiled by the JVM (java.util.regex): (?U) turns on
# UNICODE_CHARACTER_CLASS so \w matches like Python's re.UNICODE. The
# lookahead/char-class constructs used here are syntax-identical in both
# engines; tests/test_tokenizer.py asserts token-for-token parity between
# this Python reference implementation and the Spark-side
# regexp_extract_all over the full fixture corpus (incl. CJK/emoji/
# İ-lowercasing edges). The JVM path is what production uses — it runs
# inside whole-stage codegen with zero Python; this module stays the
# executable spec + oracle.
JVM_TOKEN_PATTERN = "(?U)" + _TOKEN_RE.pattern


def tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> List[str]:
    """text → lowercased token list (order preserved, duplicates kept)."""
    if not text:
        return []
    return [
        m.group(0).lower()
        for m in _TOKEN_RE.finditer(text)
        if len(m.group(0)) <= max_token_length
    ]


def tokenize_with_positions(
    text: str, max_token_length: int = MAX_TOKEN_LENGTH
) -> List[tuple]:
    """text → [(token, position)] — over-long tokens are skipped but still
    consume a position (StandardTokenizer preserves position increments)."""
    out = []
    pos = 0
    if not text:
        return out
    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        if len(tok) <= max_token_length:
            out.append((tok.lower(), pos))
        pos += 1
    return out


def token_count(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> int:
    """Document length for norms: number of emitted tokens.

    Our chain produces no 0-position-increment tokens (empty stopword set,
    no synonyms), so length == emitted token count
    (DefaultIndexingChain.java:821-851; BM25Similarity.java:120-121).
    """
    if not text:
        return 0
    return sum(
        1 for m in _TOKEN_RE.finditer(text) if len(m.group(0)) <= max_token_length
    )
