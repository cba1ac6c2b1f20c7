"""Morfologik dictionary lemmatization — FSA5 custom dictionaries.

Reference: lucene/analysis/morfologik/.../MorfologikFilter.java wraps
the morfologik-stemming library's DictionaryLookup: the token's surface
form (then its lowercase) is matched against an FSA automaton holding
``inflected<SEP>encoded-lemma<SEP>tag`` byte sequences; hits emit the
decoded lemmas (position increment 0 after the first), misses keep the
original token (MorfologikFilter.incrementToken:125-142).

This module re-implements the published FSA version-5 binary format
(magic ``\\fsa``, goto-length header; arcs = label byte + flags/address
field with FINAL/LAST/TARGET-NEXT bits, address = field >> 3) and the
morfologik stem encoders (NONE / TrimSuffix / TrimPrefixAndSuffix /
TrimInfixAndSuffix — '+A'-biased byte counts over UTF-8), verified
against the reference's shipped ``custom-dictionary.dict`` and the
TestMorfologikFilterFactory JUnit vector.

Declared scope: the module's DEFAULT Polish dictionary lives inside the
external morfologik-stemming artifact and is not present in the
reference source tree, so the Polish-specific JUnit vectors cannot be
replayed here; Polish stemming is covered by the Stempel rebuild
(analysis/stempel.py). Custom user dictionaries — the
MorfologikFilterFactory ``dictionary`` attribute surface — are fully
supported and verified.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Tuple

__all__ = ["FSA5", "MorfologikDictionary", "morfologik_filter_tokens"]

_BIT_FINAL = 1
_BIT_LAST = 2
_BIT_NEXT = 4


class FSA5:
    """Reader for the morfologik FSA v5 byte-serialized automaton."""

    def __init__(self, data: bytes):
        if data[:4] != b"\\fsa":
            raise ValueError("not an FSA automaton (bad magic)")
        if data[4] != 5:
            raise ValueError(f"unsupported FSA version {data[4]} (only 5)")
        self.filler = data[5]
        self.annotation = data[6]
        hgtl = data[7]
        self.node_data_len = (hgtl >> 4) & 0x0F
        self.gtl = hgtl & 0x0F
        self.arcs = data[8:]

    # ---- arc primitives (FSA5.java) ---------------------------------
    def _first_arc(self, node: int) -> int:
        return self.node_data_len + node

    def _flags(self, arc: int) -> int:
        return self.arcs[arc + 1]

    def _skip_arc(self, arc: int) -> int:
        return arc + (2 if self._flags(arc) & _BIT_NEXT else 1 + self.gtl)

    def _next_arc(self, arc: int) -> int:
        return 0 if self._flags(arc) & _BIT_LAST else self._skip_arc(arc)

    def _dest(self, arc: int) -> int:
        if self._flags(arc) & _BIT_NEXT:
            return self._skip_arc(arc)
        r = 0
        for i in range(self.gtl - 1, 0, -1):
            r = (r << 8) | self.arcs[arc + 1 + i]
        r = (r << 8) | self.arcs[arc + 1]
        return r >> 3

    def root(self) -> int:
        eps = self._skip_arc(self._first_arc(0))
        return self._dest(self._first_arc(eps))

    # ---- traversal ---------------------------------------------------
    def _find_arc(self, node: int, label: int) -> int:
        arc = self._first_arc(node)
        while arc != 0:
            if self.arcs[arc] == label:
                return arc
            arc = self._next_arc(arc)
        return 0

    def completions(self, prefix: bytes) -> Iterator[bytes]:
        """All byte suffixes s such that prefix + s is in the language."""
        node = self.root()
        arc = 0
        for b in prefix:
            arc = self._find_arc(node, b)
            if arc == 0:
                return
            if self._dest(arc) == 0:
                return  # terminal arc: no continuations
            node = self._dest(arc)

        stack: List[Tuple[int, bytes]] = [(node, b"")]
        while stack:
            node, acc = stack.pop()
            arc = self._first_arc(node)
            arcs_here = []
            while arc != 0:
                arcs_here.append(arc)
                arc = self._next_arc(arc)
            for arc in reversed(arcs_here):
                label = self.arcs[arc]
                flags = self._flags(arc)
                seq = acc + bytes([label])
                if flags & _BIT_FINAL:
                    yield seq
                dest = self._dest(arc)
                if dest != 0:
                    stack.append((dest, seq))


def _decode_stem(encoder: str, word: bytes, encoded: bytes) -> bytes:
    """morfologik stem decoders ('A'-biased byte counts)."""
    enc = encoder.upper()
    if enc == "NONE":
        return encoded
    if enc == "SUFFIX":
        k = encoded[0] - ord("A")
        return word[: len(word) - k] + encoded[1:]
    if enc == "PREFIX":
        p = encoded[0] - ord("A")
        k = encoded[1] - ord("A")
        return word[p: len(word) - k] + encoded[2:]
    if enc == "INFIX":
        pos = encoded[0] - ord("A")
        ilen = encoded[1] - ord("A")
        k = encoded[2] - ord("A")
        return (word[:pos] + word[pos + ilen: len(word) - k]
                + encoded[3:])
    raise ValueError(f"unknown fsa.dict.encoder {encoder!r}")


class MorfologikDictionary:
    """A compiled morfologik stemming dictionary (.dict + .info)."""

    def __init__(self, fsa: FSA5, separator: str, encoding: str,
                 encoder: str):
        self.fsa = fsa
        self.separator = separator.encode(encoding)
        self.encoding = encoding
        self.encoder = encoder

    @classmethod
    def load(cls, dict_path: str, info_path: str | None = None
             ) -> "MorfologikDictionary":
        if info_path is None:
            info_path = os.path.splitext(dict_path)[0] + ".info"
        meta: Dict[str, str] = {}
        with open(info_path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#") and "=" in line:
                    k, v = line.split("=", 1)
                    meta[k.strip()] = v.strip()
        with open(dict_path, "rb") as f:
            fsa = FSA5(f.read())
        return cls(fsa, meta.get("fsa.dict.separator", "+"),
                   meta.get("fsa.dict.encoding", "UTF-8"),
                   meta.get("fsa.dict.encoder", "SUFFIX"))

    def lookup(self, word: str) -> List[Tuple[str, str]]:
        """DictionaryLookup.lookup: (stem, tag) rows for a surface form."""
        wb = word.encode(self.encoding)
        out = []
        for tail in self.fsa.completions(wb + self.separator):
            enc, _, tag = tail.partition(self.separator)
            stem = _decode_stem(self.encoder, wb, enc)
            out.append((stem.decode(self.encoding),
                        tag.decode(self.encoding)))
        return out


def morfologik_filter_tokens(tokens: List[str],
                             dictionary: MorfologikDictionary) -> List[str]:
    """MorfologikFilter semantics: emit the lemma list when the surface
    form (or its lowercase) is in the dictionary, else keep the token."""
    out = []
    for tok in tokens:
        lemmas = dictionary.lookup(tok)
        if not lemmas:
            lemmas = dictionary.lookup(tok.lower())
        if lemmas:
            out.extend(stem for stem, _tag in lemmas)
        else:
            out.append(tok)
    return out
