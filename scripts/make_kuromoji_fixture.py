#!/usr/bin/env python
"""Extract the kuromoji Japanese lexicon from the reference's shipped
FST (TokenInfoDictionary$fst.dat) plus the character-class table
(CharacterDefinition.dat), freezing both as fixtures.

The reference tree ships the FST of SURFACE FORMS and the
connection-cost matrix but NOT TokenInfoDictionary$buffer.dat (per-word
costs and left/right context ids), so an exact Viterbi rebuild is
impossible from this source — what CAN be recovered exactly is the full
dictionary surface lexicon, which upgrades ja segmentation from a
tiny pinned word list to the real ~370k-entry vocabulary under a
declared cost model (analysis/kuromoji_lattice.py).

FST format: lucene/core/src/java/org/apache/lucene/util/fst/FST.java at
the reference revision (VERSION 6): CodecUtil header ("FST", 6), an
optional empty-string output blob, input type byte (BYTE2 = UTF-16 code
units for kuromoji), vlong startNode, vlong numBytes, then the arc blob
which is read BACKWARD (ReverseBytesReader — positions decrease).
Arc encodings: packed linear-scan nodes and fixed-array nodes
(ARCS_AS_FIXED_ARRAY header byte = 32), flag bits
FINAL/LAST/TARGET_NEXT/STOP_NODE/HAS_OUTPUT/HAS_FINAL_OUTPUT, outputs =
PositiveIntOutputs vlongs (FST.java:72-86,493-505,794-952).

CharacterDefinition.dat: CodecUtil header ("kuromoji_cd", 1), 0x10000
class bytes, then 12 (invoke, group, length) byte triples per class
(CharacterDefinitionWriter.java / CharacterDefinition.java).
"""

import gzip
import os
import struct
import sys

REF = "/root/reference/lucene/analysis/kuromoji/src/resources/org/apache/lucene/analysis/ja/dict"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lucene_solr_spark",
    "fixtures_data",
)

BIT_FINAL_ARC = 1
BIT_LAST_ARC = 2
BIT_TARGET_NEXT = 4
BIT_STOP_NODE = 8
BIT_ARC_HAS_OUTPUT = 16
BIT_ARC_HAS_FINAL_OUTPUT = 32
ARCS_AS_FIXED_ARRAY = BIT_ARC_HAS_FINAL_OUTPUT


class Fwd:
    """Forward big-endian DataInput (header region)."""

    def __init__(self, b):
        self.b = b
        self.p = 0

    def byte(self):
        v = self.b[self.p]
        self.p += 1
        return v

    def int4(self):
        v = struct.unpack_from(">i", self.b, self.p)[0]
        self.p += 4
        return v

    def vint(self):
        v = shift = 0
        while True:
            x = self.byte()
            v |= (x & 0x7F) << shift
            if not x & 0x80:
                return v
            shift += 7

    def string(self):
        n = self.vint()
        s = self.b[self.p : self.p + n].decode("utf-8")
        self.p += n
        return s


class Rev:
    """ReverseBytesReader over the arc blob: every read DECREMENTS the
    position; multi-byte values see bytes in reversed storage order."""

    __slots__ = ("b", "p")

    def __init__(self, b):
        self.b = b
        self.p = 0

    def byte(self):
        v = self.b[self.p]
        self.p -= 1
        return v

    def vlong(self):
        v = shift = 0
        while True:
            x = self.byte()
            v |= (x & 0x7F) << shift
            if not x & 0x80:
                return v
            shift += 7

    vint = vlong

    def short(self):
        return ((self.byte() & 0xFF) << 8) | (self.byte() & 0xFF)

    def skip(self, n):
        self.p -= n


def read_fst(path):
    raw = open(path, "rb").read()
    h = Fwd(raw)
    magic = h.int4()
    assert magic == 0x3FD76C17, hex(magic)
    name = h.string()
    assert name == "FST", name
    version = h.int4()
    assert version == 6, version
    if h.byte() == 1:
        n = h.vint()
        h.p += n  # empty-string output blob (kuromoji: not used)
    t = h.byte()
    assert t == 1, f"expected BYTE2 input type, got {t}"

    # vlongs in the forward header
    def fvlong():
        v = shift = 0
        while True:
            x = h.byte()
            v |= (x & 0x7F) << shift
            if not x & 0x80:
                return v
            shift += 7

    start_node = fvlong()
    num_bytes = fvlong()
    blob = raw[h.p : h.p + num_bytes]
    assert len(blob) == num_bytes
    return blob, start_node


def walk_lexicon(blob, start_node):
    """DFS over the FST enumerating every accepted UTF-16 string."""
    r = Rev(blob)
    out = []
    path = []

    def read_arc_at(state):
        """state: dict with keys mirroring FST.Arc; reads the next real
        arc in place (readNextRealArc)."""
        if state["bytes_per_arc"]:
            state["arc_idx"] += 1
            r.p = state["pos_arcs_start"]
            r.skip(state["arc_idx"] * state["bytes_per_arc"])
        else:
            r.p = state["next_arc"]
        flags = r.byte()
        label = r.short()
        output = r.vlong() if flags & BIT_ARC_HAS_OUTPUT else 0
        final_out = (
            r.vlong() if flags & BIT_ARC_HAS_FINAL_OUTPUT else 0
        )
        if flags & BIT_STOP_NODE:
            target = -1
            state["next_arc"] = r.p
        elif flags & BIT_TARGET_NEXT:
            state["next_arc"] = r.p
            if not flags & BIT_LAST_ARC:
                if state["bytes_per_arc"] == 0:
                    seek_to_next_node()
                else:
                    r.p = state["pos_arcs_start"]
                    r.skip(
                        state["bytes_per_arc"] * state["num_arcs"]
                    )
            target = r.p
        else:
            target = r.vlong()
            state["next_arc"] = r.p
        state.update(
            flags=flags, label=label, output=output,
            final_out=final_out, target=target,
        )

    def seek_to_next_node():
        while True:
            flags = r.byte()
            r.short()  # label
            if flags & BIT_ARC_HAS_OUTPUT:
                r.vlong()
            if flags & BIT_ARC_HAS_FINAL_OUTPUT:
                r.vlong()
            if not flags & BIT_STOP_NODE and not flags & BIT_TARGET_NEXT:
                r.vlong()
            if flags & BIT_LAST_ARC:
                return

    def first_arc_state(node):
        r.p = node
        state = {
            "bytes_per_arc": 0, "num_arcs": 0, "arc_idx": -1,
            "pos_arcs_start": 0, "next_arc": node,
        }
        if r.byte() == ARCS_AS_FIXED_ARRAY:
            state["num_arcs"] = r.vint()
            state["bytes_per_arc"] = r.vint()
            state["pos_arcs_start"] = r.p
        else:
            state["next_arc"] = node
        read_arc_at(state)
        return state

    def dfs(node):
        state = first_arc_state(node)
        while True:
            # snapshot for recursion (reader is shared)
            st = dict(state)
            path.append(st["label"])
            if st["flags"] & BIT_FINAL_ARC:
                out.append("".join(map(chr, path)).encode(
                    "utf-16-be", "surrogatepass"
                ).decode("utf-16-be", "surrogatepass"))
            if st["target"] > 0:
                dfs(st["target"])
            path.pop()
            if st["flags"] & BIT_LAST_ARC:
                return
            # restore shared-reader iteration state and advance
            state = st
            read_arc_at(state)

    sys.setrecursionlimit(100000)
    dfs(start_node)
    return out


def read_chardef(path):
    """CharacterDefinition.java:64-80: header, 0x10000 class-per-char
    bytes, then CLASS_COUNT=12 single flag bytes (bit0 invoke, bit1
    group).  Class enum order: NGRAM, DEFAULT, SPACE, SYMBOL, NUMERIC,
    ALPHA, CYRILLIC, GREEK, HIRAGANA, KATAKANA, KANJI, KANJINUMERIC."""
    raw = open(path, "rb").read()
    h = Fwd(raw)
    assert h.int4() == 0x3FD76C17
    name = h.string()
    version = h.int4()
    classes = raw[h.p : h.p + 0x10000]
    h.p += 0x10000
    flags = []
    for _ in range(12):
        b = h.byte()
        flags.append((b & 1, (b >> 1) & 1))
    assert h.p == len(raw), (h.p, len(raw))
    return name, version, classes, flags


def main():
    blob, start = read_fst(os.path.join(REF, "TokenInfoDictionary$fst.dat"))
    words = walk_lexicon(blob, start)
    print(f"lexicon: {len(words)} surface forms")
    for probe in ("東京", "日本語", "形態素", "解析", "学生", "図書館"):
        print(" ", probe, probe in set(words))
    words = sorted(set(words))
    out = os.path.join(OUT_DIR, "ja_lexicon.txt.gz")
    with gzip.open(out, "wt", encoding="utf-8") as f:
        for w in words:
            f.write(w + "\n")
    print("wrote", out, os.path.getsize(out), "bytes")

    name, version, classes, flags = read_chardef(
        os.path.join(REF, "CharacterDefinition.dat")
    )
    print("chardef:", name, "v", version, len(flags), "classes")
    out2 = os.path.join(OUT_DIR, "ja_chardef.bin")
    with open(out2, "wb") as f:
        f.write(bytes([len(flags)]))
        for inv, grp in flags:
            f.write(bytes([inv | (grp << 1)]))
        f.write(classes)
    print("wrote", out2, os.path.getsize(out2), "bytes")


if __name__ == "__main__":
    main()
