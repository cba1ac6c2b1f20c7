"""Minimal real PDF text extraction — replaces the former honest stub
in sources/extraction.py with a working parser for the common case
(the ExtractingRequestHandler/Tika PDF branch analog,
solr/contrib/extraction).

Scope (documented): linearly scans the file for object streams,
inflates ``/FlateDecode`` streams (stdlib zlib), and walks every
content stream's BT…ET text blocks executing the text-showing
operators — ``Tj``, ``'``, ``"`` and ``TJ`` arrays — with full
literal-string escape handling (\\n \\r \\t \\b \\f \\( \\) \\\\,
octal \\ddd, line continuations) and hex strings. Line-advance
operators (``Td TD T* ' "``) after text has been emitted insert a
newline. String bytes are decoded as UTF-8 with latin-1 fallback
(real PDFs use PDFDocEncoding or font-specific CMaps — a declared
simplification; embedded-CMap subset fonts are out of scope).
Encrypted PDFs and non-Flate filters yield no text rather than
erroring.

Pure Python over bytes — dispatched per document from an Arrow
``pandas_udf`` (sources/extraction.py), a narrow map at 100 TB.
"""

from __future__ import annotations

import re
import zlib
from typing import List

__all__ = ["pdf_extract_text"]

_STREAM_RX = re.compile(rb"stream\r?\n", re.S)
_OCTAL_RX = re.compile(rb"[0-7]{1,3}")


def _streams(data: bytes) -> List[bytes]:
    """All stream payloads, Flate-inflated when needed."""
    out = []
    pos = 0
    while True:
        m = _STREAM_RX.search(data, pos)
        if not m:
            break
        start = m.end()
        # the dictionary immediately precedes 'stream'
        dict_start = data.rfind(b"<<", max(0, m.start() - 512), m.start())
        sdict = data[dict_start:m.start()] if dict_start >= 0 else b""
        # /Length gives the exact byte count (PDF 32000-1 §7.3.8.2);
        # prefer it over scanning for 'endstream' — the payload may
        # contain that literal, and a Flate payload may itself end in
        # 0x0A/0x0D, which a blind EOL-trim would corrupt.
        lm = re.search(rb"/Length\s+(\d+)(?![^/>]*R)", sdict)
        end = -1
        if lm and start + int(lm.group(1)) <= len(data):
            cand = start + int(lm.group(1))
            tail = data[cand:cand + 12]
            if tail.lstrip(b"\r\n").startswith(b"endstream"):
                end = cand
        if end < 0:
            end = data.find(b"endstream", start)
            if end < 0:
                break
            payload = data[start:end]
            if payload.endswith(b"\r\n"):
                payload = payload[:-2]
            elif payload.endswith(b"\n") or payload.endswith(b"\r"):
                payload = payload[:-1]
        else:
            payload = data[start:end]
            end = data.find(b"endstream", end)
            if end < 0:
                end = len(data)
        if b"/FlateDecode" in sdict:
            try:
                payload = zlib.decompress(payload)
            except zlib.error:
                payload = b""
        elif b"/Filter" in sdict:
            payload = b""  # unsupported filter
        out.append(payload)
        pos = end + 9
    return out


def _unescape_literal(raw: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = raw[i]
        if e in b"nrtbf":
            out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8,
                        0x66: 12}[e])
            i += 1
        elif e in b"()\\":
            out.append(e)
            i += 1
        elif e == 0x0A:           # line continuation
            i += 1
        elif e == 0x0D:
            i += 1
            if i < n and raw[i] == 0x0A:
                i += 1
        else:
            m = _OCTAL_RX.match(raw, i)
            if m:
                out.append(int(m.group(), 8) & 0xFF)
                i = m.end()
            else:
                out.append(e)      # unknown escape: char stands
                i += 1
    return bytes(out)


def _decode(b: bytes) -> str:
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _extract_block(block: bytes) -> str:
    """Execute the text-showing operators of one BT…ET block."""
    parts: List[str] = []
    pending_strings: List[bytes] = []  # operands awaiting an operator
    i, n = 0, len(block)

    def newline():
        if parts and parts[-1] != "\n":
            parts.append("\n")

    while i < n:
        c = block[i]
        if c == 0x28:  # ( literal string
            depth = 1
            j = i + 1
            buf = bytearray()
            while j < n and depth:
                ch = block[j]
                if ch == 0x5C and j + 1 < n:
                    buf += block[j:j + 2]
                    j += 2
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth == 0:
                        break
                buf.append(ch)
                j += 1
            pending_strings.append(_unescape_literal(bytes(buf)))
            i = j + 1
        elif c == 0x3C and i + 1 < n and block[i + 1] != 0x3C:
            j = block.find(b">", i)
            if j < 0:
                break
            hx = re.sub(rb"\s", b"", block[i + 1:j])
            if len(hx) % 2:
                hx += b"0"
            try:
                pending_strings.append(bytes.fromhex(hx.decode()))
            except ValueError:
                pass
            i = j + 1
        elif c == 0x5B:  # [ TJ array — strings inside handled above
            i += 1
        else:
            m = re.match(rb"[A-Za-z'\"*]+", block[i:])
            if m:
                op = m.group()
                if op in (b"Tj", b"TJ"):
                    parts.extend(_decode(s) for s in pending_strings)
                    pending_strings = []
                elif op == b"'":
                    newline()
                    parts.extend(_decode(s) for s in pending_strings)
                    pending_strings = []
                elif op == b'"':
                    newline()
                    parts.extend(_decode(s) for s in pending_strings)
                    pending_strings = []
                elif op in (b"Td", b"TD", b"T*"):
                    newline()
                    pending_strings = []
                elif op in (b"Tf", b"Tm", b"Tc", b"Tw", b"Tz",
                            b"TL", b"Ts", b"Tr"):
                    pending_strings = []
                i += len(op)
            else:
                i += 1
    return "".join(parts)


def pdf_extract_text(data: bytes) -> str:
    """Text of every BT…ET block across all content streams, blocks
    joined by newlines, whitespace-trimmed."""
    texts: List[str] = []
    for stream in _streams(data):
        pos = 0
        while True:
            bt = stream.find(b"BT", pos)
            if bt < 0:
                break
            et = stream.find(b"ET", bt + 2)
            if et < 0:
                et = len(stream)
            t = _extract_block(stream[bt + 2:et]).strip()
            if t:
                texts.append(t)
            pos = et + 2
    return "\n".join(texts)


def _escape_literal(s: bytes) -> bytes:
    return (s.replace(b"\\", b"\\\\").replace(b"(", b"\\(")
            .replace(b")", b"\\)").replace(b"\r", b"\\r")
            .replace(b"\n", b"\\n"))


def pdf_build_minimal(text: str, flate: bool = False,
                      use_tj_array: bool = False) -> bytes:
    """A valid single-page PDF showing ``text`` (UTF-8 string bytes) —
    the deterministic corpus generator for tests and the driver gate
    (extraction must round-trip it exactly)."""
    raw = text.encode("utf-8")
    if use_tj_array and len(raw) > 8:
        half = len(raw) // 2
        # never split inside a UTF-8 sequence — each TJ operand is
        # decoded independently at extraction time
        while half < len(raw) and (raw[half] & 0xC0) == 0x80:
            half += 1
        shown = (b"[(" + _escape_literal(raw[:half]) + b") -120 ("
                 + _escape_literal(raw[half:]) + b")] TJ")
    else:
        shown = b"(" + _escape_literal(raw) + b") Tj"
    content = b"BT /F1 12 Tf 72 720 Td " + shown + b" ET"
    filt = b""
    if flate:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + filt
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for k, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += str(k).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += ("%010d 00000 n \n" % off).encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref).encode()
            + b"\n%%EOF\n")
    return bytes(out)
