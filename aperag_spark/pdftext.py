"""Best-effort PDF text extraction, stdlib-only (zlib + re).

The reference's MarkItDown route lists .pdf (markitdown_parser.py:33) and
extracts TEXT via pdfminer — no layout model; its model-based parsers
(MinerU/DocRay, mineru_parser.py / docray_parser.py) are the fidelity path
and stay env-gated here. This module covers the pdfminer-class behavior
for SIMPLE PDFs:

  * objects scanned as `N G obj ... endobj`; stream objects decompressed
    when /Filter is FlateDecode (zlib), taken raw otherwise;
  * every content stream (contains a BT...ET text block) is tokenized and
    the text-showing operators interpreted: Tj, ', " (literal strings),
    TJ (array of strings + kern numbers), with Td/TD/T* emitting line
    breaks;
  * literal strings handle the \\) \\( \\\\ \\n \\r \\t \\ddd escapes;
    <hex> strings decode as raw bytes; both decode latin-1 (the
    PDFDocEncoding superset position for simple fonts).

Out of scope (documented): CID/composite fonts with ToUnicode CMaps,
encrypted files, object streams (/ObjStm), scanned/image-only pages —
those yield empty or partial text, and the DataFrame path quarantines
empty results as error rows rather than emitting garbage."""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"\d+\s+\d+\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)

# one token at a time inside a content stream: literal string (with escaped
# parens), hex string, array delimiters, or an operator/number
_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"  # literal string
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|\[|\]"
    rb"|[^\s\[\]()<>/]+"  # operator or number
    rb"|/[^\s\[\]()<>/]*"  # name
)

_ESC = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_literal(tok: bytes) -> str:
    body = tok[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in _ESC:
                out += _ESC[nxt]
                i += 2
                continue
            m = re.match(rb"\\([0-7]{1,3})", body[i:])
            if m:
                out.append(int(m.group(1), 8) & 0xFF)
                i += 1 + len(m.group(1))
                continue
            i += 1  # lone backslash: skip (line continuation)
            continue
        out += c
        i += 1
    return out.decode("latin-1", errors="replace")


def _decode_hex(tok: bytes) -> str:
    digits = re.sub(rb"\s", b"", tok[1:-1])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")).decode("latin-1", errors="replace")


def _stream_text(data: bytes) -> str:
    """Interpret the text-showing operators of one content stream."""
    pieces: list[str] = []
    stack: list[bytes] = []  # recent tokens, for operand lookup
    in_array: list[bytes] | None = None
    closed_array: list[bytes] = []
    for m in _TOKEN_RE.finditer(data):
        tok = m.group(0)
        if tok == b"[":
            in_array = []
            continue
        if tok == b"]":
            closed_array = in_array or []
            in_array = None
            continue
        if tok.startswith(b"(") or tok.startswith(b"<"):
            if in_array is not None:
                in_array.append(tok)
            else:
                stack.append(tok)
            continue
        # operator or number
        op = tok
        if op == b"TJ":
            for t in closed_array:
                pieces.append(
                    _decode_literal(t) if t.startswith(b"(") else _decode_hex(t)
                )
            closed_array = []
            stack.clear()
        elif op in (b"Tj", b"'", b'"'):
            for prev in reversed(stack):
                if prev.startswith(b"(") or prev.startswith(b"<"):
                    if op in (b"'", b'"'):
                        pieces.append("\n")
                    pieces.append(
                        _decode_literal(prev)
                        if prev.startswith(b"(")
                        else _decode_hex(prev)
                    )
                    break
            stack.clear()
        elif op in (b"Td", b"TD", b"T*", b"ET"):
            pieces.append("\n")
            stack.clear()
        else:
            if in_array is None:
                stack.append(tok)
    text = "".join(pieces)
    # collapse the operator-driven breaks into readable lines/paragraphs
    lines = [ln.strip() for ln in text.split("\n")]
    out: list[str] = []
    for ln in lines:
        if ln:
            out.append(ln)
    return "\n".join(out)


def pdf_to_text(data: bytes) -> str:
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    texts: list[str] = []
    for om in _OBJ_RE.finditer(data):
        body = om.group(1)
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        raw = sm.group(1)
        head = body[: sm.start()]
        if b"FlateDecode" in head:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue
        if b"BT" not in raw:
            continue
        t = _stream_text(raw).strip()
        if t:
            texts.append(t)
    return "\n\n".join(texts)
