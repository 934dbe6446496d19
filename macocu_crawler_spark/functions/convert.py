"""U3 binary→text conversion, in-process slice (reference process.py:143-168,
300-329 runs an external converter ladder: antiword/docx2txt/odf2txt/
pdftotext/ps2ascii subprocesses).

This rebuild implements the formats that need NO external binary — docx
and odt are zip archives of XML (stdlib zipfile + xml.etree, from scratch,
NOT a port of the reference's vendored util/docx2txt / util/odf2txt
converters), and pdf gets a minimal text-operator extractor (stdlib zlib
for FlateDecode; simple/standard-encoding PDFs only — CID/Type0 font
encodings come out garbled or empty, exactly the failure mode of a missing
converter, and are documented out of scope).  doc and ps still require
native binaries (antiword, ghostscript) absent from this environment and
stay unimplemented.

Contract (matching the reference's converter stdout): UTF-8 bytes, one
paragraph per block, blocks separated by a blank line ("\n\n") — the shape
process.py:316 splits on.  Conversion is gated behind
config.CONVERSION_ENABLED (default False, reference config.py:347-350);
enabling it also flips URL admission so *.docx/*.odt paths are fetched
instead of sent to the binfile sink (http.py:210-212).

Scale note: conversion runs inside the extract mapInPandas stage — pure
CPU per document, no shuffle introduced; a corrupt archive yields b"" (the
reference's convert_to_txt error contract) and the page falls out as
"cannot extract text".
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_TEXT_NS = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"

_BLANK_RE = re.compile(r"\n{3,}")


def docx_to_txt(data_bs: bytes) -> bytes:
    """.docx → UTF-8 plain text: word/document.xml, one block per <w:p>;
    <w:t> runs concatenated, <w:tab/> → tab, <w:br/> → newline."""
    try:
        with zipfile.ZipFile(io.BytesIO(data_bs)) as zf:
            doc = zf.read("word/document.xml")
        root = ET.fromstring(doc)
    except Exception:
        return b""
    paras = []
    for p in root.iter(f"{_W_NS}p"):
        parts: list[str] = []
        for node in p.iter():
            if node.tag == f"{_W_NS}t":
                parts.append(node.text or "")
            elif node.tag == f"{_W_NS}tab":
                parts.append("\t")
            elif node.tag in (f"{_W_NS}br", f"{_W_NS}cr"):
                parts.append("\n")
        text = "".join(parts).strip()
        if text:
            paras.append(text)
    return "\n\n".join(paras).encode("utf-8")


def _odt_para_text(p) -> str:
    """Flatten one <text:p>/<text:h>: <text:tab> → tab, <text:line-break> →
    newline, <text:s text:c="N"> → N spaces, element text/tails kept."""
    parts: list[str] = []

    def walk(node) -> None:
        if node.tag == f"{_TEXT_NS}tab":
            parts.append("\t")
        elif node.tag == f"{_TEXT_NS}line-break":
            parts.append("\n")
        elif node.tag == f"{_TEXT_NS}s":
            parts.append(" " * int(node.get(f"{_TEXT_NS}c", "1") or "1"))
        if node.text:
            parts.append(node.text)
        for child in node:
            walk(child)
            if child.tail:
                parts.append(child.tail)

    walk(p)
    return "".join(parts).strip()


def odt_to_txt(data_bs: bytes) -> bytes:
    """.odt → UTF-8 plain text: content.xml, one block per <text:p>/<text:h>."""
    try:
        with zipfile.ZipFile(io.BytesIO(data_bs)) as zf:
            content = zf.read("content.xml")
        root = ET.fromstring(content)
    except Exception:
        return b""
    paras = []
    for p in root.iter():
        if p.tag in (f"{_TEXT_NS}p", f"{_TEXT_NS}h"):
            text = _odt_para_text(p)
            if text:
                paras.append(text)
    return "\n\n".join(paras).encode("utf-8")


# ---------------------------------------------------------------------------
# pdf (minimal slice: FlateDecode/raw content streams, standard-encoding
# text operators; complex font encodings/CID fonts are out of scope and
# yield garbled or empty text exactly as a missing converter would)
# ---------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_string_bytes(raw: bytes) -> bytes:
    """Unescape a PDF literal string body ((...) content, parens balanced
    by the tokenizer): \\n \\r \\t \\b \\f \\( \\) \\\\ \\ddd octal."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _PDF_ESCAPES:
                out += _PDF_ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop the backslash
            continue
        out += c
        i += 1
    return bytes(out)


def _pdf_content_text(content: bytes) -> list[str]:
    """Text runs from one content stream: literal/hex strings consumed by
    the text-showing operators Tj ' \" TJ; Td/TD/T* start a new run."""
    runs: list[str] = []
    cur: list[str] = []
    i, n = 0, len(content)

    def flush() -> None:
        text = "".join(cur).strip()
        if text:
            runs.append(text)
        cur.clear()

    pending: list[str] = []  # strings seen since the last operator
    while i < n:
        c = content[i : i + 1]
        if c == b"(":
            depth, j = 1, i + 1
            while j < n and depth:
                cj = content[j : j + 1]
                if cj == b"\\":
                    j += 2
                    continue
                if cj == b"(":
                    depth += 1
                elif cj == b")":
                    depth -= 1
                j += 1
            pending.append(
                _pdf_string_bytes(content[i + 1 : j - 1]).decode(
                    "latin-1", errors="replace"
                )
            )
            i = j
            continue
        if c == b"<" and content[i : i + 2] != b"<<":
            j = content.find(b">", i)
            if j == -1:
                break
            hexstr = re.sub(rb"\s", b"", content[i + 1 : j])
            if len(hexstr) % 2:
                hexstr += b"0"
            try:
                pending.append(bytes.fromhex(hexstr.decode("ascii")).decode(
                    "latin-1", errors="replace"
                ))
            except ValueError:
                pass
            i = j + 1
            continue
        m = re.match(rb"(Tj|TJ|T\*|Td|TD|'|\")", content[i:])
        if m:
            op = m.group(1)
            if op in (b"Tj", b"TJ", b"'", b'"'):
                cur.extend(pending)
            else:  # Td/TD/T* reposition → run boundary
                flush()
            pending.clear()
            i += len(op)
            continue
        if c.isalpha():  # any other operator consumes its string operands
            while i < n and content[i : i + 1].isalpha():
                i += 1
            pending.clear()
            continue
        i += 1
    flush()
    return runs


def pdf_to_txt(data_bs: bytes) -> bytes:
    """Minimal .pdf → UTF-8 text: every FlateDecode (zlib) or raw content
    stream is scanned for text-showing operators; one paragraph block per
    stream, runs joined with newlines."""
    import zlib

    blocks: list[str] = []
    try:
        for m in _STREAM_RE.finditer(data_bs):
            params, body = m.group(1), m.group(2)
            body = body.rstrip(b"\r\n")
            if b"/FlateDecode" in params:
                try:
                    body = zlib.decompress(body)
                except zlib.error:
                    continue
            elif re.search(rb"/Filter", params):
                continue  # other filters (DCT, LZW...) not offered
            runs = _pdf_content_text(body)
            if runs:
                blocks.append("\n".join(runs))
    except Exception:
        return b""
    return "\n\n".join(blocks).encode("utf-8")


def doc_to_txt(data_bs: bytes) -> bytes:
    """.doc (Word 97 binary) → UTF-8 plain text, in-process: [MS-CFB]
    container + FIB/piece-table walk (functions/ole2.py) instead of the
    reference's antiword subprocess (process.py:58).  Paragraph marks come
    out of the piece text as blank-line separators already; empty blocks
    are dropped to match the other converters' block shape."""
    from . import ole2

    try:
        text = ole2.doc_text(data_bs)
    except Exception:
        return b""
    paras = [p.strip() for p in text.split("\n\n")]
    return "\n\n".join(p for p in paras if p).encode("utf-8")


# the in-process converter table (reference CONVERSION_COMMANDS,
# process.py:58-64; ps still needs ghostscript and is not offered —
# COVERAGE.md documents the closure)
CONVERTERS = {
    "docx": docx_to_txt,
    "odt": odt_to_txt,
    "pdf": pdf_to_txt,
    "doc": doc_to_txt,
}


def convert_to_txt(file_type: str, data_bs: bytes) -> bytes:
    """b'' on unknown type or failed conversion — the reference's
    convert_to_txt error contract (process.py:145-168)."""
    fn = CONVERTERS.get(file_type)
    if fn is None:
        return b""
    return _BLANK_RE.sub("\n\n", fn(data_bs).decode("utf-8")).encode("utf-8")
