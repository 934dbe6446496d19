"""U3 binary→text conversion, in-process slice (reference process.py:143-168,
300-329 runs an external converter ladder: antiword/docx2txt/odf2txt/
pdftotext/ps2ascii subprocesses).

This rebuild implements the two formats that need NO external binary — docx
and odt are zip archives of XML, extracted here with stdlib zipfile +
xml.etree from scratch (NOT a port of the reference's vendored
util/docx2txt / util/odf2txt converters).  doc/pdf/ps still require native
binaries absent from this environment and stay unimplemented; their types
route to the binfile channel exactly as before.

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


# the in-process converter table (reference CONVERSION_COMMANDS,
# process.py:58-64; doc/pdf/ps need external binaries and are not offered)
CONVERTERS = {
    "docx": docx_to_txt,
    "odt": odt_to_txt,
}


def convert_to_txt(file_type: str, data_bs: bytes) -> bytes:
    """b'' on unknown type or failed conversion — the reference's
    convert_to_txt error contract (process.py:145-168)."""
    fn = CONVERTERS.get(file_type)
    if fn is None:
        return b""
    return _BLANK_RE.sub("\n\n", fn(data_bs).decode("utf-8")).encode("utf-8")
