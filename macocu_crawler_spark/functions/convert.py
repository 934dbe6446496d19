"""U3 binary→text conversion, in-process slice (reference process.py:143-168,
300-329 runs an external converter ladder: antiword/docx2txt/odf2txt/
pdftotext/ps2ascii subprocesses).

This rebuild implements the formats that need NO external binary — docx
and odt are zip archives of XML (stdlib zipfile + xml.etree, from scratch,
NOT a port of the reference's vendored util/docx2txt / util/odf2txt
converters), and pdf gets a text-operator extractor (stdlib zlib for
FlateDecode) covering simple/standard encodings AND CID/Type0 fonts via
their /ToUnicode CMap (bfchar/bfrange per the public PDF spec — the path
pdftotext takes for the majority of real-web non-Latin PDFs).  A Type0
font with no usable ToUnicode yields b'' — the missing-converter failure
mode, never garbled glyph indices.  ps still requires an interpreter
(ghostscript) absent from this environment and stays unimplemented; .doc
is handled in-process via functions/ole2.py.

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
# pdf (minimal slice: FlateDecode/raw content streams, text operators with
# standard encodings PLUS CID/Type0 fonts carrying a /ToUnicode CMap — the
# majority of real-web non-Latin PDFs; parsed per the public PDF spec
# (bfchar/bfrange, ISO 32000-1 §9.10.3).  A Type0 font WITHOUT a usable
# ToUnicode still yields no text (the reference's pdftotext would consult
# the font program, which is out of scope here), never NUL-laden garbage)
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


# ToUnicode CMap machinery (ISO 32000-1 §9.10.3).  A parsed CMap is
# {code_length_bytes: {code_int: unicode_str}} — Identity-H CID fonts use
# 2-byte codes, simple fonts with a ToUnicode use 1-byte codes; mixed
# codespaces decode longest-match-first.

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_OR_BRACKET_RE = re.compile(rb"<[0-9A-Fa-f\s]*>|\[|\]")
_MAX_BFRANGE = 65536  # cap a single malformed range (DoS guard)


def _hexbytes(tok: bytes) -> bytes:
    h = re.sub(rb"[^0-9A-Fa-f]", b"", tok)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii"))


def _utf16be(bs: bytes) -> str:
    return bs.decode("utf-16-be", errors="ignore")


def _parse_tounicode(cmap_bytes: bytes) -> dict[int, dict[int, str]]:
    """bfchar/bfrange sections → {code_len: {code: str}}.  Destination hex
    is UTF-16BE; the plain-range form increments the destination's last
    code unit (the spec's 'last byte' rule, done on the trailing unit so
    BMP targets map correctly)."""
    out: dict[int, dict[int, str]] = {}

    def put(src: bytes, dst: str) -> None:
        if src and dst:
            out.setdefault(len(src), {})[int.from_bytes(src, "big")] = dst

    for m in _BFCHAR_RE.finditer(cmap_bytes):
        toks = _HEX_OR_BRACKET_RE.findall(m.group(1))
        for src_t, dst_t in zip(toks[0::2], toks[1::2]):
            if src_t in (b"[", b"]") or dst_t in (b"[", b"]"):
                break  # malformed section
            put(_hexbytes(src_t), _utf16be(_hexbytes(dst_t)))
    for m in _BFRANGE_RE.finditer(cmap_bytes):
        toks = _HEX_OR_BRACKET_RE.findall(m.group(1))
        i = 0
        while i + 3 <= len(toks):
            lo_t, hi_t, third = toks[i], toks[i + 1], toks[i + 2]
            if lo_t in (b"[", b"]") or hi_t in (b"[", b"]"):
                break  # malformed section
            lo_b = _hexbytes(lo_t)
            lo = int.from_bytes(lo_b, "big")
            # cap both against DoS ranges and against codes that no longer
            # fit the source code length (malformed hi wider than lo)
            hi = min(int.from_bytes(_hexbytes(hi_t), "big"),
                     lo + _MAX_BFRANGE, (1 << (8 * len(lo_b))) - 1)
            if third == b"[":  # list form: successive destinations
                j = i + 3
                code = lo
                while j < len(toks) and toks[j] != b"]":
                    if code <= hi:
                        put(code.to_bytes(len(lo_b), "big"),
                            _utf16be(_hexbytes(toks[j])))
                    code += 1
                    j += 1
                i = j + 1
                continue
            dst = _hexbytes(third)
            if len(dst) >= 2:
                base = int.from_bytes(dst[-2:], "big")
                prefix = dst[:-2]
                for code in range(lo, hi + 1):
                    put(code.to_bytes(len(lo_b), "big"),
                        _utf16be(prefix + ((base + code - lo) & 0xFFFF)
                                 .to_bytes(2, "big")))
            i += 3
    return out


def _cmap_decode(raw: bytes, cmap: dict[int, dict[int, str]]) -> str:
    """Map a shown string's bytes through a ToUnicode CMap, longest code
    first; unmapped codes are dropped (pdftotext's behavior for CIDs with
    no unicode mapping)."""
    if not cmap:
        return ""
    lens = sorted(cmap, reverse=True)
    min_len = lens[-1]
    out: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        for L in lens:
            if i + L <= n:
                ch = cmap[L].get(int.from_bytes(raw[i : i + L], "big"))
                if ch is not None:
                    out.append(ch)
                    i += L
                    break
        else:
            i += min_len  # unmapped: skip one code unit, stay in sync
    return "".join(out)


def _pdf_content_text(
    content: bytes, fonts: dict[bytes, dict[int, dict[int, str]] | None] | None = None
) -> list[str]:
    """Text runs from one content stream: literal/hex strings consumed by
    the text-showing operators Tj ' \" TJ; Td/TD/T* start a new run.

    ``fonts`` maps resource names (b"F1") to a parsed ToUnicode CMap, or to
    None for a CID/Type0 font with no usable CMap (its strings yield no
    text — CIDs are glyph indices, not characters).  The scanner tracks the
    current font through ``/Name ... Tf`` and decodes each string at SHOW
    time with the font then in effect; fonts absent from the map decode as
    latin-1 (the simple-font behavior)."""
    fonts = fonts or {}
    runs: list[str] = []
    cur: list[str] = []
    i, n = 0, len(content)
    cmap: dict[int, dict[int, str]] | None | bool = False  # False = simple font
    last_name: bytes | None = None

    def decode(raw: bytes) -> str:
        if cmap is False:
            return raw.decode("latin-1", errors="replace")
        return _cmap_decode(raw, cmap) if cmap else ""

    def flush() -> None:
        text = "".join(cur).strip()
        if text:
            runs.append(text)
        cur.clear()

    pending: list[bytes] = []  # raw string operands since the last operator
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
            pending.append(_pdf_string_bytes(content[i + 1 : j - 1]))
            i = j
            continue
        if c == b"<" and content[i : i + 2] != b"<<":
            j = content.find(b">", i)
            if j == -1:
                break
            try:
                pending.append(_hexbytes(content[i + 1 : j]))
            except ValueError:
                pass
            i = j + 1
            continue
        if c == b"/":  # name token (font resource selections ride these)
            m = re.match(rb"/([^\s/<>\[\]()]*)", content[i:])
            last_name = m.group(1)
            i += m.end()
            continue
        m = re.match(rb"(Tj|TJ|Tf|T\*|Td|TD|'|\")", content[i:])
        if m:
            op = m.group(1)
            if op in (b"Tj", b"TJ", b"'", b'"'):
                cur.extend(decode(p) for p in pending)
            elif op == b"Tf":  # font selection: /Name size Tf
                cmap = fonts[last_name] if last_name in fonts else False
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


# object-graph slice for font resolution: content streams name fonts by
# resource key (/F1 12 Tf); resource dicts map keys → font object refs;
# the font object carries /ToUnicode → the CMap stream.  Parsed with the
# same heuristic regex machinery as the streams — no xref table walk (a
# compressed-xref PDF falls back to no-CMap behavior, never crashes).
_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.S)
_TOUNI_REF_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_FONTDICT_INLINE_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_FONTDICT_REF_RE = re.compile(rb"/Font\s+(\d+)\s+\d+\s+R")
_NAME_REF_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")


def _pdf_stream_body(body: bytes) -> bytes | None:
    import zlib

    m = _STREAM_RE.search(body)
    if not m:
        return None
    params, sbody = m.group(1), m.group(2).rstrip(b"\r\n")
    if b"/FlateDecode" in params:
        try:
            return zlib.decompress(sbody)
        except zlib.error:
            return None
    if re.search(rb"/Filter", params):
        return None  # other filters not offered
    return sbody


def _pdf_font_cmaps(data_bs: bytes):
    """Resource-name → parsed ToUnicode CMap (or None for a Type0 font
    without one — its strings are glyph indices and must yield NO text,
    not NUL-laden latin-1).  Names from every /Font resource dict in the
    file are merged; a name reused across pages with different fonts keeps
    the last binding (documented heuristic — per-page resolution needs the
    page tree, out of scope for this slice)."""
    objs = {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data_bs)}
    font_cmap: dict[int, object] = {}  # font obj num → cmap | None
    for num, body in objs.items():
        if b"/Font" not in body and b"/ToUnicode" not in body:
            continue
        ref = _TOUNI_REF_RE.search(body)
        if ref and b"/Type" in body:
            cm_body = objs.get(int(ref.group(1)))
            cm_stream = _pdf_stream_body(cm_body) if cm_body is not None else None
            cmap = _parse_tounicode(cm_stream) if cm_stream else None
            font_cmap[num] = cmap or None
        elif b"/Subtype" in body and (
            b"/Type0" in body or b"Identity-H" in body or b"Identity-V" in body
        ):
            font_cmap[num] = None  # CID font, no usable unicode mapping
    fonts: dict[bytes, object] = {}
    for body in objs.values():
        dict_bodies = [m.group(1) for m in _FONTDICT_INLINE_RE.finditer(body)]
        for m in _FONTDICT_REF_RE.finditer(body):
            target = objs.get(int(m.group(1)))
            if target is not None:
                dict_bodies.append(target)
        for db in dict_bodies:
            for name, ref in _NAME_REF_RE.findall(db):
                ref = int(ref)
                if ref in font_cmap:
                    fonts[name] = font_cmap[ref]
    return fonts


def pdf_to_txt(data_bs: bytes) -> bytes:
    """Minimal .pdf → UTF-8 text: every FlateDecode (zlib) or raw content
    stream is scanned for text-showing operators; one paragraph block per
    stream, runs joined with newlines.  CID/Type0 strings are mapped
    through their font's /ToUnicode CMap when one exists."""
    import zlib

    blocks: list[str] = []
    try:
        # only walk the object graph when a unicode mapping (or a CID font
        # to suppress) can exist — plain simple-font PDFs skip the pass
        fonts = (
            _pdf_font_cmaps(data_bs)
            if (b"/ToUnicode" in data_bs or b"/Type0" in data_bs)
            else {}
        )
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
            runs = _pdf_content_text(body, fonts)
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
