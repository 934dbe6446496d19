"""U3 binary conversion slice: in-process docx/odt zip+XML extraction
(reference process.py:58-64, 300-329) gated behind CONVERSION_ENABLED,
feeding the same txt_decode → paragraphs → jusText path as text/plain."""

import io
import zipfile

import pytest

from macocu_crawler_spark import config
from macocu_crawler_spark.functions import convert, textkit, urlkit

GOOD_NO_PAR = (
    "Kommunen la fram en ny plan for å forbedre kollektivtrafikken i hele "
    "regionen neste år, og mange av innbyggerne var glade for nyheten om "
    "bedre busstilbud i bygda der de bor."
)

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
TEXT_NS = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
OFFICE_NS = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"


def make_docx(paragraphs: list[str]) -> bytes:
    body = "".join(
        f"<w:p><w:r><w:t xml:space='preserve'>{p}</w:t></w:r></w:p>"
        for p in paragraphs
    )
    doc = (
        f"<?xml version='1.0' encoding='UTF-8'?>"
        f"<w:document xmlns:w='{W_NS}'><w:body>{body}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()


def make_odt(paragraphs: list[str]) -> bytes:
    body = "".join(f"<text:p>{p}</text:p>" for p in paragraphs)
    content = (
        f"<?xml version='1.0' encoding='UTF-8'?>"
        f"<office:document-content xmlns:office='{OFFICE_NS}' "
        f"xmlns:text='{TEXT_NS}'><office:body><office:text>{body}"
        f"</office:text></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr("content.xml", content)
    return buf.getvalue()


def make_doc(paragraphs: list[str], with_prc: bool = False) -> bytes:
    """A spec-faithful minimal Word 97 .doc: [MS-CFB] container (512-byte
    sectors, FAT + directory + miniFAT — the Table stream is mini-stream
    resident like in real small .doc files) holding a WordDocument stream
    (FIB + text) and a 1Table stream (Clx piece table).  Each paragraph
    becomes one piece, compressed (cp1252 at fc/2) when its chars fit
    cp1252 and UTF-16LE otherwise — so a mixed document exercises both
    piece encodings.  ``with_prc`` prepends a Prc the parser must skip."""
    import struct

    # --- WordDocument stream: FIB + piece texts --------------------------
    fib = bytearray(1472)
    struct.pack_into("<HH", fib, 0, 0xA5EC, 0x00C1)  # wIdent, nFib
    struct.pack_into("<H", fib, 0x0A, 0x0200)        # fWhichTblStm → 1Table
    struct.pack_into("<H", fib, 32, 0x000E)          # csw
    struct.pack_into("<H", fib, 62, 0x0016)          # cslw
    struct.pack_into("<H", fib, 152, 0x005D)         # cbRgFcLcb (nFib 00C1)
    word = bytearray(fib)
    while len(word) % 512:
        word.append(0)
    pieces = []  # (cp_len, fc_raw)
    total_cp = 0
    for p in paragraphs:
        txt = p + "\r"
        try:
            raw = txt.encode("cp1252")
            fc_raw = 0x40000000 | (len(word) * 2)
        except UnicodeEncodeError:
            raw = txt.encode("utf-16-le")
            fc_raw = len(word)
        word.extend(raw)
        pieces.append((len(txt), fc_raw))
        total_cp += len(txt)
    struct.pack_into("<I", word, 0x4C, total_cp)     # ccpText

    # --- 1Table stream: Clx ----------------------------------------------
    n = len(pieces)
    plc = bytearray()
    cp = 0
    for cp_len, _ in pieces:
        plc += struct.pack("<I", cp)
        cp += cp_len
    plc += struct.pack("<I", cp)
    for _, fc_raw in pieces:
        plc += struct.pack("<HIH", 0, fc_raw, 0)     # PCD: flags, fc, prm
    clx = bytearray()
    if with_prc:
        clx += b"\x01" + struct.pack("<H", 4) + b"\x00" * 4
    clx += b"\x02" + struct.pack("<I", len(plc)) + plc
    table = bytes(clx)
    struct.pack_into("<II", word, 0x01A2, 0, len(table))  # fcClx, lcbClx

    # --- pad WordDocument past the mini cutoff (real FIBs alone nearly
    # reach it); 1Table stays small → mini stream ------------------------
    while len(word) < 4096:
        word.append(0)
    word_bytes = bytes(word)

    # --- CFB container ---------------------------------------------------
    SS, MS = 512, 64
    n_word = (len(word_bytes) + SS - 1) // SS
    mini = table + b"\x00" * (-len(table) % MS)
    n_mini_sect = (len(mini) + SS - 1) // SS
    # sector layout: 0 dir | 1..n_word WordDocument | ministream | miniFAT | FAT
    s_word = 1
    s_mini = s_word + n_word
    s_minifat = s_mini + n_mini_sect
    s_fat = s_minifat + 1
    total = s_fat + 1

    FREE, END, FATS = 0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFD
    fat = [FREE] * (SS // 4)
    fat[0] = END
    for i in range(n_word):
        fat[s_word + i] = s_word + i + 1 if i < n_word - 1 else END
    for i in range(n_mini_sect):
        fat[s_mini + i] = s_mini + i + 1 if i < n_mini_sect - 1 else END
    fat[s_minifat] = END
    fat[s_fat] = FATS
    minifat = [FREE] * (SS // 4)
    n_mini_units = len(mini) // MS
    for i in range(n_mini_units):
        minifat[i] = i + 1 if i < n_mini_units - 1 else END

    def dirent(name, typ, start, size, left=FREE, right=FREE, child=FREE):
        ent = bytearray(128)
        raw = name.encode("utf-16-le")
        ent[: len(raw)] = raw
        struct.pack_into("<H", ent, 64, len(raw) + 2)
        ent[66] = typ
        ent[67] = 1  # black
        struct.pack_into("<III", ent, 68, left, right, child)
        struct.pack_into("<IQ", ent, 116, start, size)
        return bytes(ent)

    directory = (
        dirent("Root Entry", 5, s_mini, len(mini), child=1)
        + dirent("WordDocument", 2, s_word, len(word_bytes), left=2)
        + dirent("1Table", 2, 0, len(table))
        + b"\x00" * 128
    )

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major version (512-byte)
    struct.pack_into("<H", header, 28, 0xFFFE)   # byte order
    struct.pack_into("<HH", header, 30, 9, 6)    # sector/mini shifts
    struct.pack_into(
        "<9I", header, 40,
        0,          # n dir sectors (0 in v3)
        1,          # n FAT sectors
        0,          # first dir sector
        0,          # transaction sig
        4096,       # mini cutoff
        s_minifat, 1,   # first miniFAT sector, count
        END, 0,     # first DIFAT sector, count
    )
    difat = [s_fat] + [FREE] * 108
    struct.pack_into("<109I", header, 76, *difat)

    sectors = [None] * total
    sectors[0] = directory + b"\x00" * (SS - len(directory))
    for i in range(n_word):
        sectors[s_word + i] = word_bytes[i * SS : (i + 1) * SS].ljust(SS, b"\x00")
    for i in range(n_mini_sect):
        sectors[s_mini + i] = mini[i * SS : (i + 1) * SS].ljust(SS, b"\x00")
    sectors[s_minifat] = struct.pack(f"<{SS // 4}I", *minifat)
    sectors[s_fat] = struct.pack(f"<{SS // 4}I", *fat)
    return bytes(header) + b"".join(sectors)


class TestConverters:
    def test_docx_paragraph_blocks(self):
        out = convert.docx_to_txt(make_docx(["Første avsnitt.", "Andre avsnitt."]))
        assert out.decode("utf-8") == "Første avsnitt.\n\nAndre avsnitt."

    def test_docx_runs_tabs_breaks(self):
        doc = (
            f"<w:document xmlns:w='{W_NS}'><w:body><w:p>"
            "<w:r><w:t>a</w:t></w:r><w:r><w:tab/><w:t>b</w:t></w:r>"
            "<w:r><w:br/><w:t>c</w:t></w:r>"
            "</w:p></w:body></w:document>"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("word/document.xml", doc)
        assert convert.docx_to_txt(buf.getvalue()).decode() == "a\tb\nc"

    def test_odt_paragraphs_and_whitespace_elements(self):
        content = (
            f"<office:document-content xmlns:office='{OFFICE_NS}' "
            f"xmlns:text='{TEXT_NS}'><office:body><office:text>"
            "<text:h>Tittel</text:h>"
            "<text:p>a<text:tab/>b<text:line-break/>c<text:s text:c='3'/>d</text:p>"
            "</office:text></office:body></office:document-content>"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("content.xml", content)
        assert convert.odt_to_txt(buf.getvalue()).decode() == "Tittel\n\na\tb\nc   d"

    def test_corrupt_archive_yields_empty(self):
        assert convert.docx_to_txt(b"not a zip") == b""
        assert convert.odt_to_txt(b"PK\x03\x04 truncated") == b""
        assert convert.pdf_to_txt(b"%PDF-1.4") == b""  # no streams
        assert convert.convert_to_txt("ps", b"%!PS") == b""  # not offered

    def test_unknown_type_not_offered(self):
        assert set(convert.CONVERTERS) == {"docx", "odt", "pdf", "doc"}


def make_pdf(paragraphs: list[str], compress: bool = False) -> bytes:
    """A minimal valid one-page PDF with one content stream per call; text
    shown with Tj/TJ and T* run breaks."""
    import zlib

    ops = ["BT /F1 12 Tf 72 720 Td"]
    for i, p in enumerate(paragraphs):
        esc = p.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        if i % 2:  # alternate literal Tj and array TJ forms
            half = len(esc) // 2
            ops.append(f"[({esc[:half]}) -250 ({esc[half:]})] TJ T*")
        else:
            ops.append(f"({esc}) Tj T*")
    ops.append("ET")
    content = " ".join(ops).encode("latin-1")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    offsets.append(len(out))
    out += (
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + filt
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
    )
    xref = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n"
        + str(xref).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def make_cid_pdf(
    text: str, with_tounicode: bool = True, compress_cmap: bool = True
) -> bytes:
    """A Type0/Identity-H PDF showing ``text`` as 2-byte CIDs with
    CID = codepoint + 0x100 (so nothing decodes correctly without the
    ToUnicode CMap), plus a bfchar-mapped '€' and a list-form bfrange
    'AB' appended — all three CMap section shapes exercised."""
    import zlib

    cids = [ord(ch) + 0x100 for ch in text] + [0x9999, 0x0300, 0x0301]
    hexstr = "".join(f"{c:04X}" for c in cids)
    content = f"BT /F1 12 Tf 72 720 Td <{hexstr}> Tj ET".encode()
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"1 beginbfchar\n<9999> <20AC>\nendbfchar\n"
        b"2 beginbfrange\n<0100> <02FF> <0000>\n"
        b"<0300> <0301> [<0041> <0042>]\nendbfrange\n"
        b"endcmap\nend\nend\n"
    )
    cmap_filt = b""
    if compress_cmap:
        cmap = zlib.compress(cmap)
        cmap_filt = b" /Filter /FlateDecode"
    font = b"<< /Type /Font /Subtype /Type0 /BaseFont /Test /Encoding /Identity-H"
    if with_tounicode:
        font += b" /ToUnicode 6 0 R"
    font += b" >>"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
        font,
        b"<< /Length " + str(len(cmap)).encode() + cmap_filt
        + b" >>\nstream\n" + cmap + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.5\n")
    for i, o in enumerate(objs, start=1):
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


class TestPdf:
    def test_pdf_text_runs(self):
        out = convert.pdf_to_txt(make_pdf(["Første avsnitt.", "Andre (del) to."]))
        text = out.decode("utf-8")
        assert "Første avsnitt." in text
        assert "Andre (del) to." in text  # TJ array halves rejoined, escapes

    def test_pdf_flate_stream(self):
        out = convert.pdf_to_txt(make_pdf(["Komprimert tekst her."], compress=True))
        assert "Komprimert tekst her." in out.decode("utf-8")

    def test_pdf_octal_and_hex_strings(self):
        pdf = make_pdf([])
        # splice a content stream using octal escape + hex string
        raw = b"BT (\\105n) Tj <20> Tj (til) Tj ET"  # "En" + " " + "til"
        pdf = pdf.replace(b"stream\n", b"stream\n" + raw, 1)
        text = convert.pdf_to_txt(pdf).decode("utf-8")
        assert "En til" in text.replace("  ", " ")

    def test_pdf_cid_tounicode(self):
        """Round 6 (VERDICT r5 #2): a CID/Type0 PDF with a /ToUnicode CMap
        extracts the real text — bfchar, plain bfrange (last-unit
        increment), and list-form bfrange all mapped; the CMap stream is
        Flate-compressed like real-web PDFs."""
        text = "Čeština má háčky"
        out = convert.pdf_to_txt(make_cid_pdf(text)).decode("utf-8")
        assert text + "€AB" in out
        # uncompressed CMap variant
        out2 = convert.pdf_to_txt(
            make_cid_pdf(text, compress_cmap=False)
        ).decode("utf-8")
        assert text + "€AB" in out2

    def test_pdf_cid_without_tounicode_yields_empty(self):
        """A Type0 font with NO usable ToUnicode shows glyph indices, not
        characters — the converter must yield b'' (the missing-converter
        contract), never NUL-laden latin-1 garbage."""
        assert convert.pdf_to_txt(make_cid_pdf("text", with_tounicode=False)) == b""

    def test_pdf_mixed_simple_and_cid_fonts(self):
        """Font state is tracked per show op: a simple-font string after a
        CID run still decodes latin-1."""
        pdf = make_cid_pdf("Guten Tag")
        pdf = pdf.replace(
            b" ET", b" /F9 10 Tf (plain latin suffix) Tj ET", 1
        )
        # /F9 is not in any resource dict → simple-font latin-1 path
        out = convert.pdf_to_txt(pdf).decode("utf-8")
        assert "Guten Tag€AB" in out
        assert "plain latin suffix" in out

    def test_pdf_cid_malformed_cmaps_never_crash(self):
        """Adversarial CMap bodies: truncated sections, bracket garbage,
        odd hex, a DoS-sized bfrange — the parser must return a (possibly
        empty) map, never raise, and the capped range must stay bounded."""
        from macocu_crawler_spark.functions.convert import (
            _MAX_BFRANGE,
            _parse_tounicode,
        )

        cases = [
            b"",
            b"beginbfchar <00",  # truncated
            b"beginbfchar <0041> endbfchar",  # odd pair count
            b"beginbfchar [ <0041> ] endbfchar",  # brackets where hex due
            b"beginbfrange <0041> [ <0042> endbfrange",  # lo hi swapped form
            b"beginbfrange <zz> <yy> <xx> endbfrange",  # non-hex
            b"beginbfrange <0000> <FFFFFFFF> <0041> endbfrange",  # DoS range
            b"beginbfrange <0100> <0102> [<0041> <0042>] endbfrange",  # short list
        ]
        for body in cases:
            m = _parse_tounicode(body)
            assert isinstance(m, dict)
            total = sum(len(v) for v in m.values())
            assert total <= _MAX_BFRANGE + 1, (body, total)
        # and a whole-file fuzz through the public entry: random bytes
        # around PDF keywords must yield bytes, never raise
        import random

        rng = random.Random(6)
        for _ in range(50):
            blob = bytes(rng.randrange(256) for _ in range(400))
            junk = (b"%PDF-1.4\n1 0 obj\n<< /ToUnicode 2 0 R /Type /Font >>"
                    b"\nendobj\n2 0 obj\n<< /Length 400 >>\nstream\n"
                    + blob + b"\nendstream\nendobj\n")
            assert isinstance(convert.pdf_to_txt(junk), bytes)

    def test_pdf_page_produces_prevert_doc(self, monkeypatch):
        monkeypatch.setattr(config, "CONVERSION_ENABLED", True)
        hdr = b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n"
        row = textkit.process_page(
            wpage_id=1, url="http://example.no/rapport.pdf",
            html_bs=make_pdf(
                [GOOD_NO_PAR, GOOD_NO_PAR + " Og mer tekst om planen."],
                compress=True,
            ),
            http_header=hdr, connect_time="20230815100000", ip="10.0.0.1",
        )
        assert row["file_type"] == "pdf"
        assert row["txt_len"] > 0
        assert 'file_type="pdf"' in row["prevert"]


DOCX_HDR = (
    b"HTTP/1.1 200 OK\r\nContent-Type: application/vnd.openxmlformats-"
    b"officedocument.wordprocessingml.document\r\n\r\n"
)
ODT_HDR = (
    b"HTTP/1.1 200 OK\r\nContent-Type: application/vnd.oasis.opendocument.text\r\n\r\n"
)
DOC_HDR = b"HTTP/1.1 200 OK\r\nContent-Type: application/msword\r\n\r\n"


class TestDoc:
    def test_doc_paragraph_blocks(self):
        out = convert.doc_to_txt(make_doc(["Første avsnitt.", "Andre avsnitt."]))
        assert out == "Første avsnitt.\n\nAndre avsnitt.".encode("utf-8")

    def test_doc_mixed_piece_encodings(self):
        """One cp1252 (compressed) piece and one UTF-16LE piece in the same
        document — the per-piece fCompressed bit drives the decode."""
        paras = ["Vanlig norsk tekst med æøå.", "Gresk Δέλτα og mer tekst."]
        out = convert.doc_to_txt(make_doc(paras)).decode("utf-8")
        assert out == "\n\n".join(paras)

    def test_doc_prc_skipped(self):
        out = convert.doc_to_txt(make_doc(["En paragraf."], with_prc=True))
        assert out == "En paragraf.".encode("utf-8")

    def test_doc_control_chars_mapped(self):
        from macocu_crawler_spark.functions import ole2

        text = ole2.doc_text(make_doc(["Linje\x0bto", "Felt\x13ref\x14res\x15t"]))
        assert "Linje\nto" in text
        assert "Feltrest" in text  # field begin/sep vanish, result text kept

    def test_mini_stream_table_read(self):
        """The generator stores 1Table in the MINI stream (size < 4096) —
        decoding proves the miniFAT/ministream path, the allocator real
        small .doc files actually use."""
        from macocu_crawler_spark.functions import ole2

        cf = ole2.CompoundFile(make_doc(["X" * 20]))
        assert "1Table" in cf.stream_names()
        table = cf.read_stream("1Table")
        assert len(table) < 4096 and table[0] == 0x02

    def test_corrupt_doc_yields_empty(self):
        assert convert.doc_to_txt(b"\xd0\xcf\x11\xe0 garbage") == b""
        assert convert.doc_to_txt(b"not ole at all") == b""
        # valid container, truncated WordDocument stream
        doc = bytearray(make_doc(["En paragraf."]))
        # WordDocument stream = sector 1 = file offset 1024
        doc[1024 + 0x1A6 : 1024 + 0x1AA] = (10 ** 6).to_bytes(4, "little")  # lcbClx lies
        assert convert.doc_to_txt(bytes(doc)) == b""

    def test_difat_cycle_does_not_hang(self):
        """A mutated header pointing the DIFAT chain at itself with a huge
        sector count must fail fast, not loop forever (found by the
        mutation fuzz below — web-fetched .doc bytes are adversarial)."""
        import struct

        doc = bytearray(make_doc(["En paragraf."]))
        # first DIFAT sector → sector 0 (whose trailing next-pointer is
        # arbitrary data), count → huge.  The walk is cycle-checked and
        # bounded by the file's physical sector count, so this returns
        # promptly (the junk FAT entries past n_fat_sectors are ignored,
        # so the text may still extract — termination is the contract)
        struct.pack_into("<II", doc, 68, 0, 0xFFFFFF)
        assert isinstance(convert.doc_to_txt(bytes(doc)), bytes)

    def test_mutation_fuzz_never_crashes(self):
        """300 seeded random mutations (byte flips, truncations, inserts)
        of a valid .doc: doc_to_txt must always return bytes — b'' on
        failure — and never raise or hang."""
        import random

        base = make_doc(["Første avsnitt om planen.", "Andre med Δ tegn."])
        rng = random.Random(42)
        for _ in range(300):
            doc = bytearray(base)
            for _m in range(rng.randint(1, 8)):
                op = rng.random()
                if op < 0.5:
                    doc[rng.randrange(len(doc))] = rng.randrange(256)
                elif op < 0.8 and len(doc) > 600:
                    doc = doc[: rng.randrange(512, len(doc))]
                else:
                    pos = rng.randrange(len(doc))
                    doc[pos:pos] = bytes(
                        rng.randrange(256) for _ in range(rng.randint(1, 32))
                    )
            assert isinstance(convert.doc_to_txt(bytes(doc)), bytes)

    def test_encrypted_doc_refused(self):
        doc = bytearray(make_doc(["Hemmelig."]))
        # WordDocument stream = sector 1 = file offset 1024; sanity-check we
        # are really flipping the FIB flags (wIdent sits 10 bytes earlier)
        import struct

        assert struct.unpack_from("<H", doc, 1024)[0] == 0xA5EC
        flags = struct.unpack_from("<H", doc, 1024 + 0x0A)[0]
        struct.pack_into("<H", doc, 1024 + 0x0A, flags | 0x0100)
        assert convert.doc_to_txt(bytes(doc)) == b""


class TestConversionPipeline:
    def _process(self, payload: bytes, header: bytes, url: str):
        return textkit.process_page(
            wpage_id=1, url=url, html_bs=payload, http_header=header,
            connect_time="20230815100000", ip="10.0.0.1",
        )

    def test_docx_page_produces_prevert_doc(self, monkeypatch):
        monkeypatch.setattr(config, "CONVERSION_ENABLED", True)
        row = self._process(
            make_docx([GOOD_NO_PAR, GOOD_NO_PAR + " Og mer tekst om planen."]),
            DOCX_HDR, "http://example.no/rapport.docx",
        )
        assert row["file_type"] == "docx"
        assert row["txt_len"] > 0
        assert "Kommunestyret" in row["text"] or "Kommunen" in row["text"]
        assert 'file_type="docx"' in row["prevert"]

    def test_odt_page_produces_prevert_doc(self, monkeypatch):
        monkeypatch.setattr(config, "CONVERSION_ENABLED", True)
        row = self._process(
            make_odt([GOOD_NO_PAR, GOOD_NO_PAR + " Og mer tekst om planen."]),
            ODT_HDR, "http://example.no/rapport.odt",
        )
        assert row["file_type"] == "odt"
        assert row["txt_len"] > 0

    def test_doc_page_produces_prevert_doc(self, monkeypatch):
        monkeypatch.setattr(config, "CONVERSION_ENABLED", True)
        row = self._process(
            make_doc([GOOD_NO_PAR, GOOD_NO_PAR + " Og mer tekst om planen."]),
            DOC_HDR, "http://example.no/rapport.doc",
        )
        assert row["file_type"] == "doc"
        assert row["txt_len"] > 0
        assert "Kommunen" in row["text"]
        assert 'file_type="doc"' in row["prevert"]

    def test_doc_admission_flips_with_conversion_flag(self, monkeypatch):
        assert urlkit.check_url_path("/rapport.doc") == "binary-file"
        monkeypatch.setattr(config, "CONVERSION_ENABLED", True)
        assert urlkit.check_url_path("/rapport.doc") is None

    def test_ps_closure_routes_to_empty(self, monkeypatch):
        """Formal U3 ps closure: ps2ascii needs a PostScript INTERPRETER
        (ghostscript, absent; the language is Turing-complete so there is
        no bounded in-process slice).  With conversion ON, *.ps is admitted
        (flag flips the path check) but extraction hits the b'' converter
        contract and the page falls out as "cannot extract text"."""
        monkeypatch.setattr(config, "CONVERSION_ENABLED", True)
        assert urlkit.check_url_path("/figur.ps") is None  # admitted
        row = self._process(
            b"%!PS-Adobe-3.0\n/Helvetica findfont 12 scalefont setfont\n"
            b"72 700 moveto (Usynlig tekst) show\nshowpage\n",
            b"HTTP/1.1 200 OK\r\nContent-Type: application/postscript\r\n\r\n",
            "http://example.no/figur.ps",
        )
        assert row["file_type"] == "ps"
        assert row["txt_len"] == 0
        assert "cannot extract text" in row["error_msgs"]

    def test_conversion_disabled_drops_binary(self):
        assert config.CONVERSION_ENABLED is False  # reference default
        row = self._process(
            make_docx([GOOD_NO_PAR]), DOCX_HDR, "http://example.no/rapport.docx"
        )
        assert row["txt_len"] == 0
        assert "cannot extract text" in row["error_msgs"]


class TestDriverFlagReachesWorkers:
    def test_spark_extract_follows_driver_flag(self, spark, monkeypatch):
        """ADVICE r3 split-brain: the extract UDF must follow the DRIVER's
        CONVERSION_ENABLED, not the worker environment.  A driver-side
        monkeypatch never reaches worker processes (they re-import config
        from THEIR env, where the flag is off), so a docx page converting
        here proves the flag travels in the pickled UDF closure."""
        import datetime as dt

        from macocu_crawler_spark.operators.extract import extract_documents

        monkeypatch.setattr(config, "CONVERSION_ENABLED", True)
        pages = spark.createDataFrame(
            [
                (
                    1,
                    "http://example.no/rapport.docx",
                    dt.datetime(2023, 8, 15, 10, 0, 0),
                    bytearray(make_docx([GOOD_NO_PAR, GOOD_NO_PAR + " Og mer."])),
                    bytearray(DOCX_HDR),
                    "10.0.0.1",
                )
            ],
            "wpage_id long, url string, warc_ts timestamp, html binary,"
            " http_header binary, ip string",
        )
        row = extract_documents(pages).first()
        assert row.file_type == "docx"
        assert row.txt_len > 0  # converted despite worker env flag being off
        # and with the driver flag off, the same page is dropped
        monkeypatch.setattr(config, "CONVERSION_ENABLED", False)
        row_off = extract_documents(pages).first()
        assert row_off.txt_len == 0


class TestBinfileRouting:
    def test_admission_flips_with_conversion_flag(self, monkeypatch):
        # default: *.docx is a binfile route (http.py:211)
        assert urlkit.check_url_path("/rapport.docx") == "binary-file"
        monkeypatch.setattr(config, "CONVERSION_ENABLED", True)
        assert urlkit.check_url_path("/rapport.docx") is None
        # pdf too — the reference flag is global, not per-format
        assert urlkit.check_url_path("/rapport.pdf") is None

    def test_spark_admission_column_flips(self, spark, monkeypatch):
        df = spark.createDataFrame(
            [("http", "example.no", "/rapport.docx")], "scheme string, host string, path string"
        )
        reason = lambda: df.select(  # noqa: E731
            urlkit.check_url_reason_col(
                df.scheme, df.host, df.path
            ).alias("r")
        ).first().r
        assert reason() == "path-binary-file"
        monkeypatch.setattr(config, "CONVERSION_ENABLED", True)
        assert reason() is None
