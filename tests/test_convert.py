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
        assert set(convert.CONVERTERS) == {"docx", "odt", "pdf"}


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
