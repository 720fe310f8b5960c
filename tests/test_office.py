"""Office/notebook/ebook converters (aperag_spark.office) — the stdlib
restatement of the MarkItDown formats the reference routes through
markitdown_parser.py. Fixtures are hand-built minimal-but-valid OOXML/EPUB
zips so the tests exercise real container layout (rels, sharedStrings,
spine order), not a mocked parse."""

from __future__ import annotations

import io
import json
import zipfile

from aperag_spark.docparser import parse_document
from aperag_spark.office import (
    docx_to_markdown,
    epub_to_markdown,
    ipynb_to_markdown,
    pptx_to_markdown,
    xlsx_to_markdown,
)

W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def _zip(files: dict[str, str | bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, content in files.items():
            z.writestr(name, content)
    return buf.getvalue()


def _docx(document_xml: str, rels_xml: str | None = None) -> bytes:
    files = {"word/document.xml": document_xml}
    if rels_xml:
        files["word/_rels/document.xml.rels"] = rels_xml
    return _zip(files)


DOCX_DOC = f"""<?xml version="1.0"?>
<w:document xmlns:w="{W}" xmlns:r="{R}"><w:body>
  <w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>
    <w:r><w:t>Report Title</w:t></w:r></w:p>
  <w:p><w:r><w:t>Plain text with </w:t></w:r>
    <w:r><w:rPr><w:b/></w:rPr><w:t>bold</w:t></w:r>
    <w:r><w:t> and </w:t></w:r>
    <w:r><w:rPr><w:i/></w:rPr><w:t>italic</w:t></w:r>
    <w:r><w:t> runs.</w:t></w:r></w:p>
  <w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr>
    <w:r><w:t>Findings</w:t></w:r></w:p>
  <w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/></w:numPr></w:pPr>
    <w:r><w:t>first item</w:t></w:r></w:p>
  <w:p><w:pPr><w:numPr><w:ilvl w:val="1"/><w:numId w:val="1"/></w:numPr></w:pPr>
    <w:r><w:t>nested item</w:t></w:r></w:p>
  <w:p><w:hyperlink r:id="rId5"><w:r><w:t>a link</w:t></w:r></w:hyperlink></w:p>
  <w:tbl>
    <w:tr><w:tc><w:p><w:r><w:t>h1</w:t></w:r></w:p></w:tc>
          <w:tc><w:p><w:r><w:t>h2</w:t></w:r></w:p></w:tc></w:tr>
    <w:tr><w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc>
          <w:tc><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc></w:tr>
  </w:tbl>
</w:body></w:document>"""

DOCX_RELS = f"""<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
  <Relationship Id="rId5" Type="t" Target="https://example.com/x"/>
</Relationships>"""


def test_docx_conversion_and_parts():
    md = docx_to_markdown(_docx(DOCX_DOC, DOCX_RELS))
    assert "# Report Title" in md
    assert "## Findings" in md
    assert "**bold**" in md and "*italic*" in md
    assert "- first item" in md and "  - nested item" in md
    assert "[a link](https://example.com/x)" in md
    assert "| h1 | h2 |" in md and "| a | b |" in md

    parts = parse_document("report.docx", _docx(DOCX_DOC, DOCX_RELS))
    titles = [p["content"] for p in parts if p["kind"] == "title"]
    assert "# Report Title" in titles and "## Findings" in titles
    # tables surface as TextParts carrying the GFM markup (parse_md.py:393-430)
    assert any(p["kind"] == "text" and "| h1 | h2 |" in p["content"] for p in parts)


def _xlsx() -> bytes:
    ss = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
  <si><t>name</t></si><si><t>qty</t></si><si><t>widget</t></si></sst>"""
    sheet = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
  <row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>7</v></c></row>
 </sheetData></worksheet>"""
    wb = f"""<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          xmlns:r="{R}">
 <sheets><sheet name="Inventory" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
  <Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
</Relationships>"""
    return _zip(
        {
            "xl/workbook.xml": wb,
            "xl/_rels/workbook.xml.rels": rels,
            "xl/sharedStrings.xml": ss,
            "xl/worksheets/sheet1.xml": sheet,
        }
    )


def test_xlsx_conversion_and_parts():
    md = xlsx_to_markdown(_xlsx())
    assert "## Inventory" in md
    assert "| name | qty |" in md
    assert "| widget | 7 |" in md
    parts = parse_document("inv.xlsx", _xlsx())
    assert any(p["kind"] == "title" and p["content"] == "## Inventory" for p in parts)
    assert any(p["kind"] == "text" and "| name | qty |" in p["content"] for p in parts)


A = "http://schemas.openxmlformats.org/drawingml/2006/main"
P = "http://schemas.openxmlformats.org/presentationml/2006/main"


def _pptx() -> bytes:
    def slide(title, body):
        return f"""<?xml version="1.0"?>
<p:sld xmlns:p="{P}" xmlns:a="{A}"><p:cSld><p:spTree>
 <p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>
   <p:txBody><a:p><a:r><a:t>{title}</a:t></a:r></a:p></p:txBody></p:sp>
 <p:sp><p:txBody><a:p><a:r><a:t>{body}</a:t></a:r></a:p></p:txBody></p:sp>
</p:spTree></p:cSld></p:sld>"""

    return _zip(
        {
            "ppt/slides/slide1.xml": slide("Intro", "welcome line"),
            "ppt/slides/slide2.xml": slide("Results", "numbers went up"),
        }
    )


def test_pptx_conversion_and_parts():
    md = pptx_to_markdown(_pptx())
    assert "<!-- Slide number: 1 -->" in md and "<!-- Slide number: 2 -->" in md
    assert "# Intro" in md and "# Results" in md
    assert md.index("welcome line") < md.index("# Results")  # slide order kept
    parts = parse_document("deck.pptx", _pptx())
    titles = [p["content"] for p in parts if p["kind"] == "title"]
    assert titles == ["# Intro", "# Results"]


def test_ipynb_conversion_and_parts():
    nb = {
        "metadata": {"language_info": {"name": "python"}},
        "cells": [
            {"cell_type": "markdown", "source": ["# Analysis\n", "Intro text."]},
            {"cell_type": "code", "source": ["x = 1\n", "print(x)"]},
            {"cell_type": "code", "source": []},
        ],
    }
    md = ipynb_to_markdown(json.dumps(nb).encode())
    assert md.startswith("# Analysis")
    assert "```python\nx = 1\nprint(x)\n```" in md
    parts = parse_document("nb.ipynb", json.dumps(nb).encode())
    assert any(p["kind"] == "title" and p["content"] == "# Analysis" for p in parts)
    assert any(p["kind"] == "code" for p in parts)


def _epub() -> bytes:
    container = """<?xml version="1.0"?>
<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
 <rootfiles><rootfile full-path="OEBPS/content.opf" media-type="x"/></rootfiles>
</container>"""
    opf = """<?xml version="1.0"?>
<package xmlns="http://www.idpf.org/2007/opf">
 <manifest>
  <item id="c2" href="ch2.xhtml" media-type="application/xhtml+xml"/>
  <item id="c1" href="ch1.xhtml" media-type="application/xhtml+xml"/>
 </manifest>
 <spine><itemref idref="c1"/><itemref idref="c2"/></spine></package>"""
    ch1 = "<html><body><h1>Chapter One</h1><p>It begins.</p></body></html>"
    ch2 = "<html><body><h1>Chapter Two</h1><p>It continues.</p></body></html>"
    return _zip(
        {
            "META-INF/container.xml": container,
            "OEBPS/content.opf": opf,
            "OEBPS/ch1.xhtml": ch1,
            "OEBPS/ch2.xhtml": ch2,
        }
    )


def test_epub_conversion_spine_order():
    md = epub_to_markdown(_epub())
    assert "# Chapter One" in md and "# Chapter Two" in md
    assert md.index("Chapter One") < md.index("Chapter Two")  # spine, not manifest, order
    parts = parse_document("book.epub", _epub())
    titles = [p["content"] for p in parts if p["kind"] == "title"]
    assert titles == ["# Chapter One", "# Chapter Two"]


def test_corrupt_containers_raise_cleanly():
    import pytest

    for fn in (docx_to_markdown, xlsx_to_markdown, pptx_to_markdown, epub_to_markdown):
        with pytest.raises(Exception):
            fn(b"not a zip at all")
    # and the DataFrame path quarantines them as error rows, not crashes
    # (parse_pages catches any Exception — operators/parsing.py)


def test_office_formats_flow_through_spark_parse_pages(spark):
    """The DataFrame path: office containers parse distributed (the office
    module ships with the package zip), corrupt ones quarantine to error
    rows instead of failing the stage."""
    import pyspark.sql.functions as F

    from aperag_spark.operators.parsing import parse_pages

    rows = [
        ("a/report.docx", bytearray(_docx(DOCX_DOC, DOCX_RELS))),
        ("b/deck.pptx", bytearray(_pptx())),
        ("c/inv.xlsx", bytearray(_xlsx())),
        ("d/book.epub", bytearray(_epub())),
        ("e/broken.docx", bytearray(b"definitely not a zip")),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    parts = parse_pages(pages).collect()
    by_url: dict[str, list] = {}
    for r in parts:
        by_url.setdefault(r["url"], []).append(r)
    assert any(
        r["kind"] == "title" and r["content"] == "# Report Title"
        for r in by_url["a/report.docx"]
    )
    assert any(r["kind"] == "title" for r in by_url["b/deck.pptx"])
    assert any("| name | qty |" in (r["content"] or "") for r in by_url["c/inv.xlsx"])
    assert any(r["kind"] == "title" for r in by_url["d/book.epub"])
    broken = by_url["e/broken.docx"]
    assert len(broken) == 1 and broken[0]["kind"] == "error"


# ---------------------------------------------------------------------------
# PDF (aperag_spark.pdftext)
# ---------------------------------------------------------------------------


def _pdf(streams: list[bytes], compress: list[bool]) -> bytes:
    """Minimal but structurally real PDF: header + one obj per content
    stream (Flate-compressed when asked) + EOF."""
    import zlib

    out = [b"%PDF-1.4\n"]
    for i, (s, comp) in enumerate(zip(streams, compress), start=1):
        body = zlib.compress(s) if comp else s
        filt = b"/Filter /FlateDecode " if comp else b""
        out.append(
            b"%d 0 obj\n<< %s/Length %d >>\nstream\n" % (i, filt, len(body))
            + body
            + b"\nendstream\nendobj\n"
        )
    out.append(b"%%EOF\n")
    return b"".join(out)


def test_pdf_text_extraction():
    from aperag_spark.pdftext import pdf_to_text

    s1 = (
        b"BT /F1 12 Tf 72 720 Td (Hello \\(PDF\\) world) Tj "
        b"0 -14 Td [(kerned) -250 ( array) -250 ( text)] TJ ET"
    )
    s2 = b"BT 72 720 Td <48657820737472696E67> Tj T* (next line) Tj ET"
    data = _pdf([s1, s2], [False, True])
    text = pdf_to_text(data)
    assert "Hello (PDF) world" in text  # escaped parens decoded
    assert "kerned array text" in text  # TJ array joined, kerns dropped
    assert "Hex string" in text  # <hex> decoded
    assert text.index("world") < text.index("Hex")  # object order kept
    assert "next line" in text


def test_pdf_through_parse_document_and_quarantine():
    import pytest

    data = _pdf([b"BT (Just one line) Tj ET"], [True])
    parts = parse_document("doc.pdf", data)
    assert any(p["kind"] == "text" and "Just one line" in p["content"] for p in parts)

    # image-only / no-text PDFs raise -> parse_pages quarantines
    with pytest.raises(NotImplementedError):
        parse_document("scan.pdf", _pdf([b"q 100 0 0 100 0 0 cm /Im1 Do Q"], [False]))
    with pytest.raises(ValueError):
        parse_document("bad.pdf", b"not a pdf")
