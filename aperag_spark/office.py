"""Office / notebook / ebook → markdown, stdlib-only.

The reference routes .docx/.xlsx/.pptx/.ipynb/.epub through MarkItDown
(docparser/markitdown_parser.py:25-41 SUPPORTED_EXTENSIONS, :65-68 convert
→ parse_md). MarkItDown is an external package, but every one of these
containers is a zip of XML (OOXML, EPUB) or JSON (ipynb) that the standard
library reads — so, exactly like aperag_spark.htmlmd did for HTML, this
module re-implements the CONVENTIONS of MarkItDown's output from scratch
(zipfile + xml.etree + json) and feeds the same parse_md the reference
feeds. Conventions reproduced:

  docx : Heading1-6 / Title styles → #..######, bold/italic runs, w:tbl →
         GFM table (first row = header), numPr paragraphs → list items
         (ilvl-indented, numbered when numFmt != bullet is not resolvable
         we default to '-'), hyperlinks resolved through the .rels part.
  xlsx : one section per sheet — '## <SheetName>' + a GFM table of the
         used range (first row = header), sharedStrings resolved.
  pptx : per slide '<!-- Slide number: N -->' then the title placeholder
         as '# ...' and each other text frame's paragraphs as lines —
         MarkItDown's pptx layout.
  ipynb: markdown cells verbatim; code cells fenced with the notebook
         language.
  epub : spine documents (container.xml → OPF → spine order) each through
         the htmlmd converter, joined with blank lines.

Documented deviation (same class as htmlmd's): no markdown-character
escaping inside cell/run text."""

from __future__ import annotations

import io
import json
import re
import zipfile
from xml.etree import ElementTree


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _text_of(el) -> str:
    return "".join(el.itertext())


def _zip_read(data: bytes, name: str) -> bytes | None:
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        try:
            return z.read(name)
        except KeyError:
            return None


# ---------------------------------------------------------------------------
# DOCX
# ---------------------------------------------------------------------------

def _docx_rels(data: bytes) -> dict[str, str]:
    raw = _zip_read(data, "word/_rels/document.xml.rels")
    rels: dict[str, str] = {}
    if raw:
        for el in ElementTree.fromstring(raw).iter():
            if _local(el.tag) == "Relationship":
                rels[el.get("Id", "")] = el.get("Target", "")
    return rels


def _docx_run_text(run) -> str:
    """One w:r → text with bold/italic markers."""
    text = ""
    bold = italic = False
    for child in run.iter():
        lt = _local(child.tag)
        if lt == "t":
            text += child.text or ""
        elif lt == "tab":
            text += "\t"
        elif lt == "br":
            text += "\n"
        elif lt == "b" and child.get(_w("val"), "1") not in ("0", "false"):
            bold = True
        elif lt == "i" and child.get(_w("val"), "1") not in ("0", "false"):
            italic = True
    if text.strip():
        if bold:
            text = f"**{text}**"
        if italic:
            text = f"*{text}*"
    return text


_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_R_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def _w(attr: str) -> str:
    return f"{{{_W_NS}}}{attr}"


def _docx_para_md(p, rels: dict[str, str]) -> str:
    """One w:p → a markdown line (heading / list item / plain)."""
    style = None
    ilvl = 0
    is_list = False
    chunks: list[str] = []
    for child in p:
        lt = _local(child.tag)
        if lt == "pPr":
            for pr in child.iter():
                plt = _local(pr.tag)
                if plt == "pStyle":
                    style = pr.get(_w("val"), "")
                elif plt == "numPr":
                    is_list = True
                elif plt == "ilvl":
                    ilvl = int(pr.get(_w("val"), "0") or 0)
        elif lt == "r":
            chunks.append(_docx_run_text(child))
        elif lt == "hyperlink":
            inner = "".join(_docx_run_text(r) for r in child if _local(r.tag) == "r")
            target = rels.get(child.get(f"{{{_R_NS}}}id", ""), "")
            chunks.append(f"[{inner}]({target})" if target else inner)
    text = "".join(chunks).strip()
    if not text:
        return ""
    if style:
        if style.lower() == "title":
            return f"# {text}"
        m = re.match(r"^Heading([1-6])$", style, re.I)
        if m:
            return f"{'#' * int(m.group(1))} {text}"
    if is_list:
        return f"{'  ' * ilvl}- {text}"
    return text


def _docx_table_md(tbl, rels: dict[str, str]) -> str:
    rows: list[list[str]] = []
    for tr in (c for c in tbl if _local(c.tag) == "tr"):
        row = []
        for tc in (c for c in tr if _local(c.tag) == "tc"):
            cell = " ".join(
                filter(
                    None,
                    (
                        # strip only the heading/list prefix _docx_para_md
                        # added — not genuine leading '#'/'-' cell content
                        re.sub(r"^(?:#{1,6} |(?:  )*- )", "", _docx_para_md(p, rels)).strip()
                        for p in tc
                        if _local(p.tag) == "p"
                    ),
                )
            )
            row.append(cell.replace("|", "\\|"))
        rows.append(row)
    return _gfm_table(rows)


def _gfm_table(rows: list[list[str]]) -> str:
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    out = ["| " + " | ".join(rows[0]) + " |", "|" + " --- |" * width]
    for r in rows[1:]:
        out.append("| " + " | ".join(r) + " |")
    return "\n".join(out)


def docx_to_markdown(data: bytes) -> str:
    raw = _zip_read(data, "word/document.xml")
    if raw is None:
        raise ValueError("not a docx: word/document.xml missing")
    rels = _docx_rels(data)
    root = ElementTree.fromstring(raw)
    body = next((el for el in root if _local(el.tag) == "body"), root)
    blocks: list[str] = []
    for el in body:
        lt = _local(el.tag)
        if lt == "p":
            md = _docx_para_md(el, rels)
            if md:
                blocks.append(md)
        elif lt == "tbl":
            md = _docx_table_md(el, rels)
            if md:
                blocks.append(md)
    # adjacent list items join into one block; everything else separates
    out: list[str] = []
    for b in blocks:
        if out and b.lstrip().startswith("- ") and out[-1].lstrip().startswith("- "):
            out[-1] += "\n" + b
        else:
            out.append(b)
    return "\n\n".join(out)


# ---------------------------------------------------------------------------
# XLSX
# ---------------------------------------------------------------------------


def _col_index(ref: str) -> int:
    """'C7' → 2 (0-based column)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def xlsx_to_markdown(data: bytes) -> str:
    wb = _zip_read(data, "xl/workbook.xml")
    if wb is None:
        raise ValueError("not an xlsx: xl/workbook.xml missing")
    # shared strings
    shared: list[str] = []
    ss = _zip_read(data, "xl/sharedStrings.xml")
    if ss:
        for si in ElementTree.fromstring(ss):
            if _local(si.tag) == "si":
                shared.append(_text_of(si))
    # sheet name → target via workbook rels
    rels: dict[str, str] = {}
    rl = _zip_read(data, "xl/_rels/workbook.xml.rels")
    if rl:
        for el in ElementTree.fromstring(rl).iter():
            if _local(el.tag) == "Relationship":
                rels[el.get("Id", "")] = el.get("Target", "")
    sections: list[str] = []
    for el in ElementTree.fromstring(wb).iter():
        if _local(el.tag) != "sheet":
            continue
        name = el.get("name", "Sheet")
        rid = el.get(f"{{{_R_NS}}}id", "")
        target = rels.get(rid, "worksheets/sheet1.xml")
        if not target.startswith("xl/"):
            target = "xl/" + target.lstrip("/")
        raw = _zip_read(data, target)
        if raw is None:
            continue
        rows: list[list[str]] = []
        for row in ElementTree.fromstring(raw).iter():
            if _local(row.tag) != "row":
                continue
            cells: dict[int, str] = {}
            for c in row:
                if _local(c.tag) != "c":
                    continue
                idx = _col_index(c.get("r", "A"))
                t = c.get("t", "n")
                v = ""
                for child in c:
                    clt = _local(child.tag)
                    if clt == "v":
                        v = child.text or ""
                    elif clt == "is":  # inline string
                        v = _text_of(child)
                if t == "s" and v != "":
                    v = shared[int(v)]
                cells[idx] = v
            if cells:
                width = max(cells) + 1
                rows.append([cells.get(i, "") for i in range(width)])
        if rows:
            sections.append(f"## {name}\n\n{_gfm_table(rows)}")
    return "\n\n".join(sections)


# ---------------------------------------------------------------------------
# PPTX
# ---------------------------------------------------------------------------


def pptx_to_markdown(data: bytes) -> str:
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        slide_names = sorted(
            (n for n in z.namelist() if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
            key=lambda n: int(re.search(r"(\d+)", n).group(1)),
        )
        if not slide_names:
            raise ValueError("not a pptx: no ppt/slides/slideN.xml")
        out: list[str] = []
        for i, name in enumerate(slide_names, start=1):
            root = ElementTree.fromstring(z.read(name))
            parts = [f"<!-- Slide number: {i} -->"]
            for sp in root.iter():
                if _local(sp.tag) != "sp":
                    continue
                is_title = any(
                    _local(ph.tag) == "ph" and ph.get("type") in ("title", "ctrTitle")
                    for ph in sp.iter()
                )
                paras = []
                for p in sp.iter():
                    if _local(p.tag) != "p":
                        continue
                    line = "".join(
                        t.text or "" for t in p.iter() if _local(t.tag) == "t"
                    ).strip()
                    if line:
                        paras.append(line)
                if not paras:
                    continue
                if is_title:
                    parts.append(f"# {paras[0]}")
                    parts.extend(paras[1:])
                else:
                    parts.extend(paras)
            out.append("\n\n".join(parts))
    return "\n\n".join(out)


# ---------------------------------------------------------------------------
# IPYNB
# ---------------------------------------------------------------------------


def ipynb_to_markdown(data: bytes) -> str:
    nb = json.loads(data.decode("utf-8", errors="replace"))
    lang = (
        nb.get("metadata", {}).get("language_info", {}).get("name")
        or nb.get("metadata", {}).get("kernelspec", {}).get("language")
        or "python"
    )
    blocks: list[str] = []
    for cell in nb.get("cells", []):
        src = cell.get("source", [])
        text = "".join(src) if isinstance(src, list) else str(src)
        if not text.strip():
            continue
        kind = cell.get("cell_type")
        if kind == "markdown":
            blocks.append(text.rstrip())
        elif kind == "code":
            blocks.append(f"```{lang}\n{text.rstrip()}\n```")
    return "\n\n".join(blocks)


# ---------------------------------------------------------------------------
# EPUB
# ---------------------------------------------------------------------------


def epub_to_markdown(data: bytes) -> str:
    from aperag_spark.htmlmd import html_to_markdown

    container = _zip_read(data, "META-INF/container.xml")
    if container is None:
        raise ValueError("not an epub: META-INF/container.xml missing")
    opf_path = None
    for el in ElementTree.fromstring(container).iter():
        if _local(el.tag) == "rootfile":
            opf_path = el.get("full-path")
            break
    if not opf_path:
        raise ValueError("epub container has no rootfile")
    opf = _zip_read(data, opf_path)
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    manifest: dict[str, str] = {}
    spine: list[str] = []
    for el in ElementTree.fromstring(opf).iter():
        lt = _local(el.tag)
        if lt == "item":
            manifest[el.get("id", "")] = el.get("href", "")
        elif lt == "itemref":
            spine.append(el.get("idref", ""))
    docs: list[str] = []
    for idref in spine:
        href = manifest.get(idref)
        if not href:
            continue
        raw = _zip_read(data, base + href) or _zip_read(data, href)
        if raw is None:
            continue
        md = html_to_markdown(raw.decode("utf-8", errors="replace")).strip()
        if md:
            docs.append(md)
    return "\n\n".join(docs)
