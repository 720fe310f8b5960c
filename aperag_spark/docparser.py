"""Document parsing: multi-format parser registry + full markdown → Part
stream (SURVEY.md §2 S2/S3).

Reference:
  * registry dispatch — aperag/docparser/doc_parser.py:31-49 (PARSER_MAP by
    parser name, each parser advertises supported_extensions; first enabled
    parser supporting the extension wins).
  * markdown → parts — aperag/docparser/parse_md.py:34-471. The reference
    tokenizes with markdown-it ("gfm-like") and converts block tokens to a
    Part stream; markdown-it is not installed here, so this module is a
    from-scratch line-based block parser producing the SAME Part-stream
    rendering rules (cited per rule below). Pure Python, no Spark imports —
    runs inside mapInPandas on executors.

Part model (dataclass-free dicts for Arrow friendliness):
  {"kind": "markdown"|"asset"|"title"|"text"|"code",
   "level": int,          # titles only, else 0
   "content": str,        # rendered content (None for asset)
   "lang": str|None,      # code only
   "asset_id": str|None, "mime_type": str|None, "data": bytes|None}
"""

from __future__ import annotations

import base64
import re
from hashlib import md5
from typing import Any
from urllib.parse import quote_plus

# --------------------------------------------------------------------------
# Part constructors
# --------------------------------------------------------------------------


def _part(kind: str, content: str | None, level: int = 0, lang: str | None = None,
          asset_id: str | None = None, mime_type: str | None = None,
          data: bytes | None = None, url: str | None = None,
          alt_text: str | None = None, title: str | None = None) -> dict[str, Any]:
    return {"kind": kind, "level": level, "content": content, "lang": lang,
            "asset_id": asset_id, "mime_type": mime_type, "data": data,
            "url": url, "alt_text": alt_text, "title": title,
            "nesting": 0}


# --------------------------------------------------------------------------
# Data-URI image extraction — parse_md.py:31,46-71: every base64 data URI
# becomes an AssetBinPart (asset_id = md5 of the bytes) and the data URI
# substring is replaced with the asset URL (alt text and title are kept —
# parse_md.py:65-66 does text.replace(data_uri, asset_url)).
# --------------------------------------------------------------------------

DATA_URI_PATTERN = re.compile(
    r"!\[.*?\]\(\s*(data:.+?;base64,.+?)(?:\s+\"(.*?)\")?\)"
)


def _asset_url(asset_id: str, mime_type: str | None) -> str:
    """utils.py:58-62 asset_bin_part_to_url: asset://id?mime_type=<quoted>."""
    url = f"asset://{asset_id}"
    if mime_type:
        url += f"?mime_type={quote_plus(mime_type)}"
    return url


def extract_data_uri(text: str) -> tuple[str, list[dict]]:
    assets: list[dict] = []
    for m in DATA_URI_PATTERN.finditer(text):
        data_uri = m.group(1)
        try:
            mime_type, encoded = data_uri.split("base64,")
            mime_type = mime_type[5:-1]  # strip 'data:' and trailing ';'
            binary = base64.b64decode(encoded)
        except Exception:
            continue  # malformed: leave untouched (parse_md.py:66-68)
        asset_id = md5(binary).hexdigest()
        assets.append(_part("asset", None, asset_id=asset_id,
                            mime_type=mime_type, data=binary))
        text = text.replace(data_uri, _asset_url(asset_id, mime_type))
    return text, assets


# --------------------------------------------------------------------------
# Inline image extraction — parse_md.py:167-192 _extract_image_parts: every
# inline image inside paragraph/table content yields an ImagePart
# (url, alt_text, title) appended AFTER the containing text part; images in
# headings are dropped (heading handler keeps only the TitlePart,
# parse_md.py:256-276), and table extraction is deferred until the whole
# table is rendered (parse_md.py:393-407 PauseExtraction).
# --------------------------------------------------------------------------

_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\(\s*(\S+?)(?:\s+\"([^\"]*)\")?\s*\)")


def _extract_images(text: str) -> list[dict]:
    return [
        _part("image", None, url=m.group(2), alt_text=m.group(1),
              title=m.group(3))
        for m in _IMAGE_RE.finditer(text)
    ]


# --------------------------------------------------------------------------
# Block-level markdown parser.
# --------------------------------------------------------------------------

_ATX_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_FENCE_RE = re.compile(r"^(```+|~~~+)\s*(\S*)\s*$")
_HR_RE = re.compile(r"^ {0,3}((?:-\s*){3,}|(?:\*\s*){3,}|(?:_\s*){3,})$")
_BULLET_RE = re.compile(r"^( *)([-*+])( +)(.*)$")
_ORDERED_RE = re.compile(r"^( *)(\d{1,9})([.)])( +)(.*)$")
_TABLE_DELIM_RE = re.compile(r"^\s*\|?\s*:?-{3,}:?\s*(\|\s*:?-{3,}:?\s*)*\|?\s*$")
_SETEXT_RE = re.compile(r"^ {0,3}(=+|-+)\s*$")
_HTML_BLOCK_RE = re.compile(r"^ {0,3}<\w")
_DEF_RE = re.compile(
    r"^ {0,3}\[([^\]]+)\]:\s*(\S+)(?:\s+(?:\"([^\"]*)\"|\(([^)]*)\)))?\s*$"
)


def _to_code_content(code: str, lang: str | None = None) -> str:
    """Backtick-escalating fence wrap — parse_md.py:223-233."""
    backticks = "```"
    for _ in range(10):
        if backticks not in code:
            break
        backticks += "`"
    code = code.strip()
    if lang:
        return f"{backticks}{lang}\n{code}\n{backticks}"
    return f"{backticks}\n{code}\n{backticks}"


def _escape_cell(text: str) -> str:
    """parse_md.py:432-436."""
    return text.replace("|", "\\|").replace("\r", "").replace("\n", "<br>")


def _split_row(line: str) -> list[str]:
    """Split a GFM table row on unescaped pipes, trimming edge pipes."""
    line = line.strip()
    if line.startswith("|"):
        line = line[1:]
    if line.endswith("|") and not line.endswith("\\|"):
        line = line[:-1]
    cells, cur, i = [], [], 0
    while i < len(line):
        c = line[i]
        if c == "\\" and i + 1 < len(line) and line[i + 1] == "|":
            cur.append("|"); i += 2; continue
        if c == "|":
            cells.append("".join(cur).strip()); cur = []; i += 1; continue
        cur.append(c); i += 1
    cells.append("".join(cur).strip())
    return cells


# Defense-in-depth cap on quote/list recursion: past this depth the body is
# emitted as a raw text part instead of recursing further. Real documents
# never nest this deep; an adversarial one must not stall an executor task.
_MAX_NEST_DEPTH = 64


def _parse_blocks(lines: list[str], depth: int = 0) -> list[dict]:
    """lines → Part list (titles, text, code). Recursive for quotes/lists."""
    if depth > _MAX_NEST_DEPTH:
        text = "\n".join(lines).strip()
        return [_part("text", text)] if text else []
    parts: list[dict] = []
    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        if not line.strip():
            i += 1
            continue

        # fenced code — parse_md.py:243-254 (CodePart, lang kept)
        m = _FENCE_RE.match(line.strip())
        if m and len(line) - len(line.lstrip()) < 4:
            fence, lang = m.group(1), m.group(2) or None
            close_re = re.compile(
                rf"^ {{0,3}}{re.escape(fence[0])}{{{len(fence)},}}\s*$"
            )
            body: list[str] = []
            i += 1
            while i < n and not close_re.match(lines[i]):
                body.append(lines[i])
                i += 1
            if i < n:
                i += 1  # consume closing fence
            parts.append(_part("code", _to_code_content("\n".join(body), lang), lang=lang))
            continue

        # indented code block — parse_md.py:234-241 (no lang)
        if line.startswith("    ") and line.strip():
            body = []
            while i < n and (lines[i].startswith("    ") or not lines[i].strip()):
                if not lines[i].strip() and (i + 1 >= n or not lines[i + 1].startswith("    ")):
                    break
                body.append(lines[i][4:] if lines[i].startswith("    ") else "")
                i += 1
            parts.append(_part("code", _to_code_content("\n".join(body), None)))
            continue

        # ATX heading — parse_md.py:256-276: content "#"*level + " " + text
        m = _ATX_RE.match(line.strip())
        if m and len(line) - len(line.lstrip()) < 4:
            level = len(m.group(1))
            parts.append(_part("title", "#" * level + " " + m.group(2), level=level))
            i += 1
            continue

        # hr — parse_md.py:287-293: TextPart with token.markup. markdown-it-py
        # sets hr markup to marker*(cnt+1) ("---" → "----"); reproduced as the
        # reference's own golden test (test_parse_md.py:167-174) requires it.
        if _HR_RE.match(line):
            marker = line.strip()[0]
            cnt = line.count(marker)
            parts.append(_part("text", marker * (cnt + 1)))
            i += 1
            continue

        # blockquote — parse_md.py:199-221: parse inner, re-prefix "> " on
        # text/title parts only
        if line.lstrip().startswith(">"):
            inner: list[str] = []
            while i < n and lines[i].lstrip().startswith(">"):
                stripped = lines[i].lstrip()[1:]
                inner.append(stripped[1:] if stripped.startswith(" ") else stripped)
                i += 1
            for p in _parse_blocks(inner, depth + 1):
                if p["kind"] in ("text", "title") and p["content"] is not None:
                    p["content"] = "\n".join(
                        "> " + ln for ln in p["content"].split("\n")
                    )
                p["nesting"] += 1  # md_nesting (Nester, parse_md.py:80-90)
                parts.append(p)
            continue

        # lists — parse_md.py:309-377
        mb, mo = _BULLET_RE.match(line), _ORDERED_RE.match(line)
        if (mb and len(mb.group(1)) < 4) or (mo and len(mo.group(1)) < 4):
            sub, i = _parse_list(lines, i, depth)
            parts.extend(sub)
            continue

        # GFM table — parse_md.py:393-430: one TextPart, cells escaped,
        # '|---' delimiter row regenerated from the column count
        if "|" in line and i + 1 < n and _TABLE_DELIM_RE.match(lines[i + 1]) and "|" in lines[i + 1]:
            header = _split_row(line)
            ncol = len(header)
            out = ["| " + " ".join(_escape_cell(c) + " |" for c in header).rstrip()]
            out[0] = "| " + " | ".join(_escape_cell(c) for c in header) + " |"
            out.append("|---" * ncol + "|")
            src_rows = [line]
            i += 2
            while i < n and "|" in lines[i] and lines[i].strip():
                src_rows.append(lines[i])
                row = _split_row(lines[i])
                row = (row + [""] * ncol)[:ncol]  # pad/trim to header width
                out.append("| " + " | ".join(_escape_cell(c) for c in row) + " |")
                i += 1
            parts.append(_part("text", "\n".join(out)))
            # images in cells surface after the whole table (parse_md.py:398-407)
            parts.extend(_extract_images("\n".join(src_rows)))
            continue

        # link-reference definition — parse_md.py:379-390 (_convert_definition
        # under inline_definitions): one TextPart per definition, title
        # normalized to the "(title)" form regardless of source quoting
        m = _DEF_RE.match(line)
        if m:
            content = f"[{m.group(1)}]: {m.group(2)}"
            title = m.group(3) or m.group(4)
            if title:
                content += f" ({title})"
            parts.append(_part("text", content))
            i += 1
            continue

        # html block — parse_md.py:295-301: raw passthrough
        if _HTML_BLOCK_RE.match(line):
            body = []
            while i < n and lines[i].strip():
                body.append(lines[i])
                i += 1
            parts.append(_part("text", "\n".join(body)))
            continue

        # paragraph (with setext-heading lookahead) — inline content is the
        # RAW source text (parse_md.py:278-285 uses token.content, which
        # markdown-it leaves unrendered)
        body = [line.strip()]
        i += 1
        while i < n and lines[i].strip():
            nxt = lines[i]
            if _SETEXT_RE.match(nxt) and len(body) >= 1:
                level = 1 if nxt.strip().startswith("=") else 2
                text = "\n".join(body)
                parts.append(_part("title", "#" * level + " " + text, level=level))
                body = []
                i += 1
                break
            if (
                _ATX_RE.match(nxt.strip())
                or _FENCE_RE.match(nxt.strip())
                or nxt.lstrip().startswith(">")
                or _BULLET_RE.match(nxt)
                or _ORDERED_RE.match(nxt)
                or _HR_RE.match(nxt)
            ):
                break
            body.append(nxt.strip())
            i += 1
        if body:
            text = "\n".join(body)
            parts.append(_part("text", text))
            # inline images ride after their paragraph (parse_md.py:281-285)
            parts.extend(_extract_images(text))
    return parts


def _parse_list(lines: list[str], start: int, depth: int = 0) -> tuple[list[dict], int]:
    """Parse one (possibly nested) list starting at lines[start].

    Rendering — parse_md.py:323-377: the item's first text part gets the
    marker prepended and its continuation lines aligned under it; later
    parts of the same item get a 4-space indent (text parts only); ordered
    markers renumber sequentially from the first item's number."""
    parts: list[dict] = []
    i, n = start, len(lines)
    first = lines[i]
    mo = _ORDERED_RE.match(first)
    ordered = mo is not None and len(mo.group(1)) < 4
    base_indent = len((mo or _BULLET_RE.match(first)).group(1))
    ordinal = int(mo.group(2)) if ordered else 0

    while i < n:
        line = lines[i]
        if not line.strip():
            # blank line inside list: continue if next line still belongs
            j = i + 1
            while j < n and not lines[j].strip():
                j += 1
            if j < n and (len(lines[j]) - len(lines[j].lstrip())) > base_indent:
                i = j
                continue
            if j < n and (
                (_BULLET_RE.match(lines[j]) or _ORDERED_RE.match(lines[j]))
                and len((_BULLET_RE.match(lines[j]) or _ORDERED_RE.match(lines[j])).group(1)) == base_indent
            ):
                i = j
                continue
            break
        m = _ORDERED_RE.match(line) if ordered else _BULLET_RE.match(line)
        if not m or len(m.group(1)) != base_indent:
            ind = len(line) - len(line.lstrip())
            if ind <= base_indent:
                break
            # shouldn't reach: continuation handled inside item loop below
            break
        if ordered:
            marker = f"{ordinal}{m.group(3)} "
            ordinal += 1
            text0 = m.group(5)
        else:
            marker = f"{m.group(2)} "
            text0 = m.group(4)
        # collect the item's body: first line + any more-indented lines
        body = [text0]
        i += 1
        item_indent = base_indent + len(marker)
        while i < n:
            ln = lines[i]
            if not ln.strip():
                # keep blank if item continues after it
                j = i + 1
                while j < n and not lines[j].strip():
                    j += 1
                if j < n and (len(lines[j]) - len(lines[j].lstrip())) > base_indent and not (
                    (_BULLET_RE.match(lines[j]) or _ORDERED_RE.match(lines[j]))
                    and len((_BULLET_RE.match(lines[j]) or _ORDERED_RE.match(lines[j])).group(1)) <= base_indent
                ):
                    body.append("")
                    i = j
                    continue
                break
            ind = len(ln) - len(ln.lstrip())
            nm = _BULLET_RE.match(ln) or _ORDERED_RE.match(ln)
            if nm and len(nm.group(1)) == base_indent:
                break  # next sibling item
            if ind <= base_indent and not ln.startswith(" " * (base_indent + 1)):
                # lazy continuation (CommonMark §5.2, markdown-it paragraph
                # laziness): an unindented plain line directly after item
                # paragraph text stays in the paragraph; block starters
                # (heading/fence/hr/quote/list/setext/html-block/table —
                # all registered as paragraph interrupters in markdown-it)
                # interrupt instead
                if body and body[-1].strip() and not (
                    nm
                    or _ATX_RE.match(ln.strip())
                    or _FENCE_RE.match(ln.strip())
                    or _HR_RE.match(ln)
                    or _SETEXT_RE.match(ln)
                    or ln.lstrip().startswith(">")
                    or _HTML_BLOCK_RE.match(ln)
                    or (
                        "|" in ln
                        and i + 1 < n
                        and _TABLE_DELIM_RE.match(lines[i + 1])
                        and "|" in lines[i + 1]
                    )
                ):
                    body.append(ln.strip())
                    i += 1
                    continue
                break  # de-dented: list ends
            body.append(ln[min(item_indent, ind):] if ind >= item_indent else ln.lstrip())
            i += 1
        item_parts = _parse_blocks(body, depth + 1)
        for p in item_parts:
            p["nesting"] += 1  # list bodies are nested (parse_md.py:316-321)
        if not item_parts:
            parts.append(_part("text", marker))  # empty item (parse_md.py:335-339)
            continue
        first_p = item_parts[0]
        if first_p["kind"] == "text":
            plines = (first_p["content"] or "").split("\n")
            spaces = " " * len(marker)
            plines[0] = marker + plines[0]
            for k in range(1, len(plines)):
                plines[k] = spaces + plines[k]
            first_p["content"] = "\n".join(plines)
            parts.append(first_p)
        else:
            parts.append(_part("text", marker))
            parts.append(first_p)
        for p in item_parts[1:]:
            if p["kind"] == "text" and p["content"] is not None:
                p["content"] = "\n".join("    " + ln for ln in p["content"].split("\n"))
            parts.append(p)
    return parts, i


def parse_md(input_md: str) -> list[dict]:
    """markdown → [MarkdownPart] + asset parts + block Part stream —
    parse_md.py:34-43."""
    input_md, assets = extract_data_uri(input_md)
    md_part = _part("markdown", input_md)
    return [md_part] + assets + _parse_blocks(input_md.split("\n"))


def parts_for_rechunk(parts: list[dict]) -> list[dict]:
    """Adapt a Part stream to the rechunker's input contract
    (operators/rechunk.rechunk_parts). Reference chunking.py:46-74:
    markdown/asset/image parts are not chunk items; TitleParts keep their
    level AND nesting — the grouping rule lives in the rechunker (a nested
    title opens a group only when it is the very first part, exactly like
    _to_groups' curr_group-is-None branch preceding the nesting check), and
    the group title is the FULL title content including its '#' markup
    (chunking.py:57-59)."""
    out = []
    for p in parts:
        if p["kind"] in ("markdown", "asset", "image") or not p["content"]:
            continue
        if p["kind"] == "title":
            out.append({
                "kind": "title", "level": p["level"], "content": p["content"],
                "nesting": p.get("nesting", 0),
            })
        else:
            out.append({"kind": "text", "level": 0, "content": p["content"]})
    return out


# --------------------------------------------------------------------------
# HTML parser — the MarkItDown flow (markitdown_parser.py:64-68): convert
# HTML to markdown (aperag_spark.htmlmd, same extractor as the KG path so
# the byte-identical invariant holds), then parse_md the result into the
# full Part stream (titles, tables, code, images).
# --------------------------------------------------------------------------


def parse_html(html_bytes: bytes) -> list[dict]:
    from aperag_spark.textproc import extract_text_from_html

    return parse_md(extract_text_from_html(html_bytes))


def parse_txt(data: bytes) -> list[dict]:
    text = data.decode("utf-8", errors="replace")
    return [_part("markdown", text), _part("text", text.strip())]


def parse_pdf(data: bytes) -> list[dict]:
    """Best-effort text extraction (aperag_spark.pdftext) — the pdfminer-
    class behavior of the reference's MarkItDown route
    (markitdown_parser.py:33). Scanned / CID-font / encrypted PDFs yield no
    text and quarantine as error rows; the reference's model-based parsers
    (MinerU/DocRay) remain the fidelity path and stay env-gated."""
    from aperag_spark.pdftext import pdf_to_text

    text = pdf_to_text(data)
    if not text.strip():
        raise NotImplementedError(
            "pdf yielded no extractable text (scanned/CID-font/encrypted; "
            "reference fidelity path: MinerU/DocRay model parsers)"
        )
    return [_part("markdown", text), _part("text", text.strip())]


# --------------------------------------------------------------------------
# Registry — doc_parser.py:31-49: name→parser map, extension dispatch.
# Audio/image/PDF parsers need codecs absent from this container; they are
# registered but raise NotImplementedError like multimodal.decode_media.
# --------------------------------------------------------------------------


def _unsupported(fmt: str):
    def _raise(_data: bytes) -> list[dict]:
        raise NotImplementedError(
            f"{fmt} parsing needs external codecs/models (reference: MinerU/"
            f"DocRay/audio_parser); not available in this environment"
        )

    return _raise


def _via_office(convert):
    """Office/notebook/ebook container → markdown (aperag_spark.office,
    the stdlib restatement of the MarkItDown conventions the reference
    routes these through, markitdown_parser.py:25-41,65-68) → parse_md."""

    def _parse(data: bytes) -> list[dict]:
        return parse_md(convert(data))

    return _parse


def _office(name: str):
    import aperag_spark.office as office

    return _via_office(getattr(office, name))


PARSER_MAP: dict[str, Any] = {
    ".md": lambda data: parse_md(data.decode("utf-8", errors="replace")),
    ".markdown": lambda data: parse_md(data.decode("utf-8", errors="replace")),
    ".html": parse_html,
    ".htm": parse_html,
    ".txt": parse_txt,
    ".text": parse_txt,
    ".docx": _office("docx_to_markdown"),
    ".xlsx": _office("xlsx_to_markdown"),
    ".pptx": _office("pptx_to_markdown"),
    ".ipynb": _office("ipynb_to_markdown"),
    ".epub": _office("epub_to_markdown"),
    ".pdf": parse_pdf,
    ".doc": _unsupported("doc (legacy binary; reference shells to soffice)"),
    ".ppt": _unsupported("ppt (legacy binary; reference shells to soffice)"),
    ".xls": _unsupported("xls (legacy binary; reference shells to soffice)"),
    ".mp3": _unsupported("audio"),
    ".wav": _unsupported("audio"),
    ".png": _unsupported("image"),
    ".jpg": _unsupported("image"),
}


def parse_document(path: str, data: bytes) -> list[dict]:
    """Extension dispatch (doc_parser.py:51-76 fallback chain): known
    extension → its parser; unknown → HTML-ish tag-strip fallback."""
    dot = path.rfind(".")
    ext = path[dot:].lower().split("?")[0] if dot >= 0 else ""
    parser = PARSER_MAP.get(ext, parse_html)
    return parser(data)
