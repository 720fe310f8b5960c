"""HTML → Markdown conversion (the MarkItDown stand-in).

Reference: aperag/docparser/markitdown_parser.py:25-68 converts HTML (and
office formats) to markdown with MarkItDown(keep_data_uris=True), then feeds
the markdown to parse_md. MarkItDown's HTML path is a markdownify-style
recursive DOM walk; neither library is installed here, so this module is a
from-scratch stdlib-only (html.parser) converter producing the same
conventions for the common tags:

    h1..h6 -> '#'*n heading          a        -> [text](href)
    p/div  -> paragraph blocks       strong/b -> **text**
    ul/ol  -> -/1. items (nested     em/i     -> *text*
              lists 4-space indent)  code     -> `text`
    pre    -> fenced code block      img      -> ![alt](src) (data URIs kept,
    table  -> GFM table                          keep_data_uris=True parity)
    blockquote -> '> ' prefix        br       -> hard line break
    script/style/head dropped        hr       -> ---

Deviation, by design: markdown special characters in text are NOT escaped
(markdownify escapes them). The rebuild's extraction invariant is
byte-identical text per url against its own port, and escaping would corrupt
raw-text payloads downstream consumers pattern-match on; documented here so
the diff vs real MarkItDown is a known, single rule.

Pure Python, no Spark imports — runs inside mapInPandas on executors.
"""

from __future__ import annotations

from html.parser import HTMLParser

_VOID = {"br", "hr", "img", "meta", "link", "input", "source", "area", "base",
         "col", "embed", "track", "wbr"}
_SKIP = {"script", "style", "head", "title", "template", "noscript"}
_BLOCK = {"html", "body", "div", "article", "section", "header", "footer",
          "main", "nav", "aside", "figure", "figcaption", "p", "h1", "h2",
          "h3", "h4", "h5", "h6", "ul", "ol", "li", "blockquote", "pre",
          "table", "thead", "tbody", "tfoot", "tr", "hr", "form", "fieldset",
          "dl", "dt", "dd"}


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # _Node or str


# Bound on DOM depth: deeper elements attach to the capped ancestor instead
# of nesting (flattening). Rendering recurses on tree depth, so this keeps an
# adversarial 100k-deep <div> chain from blowing the recursion limit inside
# an executor task — the html→text path runs unguarded in the KG chunk stage.
_MAX_DOM_DEPTH = 128


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in _VOID and len(self.stack) < _MAX_DOM_DEPTH:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        # close the nearest matching open tag; ignore strays
        for depth in range(len(self.stack) - 1, 0, -1):
            if self.stack[depth].tag == tag:
                del self.stack[depth:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def _ws_collapse(text: str) -> str:
    """HTML whitespace semantics: collapse runs, keep word-boundary spaces."""
    if not text.strip():
        return " " if text else ""
    lead = " " if text[:1].isspace() else ""
    trail = " " if text[-1:].isspace() else ""
    return lead + " ".join(text.split()) + trail


def _render_inline(node, out: list[str]) -> None:
    """Render inline content of a node into out (list of string fragments)."""
    for ch in node.children:
        if isinstance(ch, str):
            out.append(_ws_collapse(ch))
            continue
        t = ch.tag
        if t in _SKIP:
            continue
        if t == "br":
            out.append("\n")
        elif t in ("strong", "b"):
            inner = _inline_text(ch)
            out.append(f"**{inner}**" if inner.strip() else inner)
        elif t in ("em", "i"):
            inner = _inline_text(ch)
            out.append(f"*{inner}*" if inner.strip() else inner)
        elif t == "code":
            inner = _inline_text(ch)
            out.append(f"`{inner}`" if inner.strip() else inner)
        elif t == "a":
            inner = _inline_text(ch).strip()
            href = ch.attrs.get("href", "")
            out.append(f"[{inner}]({href})" if href else inner)
        elif t == "img":
            alt = ch.attrs.get("alt", "")
            src = ch.attrs.get("src", "")  # data URIs kept verbatim
            title = ch.attrs.get("title")
            if title:
                out.append(f'![{alt}]({src} "{title}")')
            else:
                out.append(f"![{alt}]({src})")
        elif t in _BLOCK:
            # block element inside an inline context (multi-paragraph <li>,
            # <p> in a table cell): its text must not glue onto the
            # surrounding words — separate with line breaks (the list
            # renderer indents continuation lines; the table renderer turns
            # them into <br>)
            out.append("\n")
            _render_inline(ch, out)
            out.append("\n")
        else:
            # unknown/other inline tag: transparent passthrough
            _render_inline(ch, out)


def _inline_text(node) -> str:
    out: list[str] = []
    _render_inline(node, out)
    # collapse runs of spaces created by adjacent fragments, keep \n from <br>
    text = "".join(out)
    lines = [" ".join(ln.split()) for ln in text.split("\n")]
    return "\n".join(lines).strip()


def _raw_text(node) -> str:
    """Literal text content (for <pre>), tags dropped, whitespace kept."""
    out: list[str] = []
    for ch in node.children:
        if isinstance(ch, str):
            out.append(ch)
        elif ch.tag == "br":
            out.append("\n")
        elif ch.tag not in _SKIP:
            out.append(_raw_text(ch))
    return "".join(out)


def _render_table(node) -> str:
    rows: list[list[str]] = []
    for section in [node] + [c for c in node.children
                             if isinstance(c, _Node) and c.tag in ("thead", "tbody", "tfoot")]:
        for tr in section.children:
            if isinstance(tr, _Node) and tr.tag == "tr":
                cells = [
                    _inline_text(td).replace("|", "\\|").replace("\n", "<br>")
                    for td in tr.children
                    if isinstance(td, _Node) and td.tag in ("td", "th")
                ]
                if cells:
                    rows.append(cells)
    if not rows:
        return ""
    ncol = max(len(r) for r in rows)
    lines = ["| " + " | ".join((r + [""] * ncol)[:ncol]) + " |" for r in rows]
    lines.insert(1, "| " + " | ".join(["---"] * ncol) + " |")
    return "\n".join(lines)


def _render_list(node, ordered: bool, depth: int) -> list[str]:
    blocks: list[str] = []
    n = 0
    for li in node.children:
        if not (isinstance(li, _Node) and li.tag == "li"):
            continue
        n += 1
        marker = f"{n}. " if ordered else "- "
        # split the item into its own inline text and nested sublists
        sublists = [c for c in li.children
                    if isinstance(c, _Node) and c.tag in ("ul", "ol")]
        own = _Node("li")
        own.children = [c for c in li.children if c not in sublists]
        text = _inline_text(own)
        indent = "    " * depth
        cont = indent + " " * len(marker)
        lines = text.split("\n")
        item = indent + marker + lines[0]
        for extra in lines[1:]:
            item += "\n" + cont + extra
        blocks.append(item)
        for sub in sublists:
            blocks.extend(_render_list(sub, sub.tag == "ol", depth + 1))
    return blocks


def _render_blocks(node, blocks: list[str]) -> None:
    """Walk block-level children; inline runs between blocks become
    paragraphs."""
    pending: list[str] = []

    def flush():
        if pending:
            text = _inline_text_from_fragments(pending)
            if text:
                blocks.append(text)
            pending.clear()

    for ch in node.children:
        if isinstance(ch, str):
            pending.append(_ws_collapse(ch))
            continue
        t = ch.tag
        if t in _SKIP:
            continue
        if t in ("h1", "h2", "h3", "h4", "h5", "h6"):
            flush()
            text = _inline_text(ch)
            if text:
                blocks.append("#" * int(t[1]) + " " + text)
        elif t == "p":
            flush()
            text = _inline_text(ch)
            if text:
                blocks.append(text)
        elif t in ("ul", "ol"):
            flush()
            items = _render_list(ch, t == "ol", 0)
            if items:
                blocks.append("\n".join(items))
        elif t == "pre":
            flush()
            code = _raw_text(ch).strip("\n")
            lang = ""
            for sub in ch.children:
                if isinstance(sub, _Node) and sub.tag == "code":
                    cls = sub.attrs.get("class", "")
                    for token in cls.split():
                        if token.startswith("language-"):
                            lang = token[len("language-"):]
            blocks.append(f"```{lang}\n{code}\n```")
        elif t == "blockquote":
            flush()
            inner: list[str] = []
            _render_blocks(ch, inner)
            quoted = "\n\n".join(inner)
            if quoted:
                blocks.append("\n".join("> " + ln if ln else ">"
                                        for ln in quoted.split("\n")))
        elif t == "table":
            flush()
            tbl = _render_table(ch)
            if tbl:
                blocks.append(tbl)
        elif t == "hr":
            flush()
            blocks.append("---")
        elif t in _BLOCK or t in ("html", "body"):
            flush()
            _render_blocks(ch, blocks)
        else:
            # inline element at block level: joins the current paragraph run
            frag: list[str] = []
            _render_inline(_wrap(ch), frag)
            pending.append("".join(frag))
    flush()


def _wrap(node) -> _Node:
    w = _Node("#wrap")
    w.children = [node]
    return w


def _inline_text_from_fragments(fragments: list[str]) -> str:
    text = "".join(fragments)
    lines = [" ".join(ln.split()) for ln in text.split("\n")]
    return "\n".join(lines).strip()


def html_to_markdown(html_doc: str) -> str:
    """Convert an HTML document to markdown blocks joined by blank lines."""
    builder = _TreeBuilder()
    builder.feed(html_doc)
    builder.close()
    blocks: list[str] = []
    _render_blocks(builder.root, blocks)
    return "\n\n".join(blocks)
