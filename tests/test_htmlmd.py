"""S2 MarkItDown-fidelity HTML→markdown conversion (htmlmd.html_to_markdown)
and its wiring into the Part stream (docparser.parse_html → parse_md).

Reference flow: markitdown_parser.py:64-68 — MarkItDown(keep_data_uris=True)
HTML→markdown, then parse_md. These tests pin the conversion conventions for
the common tags and prove the whole chain produces structured parts (titles,
code, GFM tables, images) from real mixed HTML, not just <p> text.
"""

from aperag_spark.docparser import parse_html
from aperag_spark.htmlmd import html_to_markdown
from aperag_spark.textproc import extract_text_from_html

MIXED = """<html><head><title>ignored</title><style>p{color:red}</style>
<script>var x=1;</script></head><body>
<h1>Main Title</h1>
<p>Intro with <strong>bold</strong>, <em>ital</em>, <code>x=1</code> and a
<a href="https://ex.com/a">link</a>.</p>
<h2>Lists</h2>
<ul><li>one</li><li>two <b>bold</b><ul><li>deep</li></ul></li></ul>
<ol><li>first</li><li>second</li></ol>
<pre><code class="language-python">def f():
    return 1</code></pre>
<blockquote><p>quoted line</p><p>second</p></blockquote>
<table><thead><tr><th>H1</th><th>H2</th></tr></thead>
<tbody><tr><td>a|b</td><td><img alt="pic" src="http://img/x.png"></td></tr></tbody></table>
<hr>
<p>after &amp; entities</p>
</body></html>"""

EXPECTED_MD = """# Main Title

Intro with **bold**, *ital*, `x=1` and a [link](https://ex.com/a).

## Lists

- one
- two **bold**
    - deep

1. first
2. second

```python
def f():
    return 1
```

> quoted line
>
> second

| H1 | H2 |
| --- | --- |
| a\\|b | ![pic](http://img/x.png) |

---

after & entities"""


def test_html_to_markdown_mixed_golden():
    assert html_to_markdown(MIXED) == EXPECTED_MD


def test_parse_html_produces_structured_parts():
    parts = parse_html(MIXED.encode("utf-8"))
    assert parts[0]["kind"] == "markdown" and parts[0]["content"] == EXPECTED_MD
    titles = [(p["content"], p["level"]) for p in parts if p["kind"] == "title"]
    assert ("# Main Title", 1) in titles and ("## Lists", 2) in titles
    code = [p for p in parts if p["kind"] == "code"]
    assert any(p["lang"] == "python" and "def f():" in p["content"] for p in code)
    texts = [p["content"] for p in parts if p["kind"] == "text"]
    assert any(t.startswith("| H1 | H2 |") for t in texts)
    images = [p for p in parts if p["kind"] == "image"]
    assert any(p["url"] == "http://img/x.png" and p["alt_text"] == "pic" for p in images)
    # blockquote re-prefixed by the markdown block parser
    assert "> quoted line" in texts


def test_data_uri_image_survives_roundtrip():
    """keep_data_uris=True parity: an <img> data URI rides through the
    markdown and becomes an asset part + rewritten reference in parse_md."""
    import base64
    from hashlib import md5

    raw = b"tinybytes"
    b64 = base64.b64encode(raw).decode()
    html = f'<html><body><p>pic: <img alt="a" src="data:image/png;base64,{b64}"></p></body></html>'
    md = html_to_markdown(html)
    assert f"![a](data:image/png;base64,{b64})" in md
    parts = parse_html(html.encode())
    asset_id = md5(raw).hexdigest()
    assert any(p["kind"] == "asset" and p["asset_id"] == asset_id for p in parts)
    assert any(
        p["kind"] == "image" and p["url"] == f"asset://{asset_id}?mime_type=image%2Fpng"
        for p in parts
    )


def test_p_only_pages_reduce_to_paragraph_stream():
    """The KG-path invariant: <p>-only pages (the Common-Crawl-style synth
    corpus shape) extract to exactly the blank-line-joined paragraph text."""
    doc = b"<html><head><title>x</title></head><body><p>para one</p><p>two &amp; three</p></body></html>"
    assert extract_text_from_html(doc) == "para one\n\ntwo & three"


def test_malformed_html_is_total():
    """Stray close tags, unclosed elements, nested junk: conversion must not
    raise and must keep the visible text."""
    doc = b"<p>open <b>bold<i>both</p></b></i><table><tr><td>cell"
    out = extract_text_from_html(doc)
    assert "open" in out and "both" in out and "cell" in out


def test_adversarial_deep_nesting_is_total():
    """A 100k-deep element chain must not blow the recursion limit — the
    extractor runs unguarded inside the KG chunk stage, so totality is a
    poison-document defense, not a nicety."""
    deep = "<div>" * 100_000 + "payload text" + "</div>" * 100_000
    out = html_to_markdown(deep)
    assert "payload text" in out
    deep_q = "<blockquote>" * 50_000 + "<p>quoted</p>" + "</blockquote>" * 50_000
    out2 = html_to_markdown(deep_q)
    assert "quoted" in out2


def test_block_elements_inside_inline_contexts_keep_boundaries():
    """Review finding: <p> blocks inside <li>/<td> glued words together
    ('FirstSecond'); block elements in inline contexts must separate."""
    assert html_to_markdown("<ul><li><p>First</p><p>Second</p></li></ul>") == "- First\n  \n  Second"
    out = html_to_markdown("<table><tr><td><p>a</p><p>b</p></td><td>c</td></tr></table>")
    assert "a<br><br>b" in out  # cell newlines become <br> (GFM cells)
    assert "ab" not in out.replace("<br>", " ")
