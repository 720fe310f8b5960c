"""S2/S3 multi-format parser tests: markdown→Part stream fidelity to the
reference's rendering rules (parse_md.py:34-471) and registry dispatch over
a mixed corpus (doc_parser.py:31-76)."""

import pytest

from aperag_spark.docparser import (
    extract_data_uri,
    parse_document,
    parse_md,
    parts_for_rechunk,
)

MD = """# Top

Intro **bold**
second line.

## Sub

- one
- two
  cont
  - deep

1. a
5. b

> quote line
> ## nested title

```python
print("```")
```

| h1 | h2 |
|---|---|
| a | b\\|c |

Setext
======
"""


def _blocks(md):
    return [p for p in parse_md(md) if p["kind"] not in ("markdown", "asset")]


def test_headings_atx_and_setext():
    parts = _blocks(MD)
    titles = [(p["content"], p["level"]) for p in parts if p["kind"] == "title" and p["nesting"] == 0]
    # TitlePart content = '#'*level + ' ' + text (parse_md.py:272-275)
    assert ("# Top", 1) in titles and ("## Sub", 2) in titles
    assert ("# Setext", 1) in titles  # lheading '=' → level 1 (parse_md.py:266-271)


def test_code_fence_backtick_escalation():
    parts = _blocks(MD)
    code = [p for p in parts if p["kind"] == "code"]
    assert len(code) == 1 and code[0]["lang"] == "python"
    # the body contains ``` so the wrapper escalates to ```` (parse_md.py:223-233)
    assert code[0]["content"].startswith("````python\n")
    assert code[0]["content"].endswith("\n````")


def test_lists_markers_and_nesting():
    parts = _blocks(MD)
    texts = [p["content"] for p in parts if p["kind"] == "text"]
    assert "- one" in texts
    # continuation lines aligned under the marker (parse_md.py:343-355)
    assert "- two\n  cont" in texts
    # nested items get the 4-space part indent (parse_md.py:366-375)
    assert "    - deep" in texts
    # ordered items renumber sequentially from the first (parse_md.py:327-333)
    assert "1. a" in texts and "2. b" in texts


def test_blockquote_prefix_and_nested_title():
    parts = _blocks(MD)
    quoted = [p for p in parts if p["content"] and p["content"].startswith("> ")]
    assert any(p["content"] == "> quote line" for p in quoted)
    # the nested heading keeps its TitlePart kind with nesting=1 — the
    # rechunker must NOT open a group for it mid-stream (chunking.py:66-70;
    # grouping rule lives in rechunk_parts, nesting travels on the part)
    nt = [p for p in parts if p["kind"] == "title" and p["nesting"] == 1]
    assert len(nt) == 1 and nt[0]["content"] == "> ## nested title"
    rk = parts_for_rechunk(parse_md(MD))
    nested = [r for r in rk if r.get("nesting") == 1 and r["kind"] == "title"]
    assert len(nested) == 1 and nested[0]["content"] == "> ## nested title"


def test_table_rendering():
    parts = _blocks(MD)
    tables = [p for p in parts if p["content"] and p["content"].startswith("| h1")]
    assert len(tables) == 1
    lines = tables[0]["content"].split("\n")
    assert lines[0] == "| h1 | h2 |"
    assert lines[1] == "|---|---|"  # regenerated from column count (parse_md.py:417-421)
    assert lines[2] == "| a | b\\|c |"  # cell pipe escaped (parse_md.py:432-436)


def test_data_uri_asset_extraction():
    md = '![x](data:image/png;base64,aGVsbG8=) tail'
    rewritten, assets = extract_data_uri(md)
    assert len(assets) == 1
    a = assets[0]
    assert a["mime_type"] == "image/png" and a["data"] == b"hello"
    assert f"asset://{a['asset_id']}" in rewritten
    # malformed URI left untouched (parse_md.py:66-68)
    bad = "![x](data:image/png;base64,!!!notbase64???)"
    same, none = extract_data_uri(bad)
    assert same == bad and none == []


def test_registry_dispatch_mixed_corpus():
    md_doc = b"# Hello\n\nworld"
    html_doc = b"<html><p>para one</p><p>two &amp; three</p></html>"
    txt_doc = b"  plain text  "
    md_parts = parse_document("https://x/doc.md", md_doc)
    assert md_parts[0]["kind"] == "markdown"
    assert [p["content"] for p in md_parts[1:]] == ["# Hello", "world"]
    html_parts = parse_document("https://x/page.html", html_doc)
    # byte-identical extraction invariant: same extractor as the KG path
    from aperag_spark.textproc import extract_text_from_html

    assert html_parts[0]["content"] == extract_text_from_html(html_doc)
    assert [p["content"] for p in html_parts[1:]] == ["para one", "two & three"]
    txt_parts = parse_document("file:///notes.txt", txt_doc)
    assert txt_parts[1]["content"] == "plain text"
    with pytest.raises(NotImplementedError):
        parse_document("a.pdf", b"%PDF-1.4")
    # unknown extension → html fallback (doc_parser.py:51-76 chain)
    assert parse_document("mystery.xyz", html_doc)[1]["content"] == "para one"


def test_parse_pages_operator(spark):
    from aperag_spark.operators.parsing import parse_pages

    rows = [
        ("https://a/x.md", bytearray(b"# T\n\nbody")),
        ("https://a/y.html", bytearray(b"<p>hi</p>")),
        ("https://a/z.pdf", bytearray(b"%PDF")),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    out = parse_pages(pages).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r)
    md = sorted(by_url["https://a/x.md"], key=lambda r: r["part_index"])
    assert [r["kind"] for r in md] == ["markdown", "title", "text"]
    assert md[1]["content"] == "# T" and md[1]["level"] == 1
    # poisoned format degrades to an error row, batch survives
    assert by_url["https://a/z.pdf"][0]["kind"] == "error"


def test_parse_pages_generic_crash_quarantined(spark):
    """A parser crash that is NOT NotImplementedError must also degrade to an
    error row instead of killing the stage (ADVICE r2): a NULL html payload
    raises TypeError inside the parse closure."""
    from aperag_spark.operators.parsing import parse_pages

    rows = [
        ("https://a/ok.md", bytearray(b"fine")),
        ("https://a/null.html", None),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    out = parse_pages(pages).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r)
    assert any(r["kind"] == "text" for r in by_url["https://a/ok.md"])
    bad = by_url["https://a/null.html"]
    assert len(bad) == 1 and bad[0]["kind"] == "error" and bad[0]["content"]


def test_deep_nested_list_parses_linearly():
    """ADVICE r2 (high): _parse_list was invoked twice per list head, doubling
    work per nesting level — 22 nested bullets already exceeded 20s. Must be
    linear now: 48 levels parse instantly and render the deepest item."""
    import time

    md = "\n".join("  " * i + f"- item{i}" for i in range(48))
    t0 = time.monotonic()
    parts = parse_md(md)
    assert time.monotonic() - t0 < 5.0
    texts = [p["content"] or "" for p in parts if p["kind"] == "text"]
    assert any("item47" in t for t in texts)


def test_nesting_depth_cap_terminates():
    """Past _MAX_NEST_DEPTH the body is emitted as raw text — an adversarial
    200-deep blockquote must terminate and keep its content."""
    md = ">" * 200 + " deep payload"
    parts = parse_md(md)
    assert any("deep payload" in (p["content"] or "") for p in parts if p["kind"] == "text")


def test_html_block_and_table_interrupt_list_item():
    """Review finding: html blocks and GFM tables are paragraph interrupters
    in markdown-it (parse_md.py:295-301, 393-430) — they must END a list
    item's lazy paragraph, not be absorbed into it."""
    parts = _blocks("- item\n<div>x</div>")
    texts = [p["content"] for p in parts if p["kind"] == "text"]
    assert "- item" in texts
    assert "<div>x</div>" in texts  # its own raw html TextPart
    parts2 = _blocks("- item\n| a | b |\n|---|---|\n| 1 | 2 |")
    texts2 = [p["content"] for p in parts2 if p["kind"] == "text"]
    assert "- item" in texts2
    assert any(t.startswith("| a | b |") for t in texts2)
