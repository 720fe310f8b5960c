"""The reference's own parse_md golden suite, ported case-for-case.

Source: /root/reference tests/unit_test/docparser/test_parse_md.py (all 28
cases, including the complex-document integration case). The reference's
Part classes map onto our dict model:

    MarkdownPart -> kind "markdown"     TitlePart -> kind "title"
    TextPart     -> kind "text"         CodePart  -> kind "code"
    AssetBinPart -> kind "asset"        ImagePart -> kind "image"

Every expected content string below is byte-identical to the reference's
expectation; only the class-isinstance checks became kind checks. This is
the differential gate for the from-scratch line-based block parser
(aperag_spark/docparser.py) against the reference's markdown-it walker
(parse_md.py:34-471).
"""

import base64
from hashlib import md5

from aperag_spark.docparser import extract_data_uri, parse_md


def kinds(parts):
    return [p["kind"] for p in parts]


# --- test_parse_md.py:9-14 -------------------------------------------------
def test_parse_md_empty_input():
    parts = parse_md("")
    assert len(parts) == 1
    assert parts[0]["kind"] == "markdown" and parts[0]["content"] == ""


# --- test_parse_md.py:17-25 ------------------------------------------------
def test_parse_md_simple_text():
    input_md = "This is a simple text."
    parts = parse_md(input_md)
    assert len(parts) == 2
    assert parts[0]["kind"] == "markdown" and parts[0]["content"] == input_md
    assert parts[1]["kind"] == "text" and parts[1]["content"] == input_md


# --- test_parse_md.py:28-39 ------------------------------------------------
def test_parse_md_title():
    parts = parse_md("# This is a title\n## level 2")
    assert len(parts) == 3
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "title"
    assert parts[1]["content"] == "# This is a title" and parts[1]["level"] == 1
    assert parts[2]["kind"] == "title"
    assert parts[2]["content"] == "## level 2" and parts[2]["level"] == 2


# --- test_parse_md.py:42-53 ------------------------------------------------
def test_parse_md_lheading_title():
    parts = parse_md("This is a title\n===============\n\nlevel 2\n-------")
    assert len(parts) == 3
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "title"
    assert parts[1]["content"] == "# This is a title" and parts[1]["level"] == 1
    assert parts[2]["kind"] == "title"
    assert parts[2]["content"] == "## level 2" and parts[2]["level"] == 2


# --- test_parse_md.py:56-64 ------------------------------------------------
def test_parse_md_code_block():
    parts = parse_md("    print('Hello, world!')\n")
    assert len(parts) == 2
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "code"
    assert parts[1]["content"] == "```\nprint('Hello, world!')\n```"
    assert parts[1]["lang"] is None


# --- test_parse_md.py:67-75 ------------------------------------------------
def test_parse_md_fence_code_block():
    parts = parse_md("```python\nprint('Hello, world!')\n```")
    assert len(parts) == 2
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "code"
    assert parts[1]["content"] == "```python\nprint('Hello, world!')\n```"
    assert parts[1]["lang"] == "python"


# --- test_parse_md.py:78-86 ------------------------------------------------
def test_parse_md_blockquote_single_line():
    parts = parse_md("> This is a blockquote.")
    assert len(parts) == 2
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "text"
    assert parts[1]["content"] == "> This is a blockquote."


# --- test_parse_md.py:89-97 ------------------------------------------------
def test_parse_md_blockquote_multi_line():
    parts = parse_md("> This is a blockquote.\n> It has multiple lines.")
    assert len(parts) == 2
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "text"
    assert parts[1]["content"] == "> This is a blockquote.\n> It has multiple lines."


# --- test_parse_md.py:100-110 ----------------------------------------------
def test_parse_md_blockquote_with_heading():
    parts = parse_md("> # Blockquoted Heading\n> Some text.")
    assert len(parts) == 3
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "title"
    assert parts[1]["content"] == "> # Blockquoted Heading"
    assert parts[2]["kind"] == "text"
    assert parts[2]["content"] == "> Some text."


# --- test_parse_md.py:113-122 ----------------------------------------------
def test_parse_md_nested_blockquote():
    parts = parse_md("> This is an outer blockquote.\n> > This is a nested blockquote.")
    assert len(parts) == 3
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "text"
    assert parts[1]["content"] == "> This is an outer blockquote."
    assert parts[2]["kind"] == "text"
    assert parts[2]["content"] == "> > This is a nested blockquote."


# --- test_parse_md.py:125-134 ----------------------------------------------
def test_parse_md_blockquote_with_code():
    parts = parse_md("> ```python\n> print('Hello from blockquote!')\n> ```")
    assert len(parts) == 2
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "code"
    # the "> " prefixes are not part of the code block content itself
    assert parts[1]["content"] == "```python\nprint('Hello from blockquote!')\n```"


# --- test_parse_md.py:137-164 ----------------------------------------------
def test_parse_md_blockquote_with_image():
    image_data = b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAQAAAC1HAwCAAAAC0lEQVR42mNkYAAAAAYAAjCB0C8AAAAASUVORK5CYII="
    encoded_data = base64.b64encode(image_data).decode("utf-8")
    mime_type = "image/png"
    data_uri = f"data:{mime_type};base64,{encoded_data}"
    asset_id = md5(image_data).hexdigest()
    input_md = f'> An image: ![the image alt text]({data_uri} "the title")'
    parts = parse_md(input_md)
    assert len(parts) == 4
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "asset"
    assert parts[1]["asset_id"] == asset_id
    assert parts[1]["mime_type"] == mime_type
    assert parts[1]["data"] == image_data

    assert parts[2]["kind"] == "text"
    assert (
        parts[2]["content"]
        == f'> An image: ![the image alt text](asset://{asset_id}?mime_type=image%2Fpng "the title")'
    )

    assert parts[3]["kind"] == "image"
    assert parts[3]["url"] == f"asset://{asset_id}?mime_type=image%2Fpng"
    assert parts[3]["alt_text"] == "the image alt text"
    assert parts[3]["title"] == "the title"


# --- test_parse_md.py:167-174 ----------------------------------------------
def test_parse_md_hr():
    parts = parse_md("---")
    assert len(parts) == 2
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "text"
    assert parts[1]["content"] == "----"


# --- test_parse_md.py:177-184 ----------------------------------------------
def test_parse_md_html_block():
    input_md = "<h1>hello world</h1><p>html block</p>"
    parts = parse_md(input_md)
    assert len(parts) == 2
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "text"
    assert parts[1]["content"] == input_md


# --- test_parse_md.py:187-196 ----------------------------------------------
def test_parse_md_simple_ordered_list():
    parts = parse_md("1. First item\n2. Second item")
    assert len(parts) == 3
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "text" and parts[1]["content"] == "1. First item"
    assert parts[2]["kind"] == "text" and parts[2]["content"] == "2. Second item"


# --- test_parse_md.py:199-208 ----------------------------------------------
def test_parse_md_simple_unordered_list():
    parts = parse_md("- First item\n* Second item")
    assert len(parts) == 3
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "text" and parts[1]["content"] == "- First item"
    assert parts[2]["kind"] == "text" and parts[2]["content"] == "* Second item"


# --- test_parse_md.py:211-222 ----------------------------------------------
def test_parse_md_list_item_multi_paragraph():
    parts = parse_md("1. First item,\nsecond line\n\n   Second paragraph of first item.")
    assert len(parts) == 3
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "text"
    assert parts[1]["content"] == "1. First item,\n   second line"
    assert parts[2]["kind"] == "text"
    # the indentation for the second paragraph is important
    assert parts[2]["content"] == "    Second paragraph of first item."


# --- test_parse_md.py:225-236 ----------------------------------------------
def test_parse_md_list_item_with_image():
    parts = parse_md("1. First item\n\n   Second paragraph contains ![img](http://abc).")
    assert len(parts) == 4
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "text" and parts[1]["content"] == "1. First item"
    assert parts[2]["kind"] == "text"
    assert parts[2]["content"] == "    Second paragraph contains ![img](http://abc)."
    assert parts[3]["kind"] == "image"
    assert parts[3]["url"] == "http://abc"


# --- test_parse_md.py:239-248 ----------------------------------------------
def test_parse_md_nested_ordered_list():
    parts = parse_md("1. Outer item 1\n   1. Inner item 1.1\n   2. Inner item 1.2\n2. Outer item 2")
    assert len(parts) == 5
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["content"] == "1. Outer item 1"
    assert parts[2]["content"] == "    1. Inner item 1.1"
    assert parts[3]["content"] == "    2. Inner item 1.2"
    assert parts[4]["content"] == "2. Outer item 2"


# --- test_parse_md.py:251-260 ----------------------------------------------
def test_parse_md_nested_unordered_list():
    parts = parse_md("- Outer item 1\n  * Inner item 1.1\n  * Inner item 1.2\n- Outer item 2")
    assert len(parts) == 5
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["content"] == "- Outer item 1"
    assert parts[2]["content"] == "    * Inner item 1.1"
    assert parts[3]["content"] == "    * Inner item 1.2"
    assert parts[4]["content"] == "- Outer item 2"


# --- test_parse_md.py:263-275 ----------------------------------------------
def test_parse_md_nested_mixed_list():
    parts = parse_md(
        "1. Outer ordered\n   - Inner unordered 1\n   - Inner unordered 2\n* Outer unordered\n  1. Inner ordered 1"
    )
    assert len(parts) == 6
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["content"] == "1. Outer ordered"
    assert parts[2]["content"] == "    - Inner unordered 1"
    assert parts[3]["content"] == "    - Inner unordered 2"
    assert parts[4]["content"] == "* Outer unordered"
    assert parts[5]["content"] == "    1. Inner ordered 1"


# --- test_parse_md.py:278-285 ----------------------------------------------
def test_parse_md_definitions():
    parts = parse_md('[label1]: url1 (title1)\n[label2]: url2 "title2"')
    assert len(parts) == 3
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["content"] == "[label1]: url1 (title1)"
    assert parts[2]["content"] == "[label2]: url2 (title2)"


# --- test_parse_md.py:288-305 ----------------------------------------------
def test_parse_md_simple_table():
    input_md = """
| Header 1 | Header 2 |
| -------- | -------- |
| Cell 1.1 | Cell 1.2 |
| Cell 2.1 | Cell 2.2 |
"""
    parts = parse_md(input_md.strip())
    assert len(parts) == 2
    assert parts[0]["kind"] == "markdown"
    assert parts[1]["kind"] == "text"
    expected_table_md = """| Header 1 | Header 2 |
|---|---|
| Cell 1.1 | Cell 1.2 |
| Cell 2.1 | Cell 2.2 |"""
    assert parts[1]["content"].strip() == expected_table_md.strip()


# --- test_parse_md.py:308-334 ----------------------------------------------
def test_parse_md_table_with_inline_markdown_and_image():
    image_data = b"testimagedata"
    encoded_data = base64.b64encode(image_data).decode("utf-8")
    mime_type = "image/png"
    data_uri = f"data:{mime_type};base64,{encoded_data}"
    asset_id = md5(image_data).hexdigest()

    input_md = f"""
| Format   | Example                       |
| -------- | ----------------------------- |
| Bold     | **Strong text** \\|           |
| Image    | ![alt text]({data_uri} "title") |
"""
    parts = parse_md(input_md.strip())
    assert len(parts) == 4  # markdown, asset, text (table), image
    assert parts[0]["kind"] == "markdown"
    assert any(p["kind"] == "asset" and p["asset_id"] == asset_id for p in parts)
    assert any(
        p["kind"] == "image" and p["url"] == f"asset://{asset_id}?mime_type=image%2Fpng"
        for p in parts
    )

    table_part = next(p for p in parts if p["kind"] == "text")
    expected_table_md = f"""| Format | Example |
|---|---|
| Bold | **Strong text** \\| |
| Image | ![alt text](asset://{asset_id}?mime_type=image%2Fpng "title") |"""
    assert table_part["content"].strip() == expected_table_md.strip()


# --- test_parse_md.py:337-342 ----------------------------------------------
def test_extract_data_uri_no_data_uri():
    text = "This text has no data URI."
    modified_text, asset_parts = extract_data_uri(text)
    assert modified_text == text
    assert len(asset_parts) == 0


# --- test_parse_md.py:345-359 ----------------------------------------------
def test_extract_data_uri_single_image():
    image_data = b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAQAAAC1HAwCAAAAC0lEQVR42mNkYAAAAAYAAjCB0C8AAAAASUVORK5CYII="
    encoded_data = base64.b64encode(image_data).decode("utf-8")
    mime_type = "image/png"
    data_uri = f"data:{mime_type};base64,{encoded_data}"
    text = f"![alt text]({data_uri})"
    modified_text, asset_parts = extract_data_uri(text)
    assert len(asset_parts) == 1
    assert asset_parts[0]["kind"] == "asset"
    asset_id = md5(image_data).hexdigest()
    assert asset_parts[0]["asset_id"] == asset_id
    assert asset_parts[0]["mime_type"] == mime_type
    assert asset_parts[0]["data"] == image_data
    assert modified_text == f"![alt text](asset://{asset_id}?mime_type=image%2Fpng)"


# --- test_parse_md.py:362-490 ----------------------------------------------
def test_parse_md_complex_document():
    smiley_image_data_b64 = (
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAQAAAC1HAwCAAAAC0lEQVR42mNkYAAAAAYAAjCB0C8AAAAASUVORK5CYII="
    )
    dog_icon_data_b64 = "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"

    smiley_asset_id = md5(base64.b64decode(smiley_image_data_b64)).hexdigest()
    dog_asset_id = md5(base64.b64decode(dog_icon_data_b64)).hexdigest()

    input_md = f"""# Document Title (Level 1)

This is the first paragraph with some **bold text** and *italic text*.
It also includes a [link to OpenAI](https://openai.com).

## Section 1: Lists and Blockquotes (Level 2)

Here's an ordered list:
1. First item.
   - Nested unordered item 1.1
     ```python
     # Code block inside nested list
     print("Hello from nested list code block")
     ```
   - Nested unordered item 1.2 with an image: ![Smiley](data:image/png;base64,{smiley_image_data_b64} "A tiny smiley")
2. Second item of the ordered list.
   > This is a blockquote within a list item.
   > It can span multiple lines.
   > > And even have nested blockquotes!
3. Third item.

And an unordered list:
- Unordered item A.
- Unordered item B, with a
  multi-paragraph content.

  This is the second paragraph of item B.
- Unordered item C.

> This is a top-level blockquote.
> It contains a table:
>
> | Animal | Sound | Image in Table |
> | ------ | ----- | -------------- |
> | Dog    | Woof  | ![Dog Icon](data:image/gif;base64,{dog_icon_data_b64} "Dog") |
> | Cat    | Meow  |                |
>
> And some more text after the table within the blockquote.

---

## Section 2: Code, Tables, and More (Level 2)

An indented code block:

    def greet(name):
        return f"Hello, {{name}}!"

A fenced code block with a language:

```javascript
function sayHi() {{
  console.log('Hi there!');
}}
```

### Subsection 2.1: A More Complex Table (Level 3)

| Feature         | Status      | Notes                                     |
| :-------------- | :---------: | :---------------------------------------- |
| Data URI Images | Implemented | Replaced with `asset://` URLs.            |
| Nested Lists    | Supported   | Both ordered and unordered.               |
| Blockquotes     | Supported   | Including nesting and content like tables.|
| Escaped Chars   | `\\|`        | Pipes `\\|` and newlines `<br>` in cells.  |

Another paragraph after the complex table.

[ref_label]: https://www.example.com "Reference Title"

End of the document.
"""
    parts = parse_md(input_md)

    assert len(parts) > 10
    assert parts[0]["kind"] == "markdown"
    assert parts[0]["content"].startswith("# Document Title (Level 1)")

    asset_ids_found = {p["asset_id"] for p in parts if p["kind"] == "asset"}
    assert smiley_asset_id in asset_ids_found
    assert dog_asset_id in asset_ids_found

    image_urls_found = {p["url"] for p in parts if p["kind"] == "image"}
    assert f"asset://{smiley_asset_id}?mime_type=image%2Fpng" in image_urls_found
    assert f"asset://{dog_asset_id}?mime_type=image%2Fgif" in image_urls_found

    titles = [p for p in parts if p["kind"] == "title"]
    assert any(t["content"] == "# Document Title (Level 1)" and t["level"] == 1 for t in titles)
    assert any(
        t["content"] == "## Section 1: Lists and Blockquotes (Level 2)" and t["level"] == 2 for t in titles
    )
    assert any(
        t["content"] == "### Subsection 2.1: A More Complex Table (Level 3)" and t["level"] == 3 for t in titles
    )

    code_blocks = [p for p in parts if p["kind"] == "code"]
    assert any('print("Hello from nested list code block")' in cb["content"] and cb["lang"] == "python" for cb in code_blocks)
    assert any("console.log('Hi there!');" in cb["content"] and cb["lang"] == "javascript" for cb in code_blocks)
    assert any("def greet(name):" in cb["content"] and cb["lang"] is None for cb in code_blocks)

    text_parts = [p for p in parts if p["kind"] == "text"]
    assert any("| Animal | Sound | Image in Table |" in tp["content"] for tp in text_parts)
    assert any("![Dog Icon]" in tp["content"] for tp in text_parts)
    assert any("| Feature | Status | Notes |" in tp["content"] for tp in text_parts)

    assert any("1. First item." in tp["content"] for tp in text_parts)
    assert any("    - Nested unordered item 1.1" in tp["content"] for tp in text_parts)
    assert any("    - Nested unordered item 1.2 with an image: ![Smiley]" in tp["content"] for tp in text_parts)
    assert any("    > > And even have nested blockquotes!" in tp["content"] for tp in text_parts)

    assert any(tp["content"] == "[ref_label]: https://www.example.com (Reference Title)" for tp in text_parts)
