"""C5 rechunker semantics (reference chunking.py:21-318) — pure-python unit
tests plus the Spark flat-map wrapper."""

from aperag_spark.operators.rechunk import (
    SemanticSplitter,
    parse_markdown_parts,
    rechunk_parts,
)
from aperag_spark.textproc import Tokenizer

TOK = Tokenizer()


def _ntok(s):
    return len(TOK.encode(s))


def test_parse_markdown_parts():
    parts = parse_markdown_parts("# Top\n\npara one\n\n## Sub\n\npara two")
    kinds = [(p["kind"], p["level"]) for p in parts]
    assert kinds == [("title", 1), ("text", 0), ("title", 2), ("text", 0)]


def test_groups_merge_within_budget():
    parts = parse_markdown_parts("# A\n\nshort one\n\n# B\n\nshort two")
    out = rechunk_parts(parts, chunk_size=400, chunk_overlap=20)
    # everything fits in one chunk; titles of the FIRST group captured
    assert len(out) == 1
    assert "short one" in out[0]["content"] and "short two" in out[0]["content"]


def test_no_merge_main_heading_under_subheading():
    # chunking.py:96-100: a group with a higher title level (smaller number)
    # must not merge into a part whose highest level is deeper
    big = " ".join(f"w{i}" for i in range(380))
    parts = parse_markdown_parts(f"## Sub\n\n{big}\n\n# Main\n\nmain text")
    out = rechunk_parts(parts, chunk_size=400, chunk_overlap=20)
    assert len(out) >= 2
    assert any("main text" in c["content"] and "Sub" not in " ".join(c["titles"]) for c in out)


def test_title_stack():
    parts = parse_markdown_parts(
        "# H1\n\n" + " ".join(f"a{i}" for i in range(390)) + "\n\n## H2\n\n"
        + " ".join(f"b{i}" for i in range(390)) + "\n\n## H3\n\nlast"
    )
    out = rechunk_parts(parts, chunk_size=400, chunk_overlap=20)
    last_chunk = [c for c in out if "last" in c["content"]][0]
    # reference behavior (chunking.py:96-110,155-161): the equal-level H3
    # group merges into the open H2 part when it fits, and a merged part
    # KEEPS the titles captured at its creation
    assert last_chunk["titles"] == ["H1", "H2"]
    assert "H3" in last_chunk["content"]
    # the H1 body chunk does not carry H2/H3
    h1_chunk = [c for c in out if "a0 " in c["content"]][0]
    assert h1_chunk["titles"] == ["H1"]


def test_splitter_respects_chunk_size_and_overlap():
    sp = SemanticSplitter(TOK)
    text = ". ".join(f"sentence number {i} with several words" for i in range(120)) + "."
    chunks = sp.split(text, 50, 5)
    assert len(chunks) > 1
    assert all(_ntok(c) <= 50 for c in chunks)
    # lossless prefix property at separator levels: concatenation == input
    assert "".join(chunks) == text


def test_splitter_bisection_fallback_converges():
    sp = SemanticSplitter(TOK)
    # no separators at all → bisection path (chunking.py:246-264)
    text = "x" * 5000
    chunks = sp.split(text, 20, 4)
    assert chunks and all(_ntok(c) <= 20 for c in chunks)


def test_spark_flatmap(spark):
    from aperag_spark.operators.rechunk import rechunk_documents

    rows = [
        ("d1", "# T\n\n" + " ".join(f"w{i}" for i in range(900))),
        ("d2", "plain short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = rechunk_documents(df, chunk_size=100, chunk_overlap=10).collect()
    d1 = [r for r in out if r["doc_id"] == "d1"]
    assert len(d1) > 3 and all(r["tokens"] <= 101 for r in d1)
    # full parser (default): group title is the complete TitlePart content
    # INCLUDING its '#' markup (reference chunking.py:57-59)
    assert all(r["titles"] == ["# T"] for r in d1)
    assert [r["chunk_index"] for r in sorted(d1, key=lambda r: r.chunk_index)] == list(
        range(len(d1))
    )
    # round-1 simple parser path keeps hash-less titles
    legacy = rechunk_documents(df, chunk_size=100, chunk_overlap=10, parser="simple")
    assert all(
        r["titles"] == ["T"] for r in legacy.collect() if r["doc_id"] == "d1"
    )
