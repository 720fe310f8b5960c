"""The reference's Rechunker/SimpleSemanticSplitter golden suite, ported.

Source: /root/reference tests/unit_test/docparser/test_chunking.py, adapted
to the functional rechunker (operators/rechunk.rechunk_parts /
SemanticSplitter). Expected values below were captured from a LIVE run of
the reference implementation (aperag/docparser/chunking.py) with the same
mock tokenizers — necessary because one reference test
(test_rechunking_with_title_merge_prevention) is stale and FAILS against
the reference's own code: the code emits each chunk with the title stack
INCLUDING the group's own title (chunking.py:83-87 pushes before
rendering), while the test file expects the parent-only stack. Behavioral
parity targets the code, not the stale expectation; our outputs match the
live reference byte-for-byte on every case here, including the
bisection+overlap splitter path.

(Source-map metadata merge tests are not ported: this data model carries
doc_id/chunk_index provenance instead of md/pdf source maps.)
"""

from aperag_spark.operators.rechunk import SemanticSplitter, rechunk_parts


class WTok:  # mock_tokenizer: token per word, test_chunking.py:8-10
    def encode(self, s):
        return [len(w) for w in s.split()]


class CTok:  # mock_char_tokenizer: token per char, test_chunking.py:13-15
    def encode(self, s):
        return [ord(c) for c in s]


def T(c):
    return {"kind": "text", "level": 0, "content": c}


def H(c, lvl):
    return {"kind": "title", "level": lvl, "content": c}


def contents(chunks):
    return [c["content"] for c in chunks]


# --- test_chunking.py:39-54 (live-verified) ---------------------------------
def test_rechunking_no_merge():
    out = rechunk_parts(
        [T("This is a short text."), T("This is another short text."),
         T("A longer text that will not fit in one chunk.")],
        8, 0, WTok(),
    )
    assert contents(out) == [
        "This is a short text.",
        "This is another short text.",
        "A longer text that will not fit in ",
        "one chunk.",
    ]


# --- test_chunking.py:57-70 --------------------------------------------------
def test_rechunking_with_merge():
    out = rechunk_parts(
        [T("Short text 1."), T("Short text 2."),
         T("This is a slightly longer text 3.")],
        10, 0, WTok(),
    )
    assert contents(out) == [
        "Short text 1.\n\nShort text 2.",
        "This is a slightly longer text 3.",
    ]


# --- test_chunking.py:73-115, corrected to the code's actual behavior -------
def test_rechunking_with_title_merge_prevention():
    parts = [
        T("Intro text"), H("# Main Title", 1), T("Content under main title"),
        H("## Subtitle 1", 2), T("Content under subtitle 1"),
        H("## Subtitle 2", 2), T("Content under subtitle 2"),
        H("# Main Title 2", 1), T("Content under main title 2"),
    ]
    out = rechunk_parts(parts, 6, 0, WTok())
    assert [(c["content"], c["titles"]) for c in out] == [
        ("Intro text", []),
        ("# Main Title", ["# Main Title"]),
        ("Content under main title", ["# Main Title"]),
        ("## Subtitle 1", ["# Main Title", "## Subtitle 1"]),
        ("Content under subtitle 1", ["# Main Title", "## Subtitle 1"]),
        ("## Subtitle 2", ["# Main Title", "## Subtitle 2"]),
        ("Content under subtitle 2", ["# Main Title", "## Subtitle 2"]),
        ("# Main Title 2", ["# Main Title 2"]),
        ("Content under main title 2", ["# Main Title 2"]),
    ]


# --- test_chunking.py:224-231 (splitter _fit) --------------------------------
def test_splitter_fit():
    sp = SemanticSplitter(WTok())
    assert sp._fit("Short text", 10)
    assert not sp._fit("This is a longer text", 4)


# --- test_chunking.py:234-241 ------------------------------------------------
def test_splitter_recursive_split():
    sp = SemanticSplitter(WTok())
    chunks = sp._split("This is a sentence. Another sentence here!", 6, 2, 0)
    assert chunks == ["This is a sentence.", " Another sentence here!"]


# --- test_chunking.py:244-249 ------------------------------------------------
def test_splitter_cut_right_side():
    sp = SemanticSplitter(WTok())
    assert sp._cut_right("A long phrase that needs cutting", 5) == " long phrase that needs cutting"


# --- test_chunking.py:252-257 ------------------------------------------------
def test_splitter_merge_small_chunks():
    sp = SemanticSplitter(WTok())
    merged = sp._merge_small(["small chunk 1", "small chunk 2", "slightly larger chunk"], 15)
    assert merged == ["small chunk 1small chunk 2slightly larger chunk"]


# --- test_chunking.py:260-265 ------------------------------------------------
def test_splitter_split():
    sp = SemanticSplitter(WTok())
    chunks = sp.split(
        "This is a test with multiple sentences. Some are short. Others are longer and more complex.",
        15, 3,
    )
    assert chunks == [
        "This is a test with multiple sentences. Some are short.",
        " Others are longer and more complex.",
    ]


# --- test_chunking.py:291-297 (bisection path, live-verified exact) ----------
def test_splitter_long_text_no_separators():
    chunks = SemanticSplitter(CTok()).split("A" * 100, 20, 5)
    assert chunks == [
        "A" * 12, "A" * 18, "A" * 15, "A" * 20, "A" * 13,
        "A" * 19, "A" * 16, "A" * 11, "A" * 16,
    ]
    assert all(len(c) <= 20 for c in chunks)


# --- test_chunking.py:268-279 ------------------------------------------------
def test_rechunker_with_empty_parts_and_groups():
    out = rechunk_parts([T(""), H("", 1), T("Valid Content")], 10, 0, WTok())
    assert contents(out) == ["Valid Content"]


# --- test_chunking.py:282-294 (live-verified exact) ---------------------------
def test_rechunker_edge_case_large_title():
    out = rechunk_parts([H("# " + "A" * 40, 1), T("Normal Content")], 35, 0, CTok())
    assert [(c["content"], c["titles"]) for c in out] == [
        ("# " + "A" * 20, ["# " + "A" * 40]),
        ("A" * 20 + "\n\nNormal Content", ["# " + "A" * 40]),
    ]


# --- test_chunking.py:300-304 (live-verified exact) ---------------------------
def test_rechunker_with_overlapping_chunks():
    out = rechunk_parts([T("SentenceOneSentenceTwoSentenceThree")], 20, 5, CTok())
    assert contents(out) == ["SentenceOneSenten", "entenceTwoS", "eTwoSentenceThree"]
    assert len("".join(contents(out))) > len("SentenceOneSentenceTwoSentenceThree")
