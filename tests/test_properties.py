"""Property-based tests (hypothesis) for the pure-Python kernel — the
invariants the whole pipeline rests on."""

from hypothesis import given, settings
from hypothesis import strategies as st

from aperag_spark.operators.rechunk import SemanticSplitter
from aperag_spark.textproc import (
    Tokenizer,
    chunking_by_token_size,
    clean_str,
    normalize_extracted_info,
    parse_extraction_result,
    split_string_by_multi_markers,
)

TOK = Tokenizer()

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_tokenizer_roundtrip_lossless(s):
    assert TOK.decode(TOK.encode(s)) == s


@given(text_strategy, st.integers(5, 40), st.integers(0, 4))
@settings(max_examples=100, deadline=None)
def test_chunking_invariants(s, size, overlap):
    chunks = chunking_by_token_size(
        TOK, s, overlap_token_size=overlap, max_token_size=size
    )
    n = len(TOK.encode(s))
    stride = size - overlap
    assert len(chunks) == (0 if n == 0 else len(range(0, n, stride)))
    for i, ch in enumerate(chunks):
        assert ch["chunk_order_index"] == i
        assert ch["tokens"] == min(size, n - i * stride)
        assert ch["content"] == ch["content"].strip()
        assert len(TOK.encode(ch["content"])) <= ch["tokens"]  # strip only removes


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_clean_str_idempotent_and_control_free(s):
    once = clean_str(s)
    assert not any("\x00" <= c <= "\x1f" or "\x7f" <= c <= "\x9f" for c in once)


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(s):
    once = normalize_extracted_info(s, is_entity=True)
    assert normalize_extracted_info(once, is_entity=True) == once


@given(text_strategy)
@settings(max_examples=200, deadline=None)
def test_parser_never_crashes_and_drops_garbage(s):
    ents, rels = parse_extraction_result(s)
    for e in ents:
        assert e["entity_name"] == e["entity_name"] and e["description"]
    for r in rels:
        assert r["src_id"] != r["tgt_id"]
        assert isinstance(r["weight"], float)


@given(
    st.lists(st.sampled_from(["##", "<|>", "<|COMPLETE|>"]), min_size=1, max_size=3),
    text_strategy,
)
@settings(max_examples=100, deadline=None)
def test_split_markers_no_empties(markers, s):
    # (with NO markers the reference returns [content] verbatim,
    # utils.py:226-228 — stripping only happens on actual splits)
    parts = split_string_by_multi_markers(s, markers)
    assert all(p.strip() == p and p for p in parts)


@given(
    st.text(alphabet=" abcdefg.\n,;", min_size=0, max_size=600),
    st.integers(5, 30),
    st.integers(0, 3),
)
@settings(max_examples=60, deadline=None)
def test_semantic_splitter_fits_and_covers(s, size, overlap):
    sp = SemanticSplitter(TOK)
    chunks = sp.split(s, size, overlap)
    assert all(len(TOK.encode(c)) <= size or len(c) <= 1 for c in chunks)
    if s:
        assert chunks, "non-empty input must produce chunks"
        # every chunk is a substring of the input (overlap may duplicate, but
        # nothing is invented)
        assert all(c in s for c in chunks)