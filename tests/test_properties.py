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

# --- round 2: BPE engine + markdown parser invariants ---

import base64


def _full_byte_ranks():
    ranks = {bytes([b]): b for b in range(256)}
    # a few arbitrary merges on top
    for i, tok in enumerate([b"th", b"the", b"in", b"ing", b"  "]):
        ranks[tok] = 256 + i
    return ranks


_BPE = None


def _bpe():
    global _BPE
    if _BPE is None:
        from aperag_spark.bpe import BpeEncoding

        _BPE = BpeEncoding(_full_byte_ranks())
    return _BPE


@given(text_strategy)
@settings(max_examples=150, deadline=None)
def test_bpe_roundtrip_lossless(s):
    """With all 256 byte tokens in the vocab, decode(encode(x)) == x for
    ANY unicode text — the invariant chunking_by_token_size rests on."""
    enc = _bpe()
    assert enc.decode(enc.encode(s)) == s


@given(st.binary(min_size=1, max_size=40))
@settings(max_examples=150, deadline=None)
def test_bpe_merge_partition_property(piece):
    """bpe_merge output always re-concatenates to the input bytes and every
    part is a vocab token."""
    from aperag_spark.bpe import bpe_merge

    ranks = _full_byte_ranks()
    toks = bpe_merge(piece, ranks)
    inv = {v: k for k, v in ranks.items()}
    assert b"".join(inv[t] for t in toks) == piece


@given(text_strategy)
@settings(max_examples=150, deadline=None)
def test_markdown_parser_never_crashes(s):
    """parse_md is total: any text yields a Part stream with the Markdown
    part first, valid kinds, and title levels in 1..6."""
    from aperag_spark.docparser import parse_md

    parts = parse_md(s)
    assert parts and parts[0]["kind"] == "markdown"
    for p in parts:
        assert p["kind"] in {"markdown", "asset", "title", "text", "code", "image"}
        if p["kind"] == "title":
            assert 1 <= p["level"] <= 6


@given(text_strategy)
@settings(max_examples=150, deadline=None)
def test_html_converter_never_crashes(s):
    """html_to_markdown is total on arbitrary text (tag soup, stray
    brackets, entities): it must never raise — it runs unguarded inside the
    KG chunk stage — and its output must feed parse_md without error."""
    from aperag_spark.docparser import parse_md
    from aperag_spark.htmlmd import html_to_markdown

    md = html_to_markdown(s)
    assert isinstance(md, str)
    parse_md(md)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=60))
@settings(max_examples=100, deadline=None)
def test_markdown_fence_preserves_code_verbatim(body):
    """A fenced block's inner lines survive parsing verbatim (modulo the
    documented strip) inside the rendered CodePart."""
    from aperag_spark.docparser import parse_md

    md = f"```\n{body}\n```"
    code = [p for p in parse_md(md) if p["kind"] == "code"]
    assert len(code) == 1
    inner = code[0]["content"].split("\n")[1:-1]
    assert "\n".join(inner) == body.strip()


def test_corpus_stats_approx_within_rank_bound(spark):
    """The exact=False corpus_stats path (approx_percentile, the 100 TB
    swap documented in q_corpus_stats) must agree with the exact path
    within approx_percentile's rank-error guarantee: the approx value lies
    between the exact percentiles at p ± 1/accuracy. Checked at 3 SFs; the
    non-percentile columns must be identical."""
    import pyspark.sql.functions as F

    from aperag_spark.queries import _t, _words, q_corpus_stats

    acc = 1000
    eps = 1.0 / acc
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        exact = q_corpus_stats(spark, sf_dir, exact=True).collect()[0]
        approx = q_corpus_stats(spark, sf_dir, exact=False, accuracy=acc).collect()[0]
        for col in ("n_docs", "total_tokens", "vocab_size"):
            assert approx[col] == exact[col], (sf, col)
        bounds = (
            _t(spark, sf_dir, "documents")
            .select(F.size(_words()).cast("double").alias("n_tokens"))
            .agg(
                *[
                    F.expr(f"percentile(n_tokens, {q})").alias(f"b{i}")
                    for i, q in enumerate(
                        (0.5 - eps, 0.5 + eps, 0.9 - eps, 0.9 + eps)
                    )
                ]
            )
            .collect()[0]
        )
        assert bounds["b0"] <= approx["median_tokens"] <= bounds["b1"], sf
        assert bounds["b2"] <= approx["p90_tokens"] <= bounds["b3"], sf
