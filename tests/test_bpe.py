"""Vendored BPE engine + tokenizer-factory wiring tests.

The real o200k_base rank file isn't available in this sandbox; these tests
prove the ENGINE and the SWAP POINT with a synthetic rank file (256 byte
tokens + known merges), plus a skip-gated fidelity test that runs wherever
tiktoken is actually installed."""

import base64
import os

import pytest

from aperag_spark.bpe import BpeEncoding, bpe_merge, load_tiktoken_bpe


def _mini_ranks():
    """256 single-byte tokens (rank = byte value) + merges."""
    ranks = {bytes([b]): b for b in range(256)}
    ranks[b"he"] = 256
    ranks[b"ll"] = 257
    ranks[b"llo"] = 258
    ranks[b"hello"] = 259
    ranks[b" w"] = 260  # intermediate: every token must be pair-buildable
    ranks[b" wo"] = 261
    return ranks


def test_bpe_merge_lowest_rank_first():
    ranks = _mini_ranks()
    # merges: h+e(256) first, l+l(257), then ll+o(258) — 'hello' itself is
    # NOT reachable because merge only combines adjacent PAIRS present in
    # the table: he+llo is rank 259 → final merge
    assert bpe_merge(b"hello", ranks) == [259]
    assert bpe_merge(b"llo", ranks) == [258]
    # unmergeable bytes stay singles
    assert bpe_merge(b"xy", ranks) == [ord("x"), ord("y")]


def test_encoding_roundtrip_and_pretokenizer():
    enc = BpeEncoding(_mini_ranks())
    text = "hello world, it's 12345 lines\n\nnext"
    toks = enc.encode(text)
    assert enc.decode(toks) == text  # lossless: all 256 bytes in vocab
    assert 259 in toks  # 'hello' merged
    assert 261 in toks  # ' wo' merged (space-prefixed pretoken piece)
    # o200k pattern: numbers split in groups of ≤3 → '123','45' pieces
    pieces = [enc.decode([t]) if t < 256 else "" for t in toks]
    assert "".join(pieces).count("1") == 1


def test_rank_file_loading(tmp_path):
    ranks = _mini_ranks()
    p = tmp_path / "mini.tiktoken"
    with open(p, "wb") as f:
        for tok, rank in ranks.items():
            f.write(base64.b64encode(tok) + b" " + str(rank).encode() + b"\n")
    loaded = load_tiktoken_bpe(str(p))
    assert loaded == ranks


def test_factory_swap_point(tmp_path, monkeypatch):
    """get_tokenizer() must actually switch to the BPE engine when a rank
    file is provided — the round-1 swap point was dead code (ADVICE.md)."""
    ranks = _mini_ranks()
    p = tmp_path / "mini.tiktoken"
    with open(p, "wb") as f:
        for tok, rank in ranks.items():
            f.write(base64.b64encode(tok) + b" " + str(rank).encode() + b"\n")
    monkeypatch.setenv("APERAG_SPARK_TIKTOKEN_PATH", str(p))
    from aperag_spark.textproc import TiktokenTokenizer, chunking_by_token_size, get_tokenizer

    tok = get_tokenizer()
    assert isinstance(tok, TiktokenTokenizer)
    # chunker is tokenizer-agnostic: windows over BPE ids decode losslessly
    text = "hello world " * 50
    chunks = chunking_by_token_size(tok, text, max_token_size=30, overlap_token_size=5)
    assert len(chunks) > 1
    assert all(c["tokens"] <= 30 for c in chunks)
    # stride reconstruction: first chunk is a prefix of the text
    assert text.startswith(chunks[0]["content"][: len(chunks[0]["content"])])


def test_factory_fallback(monkeypatch):
    monkeypatch.delenv("APERAG_SPARK_TIKTOKEN_PATH", raising=False)
    from aperag_spark.textproc import Tokenizer, get_tokenizer

    t = get_tokenizer()
    assert type(t) is Tokenizer or hasattr(t, "_enc")  # tiktoken if installed


@pytest.mark.skipif(
    not (
        os.environ.get("APERAG_SPARK_TIKTOKEN_PATH")
        or __import__("importlib").util.find_spec("tiktoken")
    ),
    reason="real o200k_base encoding unavailable (no tiktoken, no rank file)",
)
def test_real_o200k_chunk_ids_match_reference_semantics():
    """With the real encoding available, chunk boundaries must follow the
    reference's encode→slice→decode exactly (operate.py:71-115): windows of
    max_token_size ids at stride (max-overlap), decoded then stripped."""
    from aperag_spark.textproc import TiktokenTokenizer, chunking_by_token_size

    tok = TiktokenTokenizer()
    text = ("The quick brown fox jumps over the lazy dog. " * 200).strip()
    ids = tok.encode(text)
    out = chunking_by_token_size(tok, text, max_token_size=100, overlap_token_size=10)
    for i, ch in enumerate(out):
        start = i * 90
        expect = tok.decode(ids[start : start + 100]).strip()
        assert ch["content"] == expect
        assert ch["tokens"] == min(100, len(ids) - start)
