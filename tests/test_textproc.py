"""Unit tests for the pure-Python kernel — each asserts a cited reference
behavior (SURVEY.md §2.2/2.3)."""

import pytest

from aperag_spark import COMPLETION_DELIMITER, TUPLE_DELIMITER
from aperag_spark.textproc import (
    Tokenizer,
    chunking_by_token_size,
    clean_str,
    compute_mdhash_id,
    deterministic_extract,
    extract_text_from_html,
    handle_single_entity,
    handle_single_relationship,
    is_float_regex,
    normalize_extracted_info,
    parse_extraction_result,
    split_string_by_multi_markers,
)

TOK = Tokenizer()
D = TUPLE_DELIMITER


def test_tokenizer_lossless_roundtrip():
    for text in [
        "",
        "hello world",
        "  leading and trailing  ",
        "multi\n\nparagraph text, with punct! and 'quotes'",
        "emoji 🎉 and 中文 字符 mixed",
        "don't can't we'll they've",
    ]:
        assert TOK.decode(TOK.encode(text)) == text


@pytest.mark.parametrize("n_tokens", [0, 1, 1099, 1100, 1101, 1199, 1200, 1201, 2300, 2301])
def test_chunk_boundaries(n_tokens):
    # operate.py:71-115: windows of 1200, stride 1100, tokens=min(1200, rem)
    text = " ".join(f"w{i}" for i in range(n_tokens))
    tokens = TOK.encode(text)
    chunks = chunking_by_token_size(TOK, text, overlap_token_size=100, max_token_size=1200)
    n = len(tokens)
    expected = 0 if n == 0 else len(range(0, n, 1100))
    assert len(chunks) == expected
    for i, ch in enumerate(chunks):
        assert ch["chunk_order_index"] == i
        assert ch["tokens"] == min(1200, n - i * 1100)
        assert ch["content"] == TOK.decode(tokens[i * 1100 : i * 1100 + 1200]).strip()


def test_chunk_strip_and_overlap():
    text = "  " + " ".join(f"tok{i}" for i in range(1500)) + "  "
    chunks = chunking_by_token_size(TOK, text, overlap_token_size=100, max_token_size=1200)
    assert len(chunks) == 2
    # overlap: last 100 tokens of window 1 == first 100 of window 2 region
    assert chunks[0]["content"] == chunks[0]["content"].strip()


def test_clean_str():
    # utils.py:236-245: unescape, strip, drop control chars
    assert clean_str('  A &amp; B\x01\x9f  ') == "A & B"
    assert clean_str(5) == 5


def test_is_float_regex():
    assert is_float_regex("3.5") and is_float_regex("-2") and is_float_regex("+0.1")
    assert not is_float_regex("strong") and not is_float_regex("1.2.3")


def test_split_multi_markers():
    assert split_string_by_multi_markers("a##b<|COMPLETE|>c", ["##", "<|COMPLETE|>"]) == [
        "a",
        "b",
        "c",
    ]
    assert split_string_by_multi_markers(" x ", []) == [" x "]


def test_normalize_extracted_info():
    # utils.py:417-464
    assert normalize_extracted_info('"Quoted"') == "Quoted"
    assert normalize_extracted_info("'Quoted'", is_entity=True) == "Quoted"
    assert normalize_extracted_info("（x）") == "(x)"
    assert normalize_extracted_info("中 文") == "中文"
    assert normalize_extracted_info("中 文 abc") == "中文abc"
    # the reference KEEPS curly quotes for entities: its source's curly-quote
    # replaces are mangled into a triple-quoted string (utils.py:459), so
    # only straight apostrophes (and the artifact substring) are removed —
    # verified against the executing reference code (test_live_reference_fuzz)
    assert normalize_extracted_info("“中文”", is_entity=True) == "“中文”"
    assert normalize_extracted_info("O'Brien", is_entity=True) == "OBrien"
    assert normalize_extracted_info("O'Brien", is_entity=False) == "O'Brien"
    assert normalize_extracted_info('a, "").replace(b', is_entity=True) == "ab"
    assert normalize_extracted_info("中'文", is_entity=True) == "中文"


def test_entity_record_rules():
    # <4 attrs dropped — operate.py:157
    assert handle_single_entity(['"entity"', '"A"', '"person"']) is None
    # wrong discriminator
    assert handle_single_entity(['"x"', '"A"', '"person"', '"d"']) is None
    # empty name dropped (pre-normalization check, operate.py:161-163)
    assert handle_single_entity(['"entity"', "", '"person"', '"d"']) is None
    # reference quirk: '""' passes the emptiness check BEFORE normalization
    # strips the quotes, so an empty-name entity IS emitted (operate.py:161-167)
    assert handle_single_entity(['"entity"', '""', '"person"', '"d"'])["entity_name"] == ""
    ok = handle_single_entity(['"entity"', '"Ada Lovelace"', '"person"', '"a pioneer"'])
    assert ok == {
        "entity_name": "Ada Lovelace",
        "entity_type": "person",
        "description": "a pioneer",
    }


def test_relationship_record_rules():
    # self-loop dropped — operate.py:206-208
    assert (
        handle_single_relationship(['"relationship"', '"A"', '"A"', '"d"', '"k"', "2"]) is None
    )
    # non-float weight → 1.0 — operate.py:217-221
    rel = handle_single_relationship(
        ['"relationship"', '"A"', '"B"', '"d"', '"k1, k2"', "strong"]
    )
    assert rel["weight"] == 1.0
    rel2 = handle_single_relationship(['"relationship"', '"A"', '"B"', '"d"', '"k，x"', "2.5"])
    assert rel2["weight"] == 2.5
    assert rel2["keywords"] == "k,x"  # ，→ , — operate.py:214


def test_parse_extraction_result_drops_content_keywords():
    s = (
        f'("entity"{D}"Acme Corp"{D}"organization"{D}"a firm")##'
        f'("relationship"{D}"Acme Corp"{D}"Bob Ray"{D}"works"{D}"emp"{D}3)##'
        f'("content_keywords"{D}"stuff")' + COMPLETION_DELIMITER
    )
    ents, rels = parse_extraction_result(s)
    assert len(ents) == 1 and len(rels) == 1  # content_keywords silently dropped


def test_deterministic_extract_stable():
    text = "Acme1 Corp is an organization known for graph analytics. Acme1 Corp partnered with Beta2 Labs on cloud, energy [w=3]."
    assert deterministic_extract(text) == deterministic_extract(text)
    ents, rels = parse_extraction_result(deterministic_extract(text))
    assert any(e["entity_name"] == "Acme1 Corp" for e in ents)
    assert any(r["src_id"] == "Acme1 Corp" and r["tgt_id"] == "Beta2 Labs" for r in rels)


def test_html_extraction_byte_identical():
    from aperag_spark.synth import gen_pages_local

    for page in gen_pages_local(30, seed=7):
        assert extract_text_from_html(page["html"]) == page["text"]


def test_mdhash_id():
    import hashlib

    assert compute_mdhash_id("x", prefix="doc-") == "doc-" + hashlib.md5(b"x").hexdigest()
    assert compute_mdhash_id("x", prefix="doc-", workspace="ws") == (
        "doc-" + hashlib.md5(b"ws::x").hexdigest()
    )
