"""Pure-Python text-processing kernel shared by the Spark pandas UDFs and the
reference-parity harness (tests/reference_port.py).

Every function here reproduces, with citation, the semantics of a pure
function in the reference (apecloud/ApeRAG at /root/reference). Keeping them
in one importable module guarantees the Spark pipeline and the golden-set
generator run *the same bytes* — which is what makes the P/R gate meaningful.

No Spark imports allowed in this module (it is shipped to executors and also
imported by plain-pytest unit tests).
"""

from __future__ import annotations

import html
import re
from hashlib import md5 as _md5
from typing import Any

from aperag_spark import (
    COMPLETION_DELIMITER,
    RECORD_DELIMITER,
    TUPLE_DELIMITER,
)

# ---------------------------------------------------------------------------
# Hash ids — reference: aperag/graph/lightrag/utils.py:111-132
# ---------------------------------------------------------------------------


def compute_mdhash_id(content: str, prefix: str = "", workspace: str = "") -> str:
    """Workspace-isolated md5 id. Reference: utils.py:111-132."""
    hash_input = f"{workspace}::{content}" if workspace else content
    return prefix + _md5(hash_input.encode()).hexdigest()


def md5_hex(s: str) -> str:
    return _md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# String cleaning — reference: aperag/graph/lightrag/utils.py
# ---------------------------------------------------------------------------

_CONTROL_CHARS_RE = re.compile(r"[\x00-\x1f\x7f-\x9f]")


def clean_str(value: Any) -> Any:
    """html.unescape + strip + drop control chars. Reference: utils.py:236-245."""
    if not isinstance(value, str):
        return value
    result = html.unescape(value.strip())
    return _CONTROL_CHARS_RE.sub("", result)


def clean_text(text: str) -> str:
    """strip + drop NUL bytes. Reference: utils.py:467-476."""
    return text.strip().replace("\x00", "")


_FLOAT_RE = re.compile(r"^[-+]?[0-9]*\.?[0-9]+$")


def is_float_regex(value: str) -> bool:
    """Reference: utils.py:248-249."""
    return bool(_FLOAT_RE.match(value))


from functools import lru_cache


@lru_cache(maxsize=64)
def _marker_pattern(markers: tuple[str, ...]):
    return re.compile("|".join(re.escape(marker) for marker in markers))


def split_string_by_multi_markers(content: str, markers: list[str]) -> list[str]:
    """Split on any marker, strip pieces, drop empties. Reference:
    utils.py:225-232 (pattern compilation cached — this runs per record in
    the extraction UDF)."""
    if not markers:
        return [content]
    content = content if content is not None else ""
    results = _marker_pattern(tuple(markers)).split(content)
    return [r.strip() for r in results if r.strip()]


_ZH = "一-龥"
_ZH_SPACE_RE = re.compile(rf"(?<=[{_ZH}])\s+(?=[{_ZH}])")
_ZH_EN_RE = re.compile(rf"(?<=[{_ZH}])\s+(?=[a-zA-Z0-9\(\)\[\]@#$%!&\*\-=+_])")
_EN_ZH_RE = re.compile(rf"(?<=[a-zA-Z0-9\(\)\[\]@#$%!&\*\-=+_])\s+(?=[{_ZH}])")
_QUOTE_BEFORE_ZH_RE = re.compile(rf"['\"]+(?=[{_ZH}])")
_QUOTE_AFTER_ZH_RE = re.compile(rf"(?<=[{_ZH}])['\"]+")


def normalize_extracted_info(name: str, is_entity: bool = False) -> str:
    """8-rule CJK/EN name normalization. Reference: utils.py:417-464 (verbatim
    rule order: parens, dashes, CJK spacing, edge quotes, CJK quotes).

    ASCII fast path: every rule except edge-quote stripping only fires on
    non-ASCII characters (CJK ranges, fullwidth punctuation, curly quotes),
    so for ASCII input the result is provably identical — and this function
    dominates the extraction UDF's profile (~30%) on web-scale English."""
    if name.isascii():
        if len(name) >= 2 and name[0] == '"' and name[-1] == '"':
            name = name[1:-1]
        if len(name) >= 2 and name[0] == "'" and name[-1] == "'":
            name = name[1:-1]
        if is_entity:
            name = name.replace(', "").replace(', "").replace("'", "")
        return name
    name = name.replace("（", "(").replace("）", ")")
    name = name.replace("—", "-").replace("－", "-")
    name = _ZH_SPACE_RE.sub("", name)
    name = _ZH_EN_RE.sub("", name)
    name = _EN_ZH_RE.sub("", name)
    if len(name) >= 2 and name.startswith('"') and name.endswith('"'):
        name = name[1:-1]
    if len(name) >= 2 and name.startswith("'") and name.endswith("'"):
        name = name[1:-1]
    if is_entity:
        # QUIRK REPRODUCED, NOT FIXED (SURVEY §7.2): the reference source's
        # curly-quote replaces are mangled — utils.py:459 reads
        # `name.replace(""", "").replace(""", "")...` where the first `"""`
        # OPENS A TRIPLE-QUOTED STRING, so the code that actually executes is
        # `name.replace(', "").replace(', "").replace("'", "").replace("'", "")`:
        # it removes the literal substring ', "").replace(' and every straight
        # apostrophe, and KEEPS curly quotes (“”‘’). Verified by executing the
        # reference function directly; fuzz-locked in
        # tests/test_live_reference_fuzz.py.
        name = name.replace(', "").replace(', "").replace("'", "")
        name = _QUOTE_BEFORE_ZH_RE.sub("", name)
        name = _QUOTE_AFTER_ZH_RE.sub("", name)
    return name


# ---------------------------------------------------------------------------
# Tokenizer. The reference uses tiktoken o200k_base (utils.py:191-218,
# lightrag.py:134-135). tiktoken is not installed in this sandbox, so both
# the Spark pipeline AND the parity port use the same deterministic, lossless
# regex tokenizer (GPT-2-style pretokenization pattern, public knowledge).
# Swapping in tiktoken later only requires replacing Tokenizer below — chunk
# semantics (windows/stride/strip) are tokenizer-agnostic.
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?\w+| ?[^\w\s]+|\s+", re.UNICODE
)


class Tokenizer:
    """Deterministic lossless tokenizer: decode(encode(x)) == x.

    Tokens are the string pieces themselves (ids are irrelevant to chunking:
    the reference only uses encode→slice→decode, operate.py:71-115)."""

    def encode(self, text: str) -> list[str]:
        return _TOKEN_RE.findall(text)

    def decode(self, tokens: list[str]) -> str:
        return "".join(tokens)


class TiktokenTokenizer(Tokenizer):
    """Real o200k_base tokenizer (utils.py:191-218): backed by tiktoken when
    installed, else by the vendored pure-python BPE engine
    (aperag_spark.bpe) over a rank file at $APERAG_SPARK_TIKTOKEN_PATH.
    Raises if neither source is available — use get_tokenizer() for the
    fall-back chain."""

    def __init__(self, encoding: str = "o200k_base"):
        try:
            import tiktoken

            self._enc = tiktoken.get_encoding(encoding)
        except Exception:
            import os

            from aperag_spark.bpe import BpeEncoding, load_tiktoken_bpe

            path = os.environ.get("APERAG_SPARK_TIKTOKEN_PATH")
            if not path or not os.path.exists(path):
                raise RuntimeError(
                    "no tiktoken install and no $APERAG_SPARK_TIKTOKEN_PATH rank file"
                )
            self._enc = BpeEncoding(load_tiktoken_bpe(path))

    def encode(self, text: str):
        return self._enc.encode(text)

    def decode(self, tokens):
        return self._enc.decode(list(tokens))


def get_tokenizer() -> Tokenizer:
    """THE tokenizer factory. Every pipeline call site (chunking, fused
    extraction, rechunker) AND the parity port (tests/reference_port.py)
    construct their tokenizer here, so they can never disagree; the oracle
    queries in queries.py pin Tokenizer() explicitly because their DuckDB
    SQL reproduces that regex.

    Preference order: tiktoken o200k_base (the reference's encoding,
    utils.py:191-218) → vendored BPE over $APERAG_SPARK_TIKTOKEN_PATH →
    the deterministic regex Tokenizer."""
    try:
        return TiktokenTokenizer()
    except Exception:
        return Tokenizer()


DEFAULT_TOKENIZER: Tokenizer = get_tokenizer()


def chunking_by_token_size(
    tokenizer: Tokenizer,
    content: str,
    split_by_character: str | None = None,
    split_by_character_only: bool = False,
    overlap_token_size: int = 100,
    max_token_size: int = 1200,
) -> list[dict[str, Any]]:
    """Token-window chunking, verbatim semantics of operate.py:71-115
    (windows of max_token_size, stride max-overlap, decode+strip, `tokens`
    is min(max, remaining))."""
    tokens = tokenizer.encode(content)
    results: list[dict[str, Any]] = []
    if split_by_character:
        raw_chunks = content.split(split_by_character)
        new_chunks = []
        if split_by_character_only:
            for chunk in raw_chunks:
                _tokens = tokenizer.encode(chunk)
                new_chunks.append((len(_tokens), chunk))
        else:
            for chunk in raw_chunks:
                _tokens = tokenizer.encode(chunk)
                if len(_tokens) > max_token_size:
                    for start in range(0, len(_tokens), max_token_size - overlap_token_size):
                        chunk_content = tokenizer.decode(_tokens[start : start + max_token_size])
                        new_chunks.append(
                            (min(max_token_size, len(_tokens) - start), chunk_content)
                        )
                else:
                    new_chunks.append((len(_tokens), chunk))
        for index, (_len, chunk) in enumerate(new_chunks):
            results.append(
                {"tokens": _len, "content": chunk.strip(), "chunk_order_index": index}
            )
    else:
        for index, start in enumerate(
            range(0, len(tokens), max_token_size - overlap_token_size)
        ):
            chunk_content = tokenizer.decode(tokens[start : start + max_token_size])
            results.append(
                {
                    "tokens": min(max_token_size, len(tokens) - start),
                    "content": chunk_content.strip(),
                    "chunk_order_index": index,
                }
            )
    return results


# ---------------------------------------------------------------------------
# HTML → markdown extraction. The reference converts HTML to markdown with
# MarkItDown (aperag/docparser/markitdown_parser.py:25-68) and feeds the
# markdown to parse_md. aperag_spark.htmlmd is the stdlib-only converter with
# the same conventions (headings → '#', lists, links, GFM tables, fences);
# the rebuild's invariant (BASELINE.json input_hint) is byte-identical
# extracted text per url, so the converter is a deterministic pure function.
# ---------------------------------------------------------------------------


def extract_text_from_html(html_bytes: bytes) -> str:
    """Deterministic html→markdown: MarkItDown-convention conversion
    (aperag_spark.htmlmd.html_to_markdown); <p>-only pages reduce to the
    paragraph text stream joined by blank lines."""
    from aperag_spark.htmlmd import html_to_markdown

    return html_to_markdown(html_bytes.decode("utf-8", errors="replace"))


# ---------------------------------------------------------------------------
# Deterministic extractor — the stand-in for the reference's LLM call
# (operate.py:740-742). It maps chunk text → the exact record grammar of
# prompt.py:42-45,60-99:
#   ("entity"<|>"Name"<|>"type"<|>"desc")##
#   ("relationship"<|>"Src"<|>"Tgt"<|>"desc"<|>"kw1, kw2"<|>7)##
#   ("content_keywords"<|>"kw")<|COMPLETE|>
# Both the Spark pipeline and the parity port call THIS function, then each
# parses the string with its own implementation of the record parser — so
# parity measures the parser + merge reimplementation, not extractor luck.
#
# Adversarial records (exercising cited reference drop-rules) are injected
# deterministically keyed on md5(chunk content).
# ---------------------------------------------------------------------------

_ENTITY_SENT_RE = re.compile(
    r"\b([A-Z][\w.&-]*(?: [A-Z][\w.&-]*)*) is an? "
    r"(organization|person|geo|event|product|technology|category) known for ([a-z0-9 ,-]+)\."
)
_REL_SENT_RE = re.compile(
    r"\b([A-Z][\w.&-]*(?: [A-Z][\w.&-]*)*) partnered with "
    r"([A-Z][\w.&-]*(?: [A-Z][\w.&-]*)*) on ([a-z0-9 ,-]+) \[w=([0-9.]+)\]"
)

_D = TUPLE_DELIMITER
_R = RECORD_DELIMITER


def deterministic_extract(chunk_text: str) -> str:
    """chunk text → LLM-grammar record string (pure, deterministic)."""
    records: list[str] = []
    for m in _ENTITY_SENT_RE.finditer(chunk_text):
        name, etype, desc = m.group(1), m.group(2), m.group(3).strip()
        records.append(f'("entity"{_D}"{name}"{_D}"{etype}"{_D}"{desc}")')
    for m in _REL_SENT_RE.finditer(chunk_text):
        src, tgt, kws, w = m.group(1), m.group(2), m.group(3).strip(), m.group(4)
        records.append(
            f'("relationship"{_D}"{src}"{_D}"{tgt}"{_D}"{src} works with {tgt}"{_D}"{kws}"{_D}{w})'
        )
    # Adversarial records keyed on the chunk hash — each exercises a cited
    # reference drop/keep rule; identical on both pipelines by construction.
    h = int(md5_hex(chunk_text)[:8], 16)
    sel = h % 7
    if sel == 0:  # <4 attrs → dropped (operate.py:157)
        records.append(f'("entity"{_D}"Shorty")')
    elif sel == 1:  # self-loop → dropped (operate.py:206-208)
        records.append(
            f'("relationship"{_D}"LoopCo"{_D}"LoopCo"{_D}"self"{_D}"loop"{_D}2)'
        )
    elif sel == 2:  # non-float weight → 1.0 (operate.py:217-221)
        records.append(
            f'("relationship"{_D}"Alpha Board"{_D}"Beta Panel"{_D}"advises"{_D}"governance"{_D}strong)'
        )
    elif sel == 3:  # html escape + control char → clean_str (utils.py:237-245)
        records.append(
            f'("entity"{_D}"Smith &amp; Jones\x01"{_D}"organization"{_D}"a firm")'
        )
    elif sel == 4:  # edge quotes stripped (utils.py:446-450)
        records.append(f'("entity"{_D}"\'Quoted Name\'"{_D}"person"{_D}"a person")')
    elif sel == 5:  # endpoint never emitted as entity → UNKNOWN stub (operate.py:431-443)
        records.append(
            f'("relationship"{_D}"Phantom Body"{_D}"Alpha Board"{_D}"haunts"{_D}"mystery"{_D}1.5)'
        )
    # sel == 6: nothing extra
    # content_keywords record — silently dropped by the reference parser
    # (no handler in operate.py:703-718)
    records.append(f'("content_keywords"{_D}"synthetic, corpus")')
    return _R.join(records) + COMPLETION_DELIMITER


# ---------------------------------------------------------------------------
# Record parsing — E4..E9. Reference: operate.py:686-718 (split + regex),
# operate.py:152-189 (_handle_single_entity_extraction),
# operate.py:192-230 (_handle_single_relationship_extraction).
# ---------------------------------------------------------------------------

_PAREN_RE = re.compile(r"\((.*)\)")


def handle_single_entity(record_attributes: list[str]) -> dict | None:
    """Reference: operate.py:152-189 (sync, minus chunk-key plumbing)."""
    if len(record_attributes) < 4 or '"entity"' not in record_attributes[0]:
        return None
    entity_name = clean_str(record_attributes[1]).strip()
    if not entity_name:
        return None
    entity_name = normalize_extracted_info(entity_name, is_entity=True)
    entity_type = clean_str(record_attributes[2]).strip('"')
    if not entity_type.strip() or entity_type.startswith('("'):
        return None
    entity_description = clean_str(record_attributes[3])
    entity_description = normalize_extracted_info(entity_description)
    if not entity_description.strip():
        return None
    return dict(
        entity_name=entity_name,
        entity_type=entity_type,
        description=entity_description,
    )


def handle_single_relationship(record_attributes: list[str]) -> dict | None:
    """Reference: operate.py:192-230."""
    if len(record_attributes) < 5 or '"relationship"' not in record_attributes[0]:
        return None
    source = clean_str(record_attributes[1])
    target = clean_str(record_attributes[2])
    source = normalize_extracted_info(source, is_entity=True)
    target = normalize_extracted_info(target, is_entity=True)
    if source == target:
        return None
    edge_description = clean_str(record_attributes[3])
    edge_description = normalize_extracted_info(edge_description)
    edge_keywords = normalize_extracted_info(clean_str(record_attributes[4]), is_entity=True)
    edge_keywords = edge_keywords.replace("，", ",")
    last = record_attributes[-1].strip('"').strip("'")
    weight = float(last) if is_float_regex(last) else 1.0
    return dict(
        src_id=source,
        tgt_id=target,
        weight=weight,
        description=edge_description,
        keywords=edge_keywords,
    )


def parse_extraction_result(result: str) -> tuple[list[dict], list[dict]]:
    """Split the LLM-grammar string into entity/relation dicts.
    Reference: operate.py:686-718 (_process_extraction_result)."""
    entities: list[dict] = []
    relations: list[dict] = []
    records = split_string_by_multi_markers(
        result, [RECORD_DELIMITER, COMPLETION_DELIMITER]
    )
    for record in records:
        m = _PAREN_RE.search(record)
        if m is None:
            continue
        attrs = split_string_by_multi_markers(m.group(1), [TUPLE_DELIMITER])
        ent = handle_single_entity(attrs)
        if ent is not None:
            entities.append(ent)
            continue
        rel = handle_single_relationship(attrs)
        if rel is not None:
            relations.append(rel)
    return entities, relations


def deterministic_glean(chunk_text: str, round_idx: int) -> str:
    """Deterministic stand-in for the gleaning LLM call (continue_prompt,
    operate.py:746-767). Emits one genuinely-new entity and one repeat of a
    round-0 pattern with a different description — the latter exercises the
    reference's new-names-only acceptance rule (it must be DROPPED)."""
    h = md5_hex(f"{chunk_text}:glean:{round_idx}")[:8]
    records = [
        f'("entity"{_D}"Gleaned Body {h}"{_D}"category"{_D}"found on re-read")'
    ]
    # repeat an existing entity name (if any) with a conflicting description
    m = _ENTITY_SENT_RE.search(chunk_text)
    if m:
        records.append(
            f'("entity"{_D}"{m.group(1)}"{_D}"event"{_D}"gleaning duplicate must be rejected")'
        )
    rel = _REL_SENT_RE.search(chunk_text)
    if rel:
        # repeated edge key (same direction) — rejected by the edge rule
        records.append(
            f'("relationship"{_D}"{rel.group(1)}"{_D}"{rel.group(2)}"{_D}"glean dup"{_D}"dup"{_D}9)'
        )
    return _R.join(records) + COMPLETION_DELIMITER


def glean_continue(chunk_text: str, round_idx: int) -> bool:
    """Deterministic stand-in for entity_if_loop_extraction
    (operate.py:762-766): continue only when the answer is exactly 'yes'."""
    return int(md5_hex(f"{chunk_text}:ifloop:{round_idx}")[:2], 16) % 2 == 0


def extract_with_gleaning(
    chunk_text: str,
    max_gleaning: int = 0,
    extractor=None,
    gleaner=deterministic_glean,
) -> tuple[list[dict], list[dict]]:
    """Initial extraction + gleaning rounds with the reference's acceptance
    rules (operate.py:746-767): gleaned entities accepted only under NEW
    names; gleaned edges only under new (src, tgt) keys — keys UNSORTED at
    this stage (canonical sorting happens at merge, operate.py:553-555)."""
    extractor = extractor or deterministic_extract
    entities, relations = parse_extraction_result(extractor(chunk_text))
    seen_names = {e["entity_name"] for e in entities}
    seen_keys = {(r["src_id"], r["tgt_id"]) for r in relations}
    for g in range(max_gleaning):
        g_ents, g_rels = parse_extraction_result(gleaner(chunk_text, g))
        # acceptance is per NAME/KEY group: every gleaned record of a new
        # name/key extends (operate.py:754-759 extend semantics)
        ent_groups: dict[str, list[dict]] = {}
        for e in g_ents:
            ent_groups.setdefault(e["entity_name"], []).append(e)
        for name, group in ent_groups.items():
            if name not in seen_names:
                entities.extend(group)
                seen_names.add(name)
        rel_groups: dict[tuple, list[dict]] = {}
        for r in g_rels:
            rel_groups.setdefault((r["src_id"], r["tgt_id"]), []).append(r)
        for key, group in rel_groups.items():
            if key not in seen_keys:
                relations.extend(group)
                seen_keys.add(key)
        if g == max_gleaning - 1:
            break
        if not glean_continue(chunk_text, g):
            break
    return entities, relations


def stub_summarize(joined_description: str) -> str:
    """Deterministic stand-in for the reference's LLM merge-summary
    (operate.py:118-149, triggered at >= FORCE_LLM_SUMMARY_ON_MERGE
    fragments, operate.py:317-336). Natively expressible in Spark SQL as
    concat('SUMMARY:', substring(md5(x),1,16)) so the aggregation stays
    JVM-side."""
    return "SUMMARY:" + md5_hex(joined_description)[:16]
