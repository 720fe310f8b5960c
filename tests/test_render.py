"""rag_response context rendering (operate.py:905-960, prompt.py:241-273):
context frames → reference JSON blocks → system prompt, per mode."""

import json
import re

import pyspark.sql.functions as F
import pytest

from aperag_spark.operators.chunking import chunk_texts, extract_texts
from aperag_spark.operators.context import FAIL_RESPONSE, kg_query_context
from aperag_spark.operators.extraction import extract_mentions, split_mentions
from aperag_spark.operators.merge import (
    merge_entities,
    merge_relations,
    stub_missing_endpoints,
)
from aperag_spark.operators.render import (
    render_context_data,
    render_rag_prompt,
)
from aperag_spark.operators.vectors import embed_column, entity_vdb, relation_vdb
from aperag_spark.synth import PAGES_SCHEMA, gen_pages_local

ENTITY_KEYS = ["id", "entity", "type", "description", "rank", "created_at", "file_path"]
RELATION_KEYS = [
    "id", "entity1", "entity2", "description", "keywords", "weight", "rank",
    "created_at", "file_path",
]
CHUNK_KEYS = ["id", "content", "file_path"]

Q = "What is Acme0 Corp known for in cloud energy partnership?"


@pytest.fixture(scope="module")
def graph(spark):
    pages = spark.createDataFrame(gen_pages_local(30, seed=42), schema=PAGES_SCHEMA)
    chunks = chunk_texts(extract_texts(pages)).localCheckpoint()
    raw_e, raw_r = split_mentions(extract_mentions(chunks))
    relations = merge_relations(raw_r).localCheckpoint()
    entities = stub_missing_endpoints(merge_entities(raw_e), relations).localCheckpoint()
    evdb = entity_vdb(entities).localCheckpoint()
    rvdb = relation_vdb(relations).localCheckpoint()
    cvdb = embed_column(
        chunks.select(F.col("chunk_id").alias("id"), "content"), "content"
    ).localCheckpoint()
    return entities, relations, chunks, evdb, rvdb, cvdb


def _blocks(context_data: str) -> dict[str, list[dict]]:
    """Parse the three fenced JSON blocks back out of the rendered layout."""
    out = {}
    for header, key in [
        ("-----Entities(KG)-----", "entities"),
        ("-----Relationships(KG)-----", "relations"),
        ("-----Document Chunks(DC)-----", "chunks"),
    ]:
        m = re.search(re.escape(header) + r"\n\n    ```json\n    (.*?)\n    ```", context_data, re.DOTALL)
        assert m, f"missing block {header}"
        out[key] = json.loads(m.group(1))
    return out


@pytest.mark.parametrize("mode", ["local", "global", "hybrid"])
def test_context_data_blocks_per_mode(spark, graph, mode):
    entities, relations, chunks, evdb, rvdb, cvdb = graph
    ctx = kg_query_context(Q, mode, entities, relations, chunks, evdb, rvdb, top_k=10, token_budget=2000)
    rendered = render_context_data(ctx)
    # layout: exact reference f-string shape incl. trailing indent
    assert rendered.startswith("-----Entities(KG)-----\n\n    ```json\n    ")
    assert rendered.endswith("```\n\n    ")
    blocks = _blocks(rendered)
    assert blocks["entities"], f"{mode}: no entity rows"
    for row in blocks["entities"]:
        assert list(row) == ENTITY_KEYS  # key ORDER matches operate.py:1323-1333
    for row in blocks["relations"]:
        assert list(row) == RELATION_KEYS
    for row in blocks["chunks"]:
        assert list(row) == CHUNK_KEYS
    # sequential re-ids per block (enumerate i+1)
    for key in ("entities", "relations", "chunks"):
        assert [r["id"] for r in blocks[key]] == list(range(1, len(blocks[key]) + 1))


def test_rag_prompt_assembly(spark, graph):
    entities, relations, chunks, evdb, rvdb, cvdb = graph
    ctx = kg_query_context(Q, "hybrid", entities, relations, chunks, evdb, rvdb, top_k=10)
    prompt = render_rag_prompt(Q, ctx, response_type="Single Paragraph", history="hist!", user_prompt="up!")
    assert prompt.startswith("---Role---")
    assert "---Conversation History---\nhist!" in prompt
    assert "- Target format and length: Single Paragraph" in prompt
    assert "- Addtional user prompt: up!" in prompt  # reference's own typo kept
    assert "-----Entities(KG)-----" in prompt and prompt.rstrip().endswith("Response:")
    # no unformatted placeholders remain
    assert not re.search(r"\{(context_data|response_type|history|user_prompt)\}", prompt)


def test_rag_prompt_bypass_and_fail_passthrough(spark, graph):
    entities, relations, chunks, evdb, rvdb, cvdb = graph
    bp = kg_query_context(Q, "bypass", entities, relations, chunks, evdb, rvdb)
    assert render_rag_prompt(Q, bp) == Q  # lightrag.py:873-884
    fail = kg_query_context("what is the an of to?", "hybrid", entities, relations, chunks, evdb, rvdb)
    assert render_rag_prompt(Q, fail) == FAIL_RESPONSE  # operate.py:842-844


def test_engine_query_prompt_surface(spark, tmp_path):
    from aperag_spark.api import KGEngine
    from aperag_spark.synth import gen_pages_df

    eng = KGEngine(spark, str(tmp_path / "kg"))
    eng.insert(gen_pages_df(spark, 25, seed=3, partitions=4))
    prompt = eng.query_prompt(Q, mode="local", top_k=5, token_budget=1500)
    assert prompt.startswith("---Role---") and "```json" in prompt


def test_naive_mode_uses_naive_template(spark, graph):
    """naive_query renders chunks only under its own template
    (prompt.py:343-375, operate.py:1804-1811); empty chunk context → fail
    response (operate.py:1784-1786)."""
    from aperag_spark.operators.render import render_rag_prompt

    entities, relations, chunks, evdb, rvdb, cvdb = graph
    ctx = kg_query_context(Q, "naive", entities, relations, chunks, evdb, rvdb,
                           top_k=5, chunk_vdb_df=cvdb)
    prompt = render_rag_prompt(Q, ctx)
    assert "Document Chunks provided provided in JSON format" in prompt  # ref typo kept
    assert "---Document Chunks(DC)---" in prompt
    assert "Entities(KG)" not in prompt  # no graph sections in naive
    # empty chunk frame → fail response
    empty_ctx = dict(ctx, chunks=ctx["chunks"].limit(0))
    assert render_rag_prompt(Q, empty_ctx) == FAIL_RESPONSE


def test_conversation_turns_formatting():
    """utils.py:300-354 port, verified identical to the reference function
    on a 500-case fuzz (roles × kw-marker contents × num_turns): keyword
    replies dropped, user-first ordering, stride-2 pairing (a reference
    quirk — an unpaired offset yields NO turns), most-recent window."""
    from aperag_spark.operators.render import get_conversation_turns

    clean = [
        {"role": "user", "content": "q1"},
        {"role": "assistant", "content": "a1"},
        {"role": "user", "content": "q2"},
        {"role": "assistant", "content": "a2"},
        {"role": "assistant", "content": "a3"},
        {"role": "user", "content": "q3"},
    ]
    out = get_conversation_turns(clean, 10)
    # assistant-first pair is reordered user-first (utils.py:337-341)
    assert out == "user: q1\nassistant: a1\nuser: q2\nassistant: a2\nuser: q3\nassistant: a3"
    assert get_conversation_turns(clean, 1) == "user: q3\nassistant: a3"
    assert get_conversation_turns(clean, 0) == ""
    # keyword-extraction replies are filtered BEFORE pairing, and the
    # stride-2 walk drops turns when the offset is broken — reference
    # ground truth for this exact history is the empty string
    tricky = [
        {"role": "user", "content": "q1"},
        {"role": "assistant", "content": '{ "high_level_keywords": ["x"]}'},
        {"role": "user", "content": "q2"},
        {"role": "assistant", "content": "a2"},
        {"role": "assistant", "content": "a3"},
        {"role": "user", "content": "q3"},
        {"role": "user", "content": "q4"},
        {"role": "assistant", "content": "a4"},
    ]
    assert get_conversation_turns(tricky, 10) == ""
    # the filter alone (kw reply removed, then a clean pair) still pairs
    filtered = [
        {"role": "assistant", "content": "{'high_level_keywords': []}"},
        {"role": "user", "content": "q"},
        {"role": "assistant", "content": "a"},
    ]
    assert get_conversation_turns(filtered, 5) == "user: q\nassistant: a"


def test_naive_only_need_context_form(spark, graph):
    """operate.py:1789-1796: the naive only_need_context string is a single
    fenced chunk block with the reference's exact layout."""
    from aperag_spark.operators.render import render_naive_context_data

    entities, relations, chunks, evdb, rvdb, cvdb = graph
    ctx = kg_query_context(Q, "naive", entities, relations, chunks, evdb, rvdb,
                           top_k=5, chunk_vdb_df=cvdb)
    out = render_naive_context_data(ctx)
    assert out.startswith("\n---Document Chunks---\n\n```json\n")
    assert out.endswith("```\n\n")
    body = re.search(r"```json\n(.*?)\n```", out, re.DOTALL).group(1)
    rows = json.loads(body)
    assert rows and all(list(r) == CHUNK_KEYS for r in rows)
    assert [r["id"] for r in rows] == list(range(1, len(rows) + 1))


def test_context_rows_order_numeric_ids(spark):
    """Combined contexts carry NUMERIC-STRING ids; rendering must order them
    as ints — 12 rows must come out 1..12, not 1,10,11,12,2,... (review
    finding: lexicographic id sort scrambled hybrid contexts past 9 rows)."""
    from aperag_spark.operators.render import text_units_context_rows

    df = spark.createDataFrame(
        [(str(i), f"c{i:02d}") for i in range(1, 13)], "id string, chunk_id string"
    ).withColumn("content", F.col("chunk_id"))
    rows = text_units_context_rows(df)
    assert [r["content"] for r in rows] == [f"c{i:02d}" for i in range(1, 13)]
    assert [r["id"] for r in rows] == list(range(1, 13))


def test_naive_only_need_context_empty_is_fail(spark, graph):
    """operate.py:1784-1786: empty chunk context short-circuits to the fail
    response before the only_need_context return."""
    from aperag_spark.operators.render import render_naive_context_data

    entities, relations, chunks, evdb, rvdb, cvdb = graph
    ctx = {"chunks": chunks.limit(0)}
    assert render_naive_context_data(ctx) == FAIL_RESPONSE


def test_hybrid_relations_carry_metadata_and_leg_order(spark, graph):
    """Hybrid relations combine like the other sections: real description/
    keywords/weight/rank carried through, ids sequential in leg-then-rank
    order (review finding: previously bare (src,tgt,weight) in content
    order, rendering UNKNOWN metadata)."""
    entities, relations, chunks, evdb, rvdb, cvdb = graph
    hy = kg_query_context(Q, "hybrid", entities, relations, chunks, evdb, rvdb, top_k=10)
    rows = hy["relations"].collect()
    assert rows
    assert {"description", "keywords", "weight", "rank", "id"} <= set(rows[0].asDict())
    ids = sorted(int(r["id"]) for r in rows)
    assert ids == list(range(1, len(rows) + 1))
    assert any(r["description"] for r in rows) and all(r["rank"] >= 0 for r in rows)
    rendered = render_context_data(hy)
    blocks = _blocks(rendered)
    # rendered relation rows now show real metadata, not UNKNOWN defaults
    assert any(r["description"] != "UNKNOWN" for r in blocks["relations"])
    assert any(r["rank"] > 0 for r in blocks["relations"])
