"""Query-side context assembly (Q3-Q8) property tests."""

import pyspark.sql.functions as F
import pytest

from aperag_spark.operators.chunking import chunk_texts, extract_texts
from aperag_spark.operators.context import (
    build_global_context,
    build_local_context,
    combine_contexts,
    truncate_by_token_budget,
)
from aperag_spark.operators.extraction import extract_mentions, split_mentions
from aperag_spark.operators.merge import (
    merge_entities,
    merge_relations,
    stub_missing_endpoints,
)
from aperag_spark.operators.vectors import entity_vdb, relation_vdb
from aperag_spark.synth import PAGES_SCHEMA, gen_pages_local


@pytest.fixture(scope="module")
def graph(spark):
    pages = spark.createDataFrame(gen_pages_local(40, seed=42), schema=PAGES_SCHEMA)
    chunks = chunk_texts(extract_texts(pages)).localCheckpoint()
    raw_e, raw_r = split_mentions(extract_mentions(chunks))
    relations = merge_relations(raw_r).localCheckpoint()
    entities = stub_missing_endpoints(merge_entities(raw_e), relations).localCheckpoint()
    evdb = entity_vdb(entities).localCheckpoint()
    rvdb = relation_vdb(relations).localCheckpoint()
    return entities, relations, chunks, evdb, rvdb


def test_local_context(spark, graph):
    entities, relations, chunks, evdb, rvdb = graph
    target = evdb.orderBy("entity_name").first()
    ctx = build_local_context(
        target["content"], entities, relations, chunks, evdb, top_k=10, token_budget=3000
    )
    ents = ctx["entities"].collect()
    assert ents and any(e["entity_id"] == target["entity_name"] for e in ents)
    # rank = node degree (operate.py:1295-1310)
    edges = ctx["relations"].collect()
    if edges:
        orders = [e["order"] for e in edges]
        assert sorted(orders) == list(range(1, len(orders) + 1))
        ranked = sorted(edges, key=lambda e: e["order"])
        for a, b in zip(ranked, ranked[1:]):
            assert (a["rank"], a["weight"]) >= (b["rank"], b["weight"])
    chs = ctx["chunks"].collect()
    assert sum(c["tokens"] for c in chs) <= 3000
    assert len(set(c["chunk_id"] for c in chs)) == len(chs)  # deduped


def test_global_context(spark, graph):
    entities, relations, chunks, evdb, rvdb = graph
    target = rvdb.orderBy("id").first()
    ctx = build_global_context(
        target["content"], entities, relations, chunks, rvdb, top_k=10, token_budget=2000
    )
    edges = ctx["relations"].collect()
    assert edges and any(
        (e["src_id"], e["tgt_id"]) == (target["src_id"], target["tgt_id"]) for e in edges
    )
    ents = {e["entity_id"] for e in ctx["entities"].collect()}
    assert target["src_id"] in ents and target["tgt_id"] in ents
    assert sum(c["tokens"] for c in ctx["chunks"].collect()) <= 2000


def test_kg_query_modes(spark, graph):
    """All six reference modes (base.py:66-73) route and obey the
    reference's fallback/requirement rules (lightrag.py:850-884)."""
    from aperag_spark.operators.context import extract_query_keywords, kg_query_context
    from aperag_spark.operators.vectors import embed_column

    entities, relations, chunks, evdb, rvdb = graph
    cvdb = embed_column(
        chunks.select(F.col("chunk_id").alias("id"), "content"), "content"
    ).localCheckpoint()
    q = "What is Acme0 Corp known for in cloud energy partnership?"
    assert extract_query_keywords(q)[0] in {"acme0", "cloud", "corp", "energy", "known", "partnership"}
    for mode in ["local", "global", "hybrid"]:
        ctx = kg_query_context(q, mode, entities, relations, chunks, evdb, rvdb, top_k=10, token_budget=2000)
        assert set(ctx) == {"entities", "relations", "chunks", "mode"}
        assert ctx["mode"] == mode  # q has both hl and ll keywords: no fallback
        assert ctx["entities"].count() > 0
    with pytest.raises(ValueError):
        kg_query_context(q, "bogus", entities, relations, chunks, evdb, rvdb)
    # hybrid ids reassigned sequentially (Q7, utils.py:293-296)
    hy = kg_query_context(q, "hybrid", entities, relations, chunks, evdb, rvdb, top_k=10)
    ids = sorted(int(r["id"]) for r in hy["entities"].select("id").collect())
    assert ids == list(range(1, len(ids) + 1))
    # naive: chunks only, no graph rows (operate.py:1769-1836)
    nv = kg_query_context(q, "naive", entities, relations, chunks, evdb, rvdb, top_k=10, chunk_vdb_df=cvdb)
    assert nv["entities"].count() == 0 and nv["relations"].count() == 0
    assert nv["chunks"].count() > 0
    # naive/mix without a chunk vdb is an error (operate.py:1207, 1769)
    for needs_cvdb in ("naive", "mix"):
        with pytest.raises(ValueError):
            kg_query_context(q, needs_cvdb, entities, relations, chunks, evdb, rvdb)
    # mix ⊇ hybrid: graph legs identical, chunk leg extended by the vector
    # leg retrieved with the ORIGINAL query (operate.py:1207-1231)
    mx = kg_query_context(q, "mix", entities, relations, chunks, evdb, rvdb, top_k=10, chunk_vdb_df=cvdb)
    hy_ents = {r["entity_id"] for r in hy["entities"].collect()}
    mx_ents = {r["entity_id"] for r in mx["entities"].collect()}
    assert hy_ents == mx_ents
    hy_chunks = {r["chunk_id"] for r in hy["chunks"].collect()}
    mx_chunks = {r["chunk_id"] for r in mx["chunks"].collect()}
    assert hy_chunks <= mx_chunks
    # mix chunk ids re-sequenced after the 3-way combine (utils.py:293-296)
    mids = sorted(int(r["id"]) for r in mx["chunks"].select("id").collect())
    assert mids == list(range(1, len(mids) + 1))
    # bypass: no retrieval at all, prompt is the raw query (lightrag.py:873-884)
    bp = kg_query_context(q, "bypass", entities, relations, chunks, evdb, rvdb)
    assert bp["prompt"] == q
    assert bp["entities"].count() == 0 and bp["relations"].count() == 0 and bp["chunks"].count() == 0


def test_naive_context(spark, graph):
    import pyspark.sql.functions as F2

    from aperag_spark.operators.context import build_naive_context
    from aperag_spark.operators.vectors import embed_column

    entities, relations, chunks, evdb, rvdb = graph
    # chunk vdb: id = chunk_id, content = chunk content (V5/Q9 shape)
    cvdb = embed_column(
        chunks.select(F2.col("chunk_id").alias("id"), "content"), "content"
    ).localCheckpoint()
    target = cvdb.orderBy("id").first()
    out = build_naive_context(target["content"], chunks, cvdb, top_k=5, token_budget=5000).collect()
    assert out and out[0]["chunk_id"] == target["id"]  # self-match at rank 1
    assert sum(r["tokens"] for r in out) <= 5000
    assert [r["rank"] for r in out] == sorted(r["rank"] for r in out)


def test_truncate_budget_boundary(spark):
    df = spark.createDataFrame(
        [(i, 10) for i in range(10)], "pos int, tokens int"
    )
    out = truncate_by_token_budget(df, [F.asc("pos")], "tokens", 35).collect()
    # greedy prefix: 10+10+10 = 30 ≤ 35; adding the 4th (40) exceeds
    assert [r["pos"] for r in out] == [0, 1, 2]


def test_combine_contexts_dedupes_and_reids(spark):
    a = spark.createDataFrame([("1", "x"), ("2", "y")], "id string, text string")
    b = spark.createDataFrame([("9", "y"), ("4", "z")], "id string, text string")
    out = combine_contexts(a, b).collect()
    assert sorted(r["text"] for r in out) == ["x", "y", "z"]  # 'y' deduped
    assert sorted(r["id"] for r in out) == ["1", "2", "3"]  # re-assigned


def test_keyword_json_contract():
    """Q1: the stand-in model emits the reference's JSON response contract
    and parse_keywords_response applies the {.*} regex + failure fallbacks
    (operate.py:1043-1057)."""
    from aperag_spark.operators.context import (
        deterministic_keyword_model,
        parse_keywords_response,
    )

    q = "What is Acme0 Corp known for in cloud energy partnership?"
    reply = deterministic_keyword_model(q)
    assert not reply.strip().startswith("{")  # prose wraps the JSON
    hl, ll = parse_keywords_response(reply)
    assert ll == ["Acme0 Corp"]  # capitalized entity run, stop-words excluded
    assert set(hl) == {"cloud", "energy", "known", "partnership"}
    # no JSON at all → ([], []) (operate.py:1044-1046)
    assert parse_keywords_response("no braces here") == ([], [])
    # malformed JSON → ([], []) (operate.py:1049-1052)
    assert parse_keywords_response("pre {not: valid json,} post") == ([], [])
    # missing keys → empty defaults (operate.py:1054-1055)
    assert parse_keywords_response('{"other": 1}') == ([], [])


def test_keyword_mode_fallback_matrix(spark, graph):
    """operate.py:841-856 fallback rules, parametrized over the matrix:
    both-empty → fail response; ll-empty switches local/hybrid → global;
    hl-empty switches global/hybrid → local; mix never switches."""
    from aperag_spark.operators.context import FAIL_RESPONSE, kg_query_context

    entities, relations, chunks, evdb, rvdb = graph
    # only stopwords → hl == ll == [] → fail response, empty frames
    stop_q = "what is the an of to?"
    for mode in ["local", "global", "hybrid"]:
        ctx = kg_query_context(stop_q, mode, entities, relations, chunks, evdb, rvdb, top_k=5)
        assert ctx["prompt"] == FAIL_RESPONSE
        assert ctx["entities"].count() == 0 and ctx["relations"].count() == 0
        assert ctx["chunks"].count() == 0

    # no capitalized entity runs → ll empty → local and hybrid degrade to
    # global; global keeps itself
    ll_empty_q = "cloud energy partnership technology trends"
    for mode, expect in [("local", "global"), ("hybrid", "global"), ("global", "global")]:
        ctx = kg_query_context(ll_empty_q, mode, entities, relations, chunks, evdb, rvdb, top_k=5)
        assert ctx["mode"] == expect, (mode, ctx["mode"])

    # ONLY entity runs (no theme words) → hl empty → global and hybrid
    # degrade to local; local keeps itself
    hl_empty_q = "Acme0 Corp Navarro1 Group"
    for mode, expect in [("global", "local"), ("hybrid", "local"), ("local", "local")]:
        ctx = kg_query_context(hl_empty_q, mode, entities, relations, chunks, evdb, rvdb, top_k=5)
        assert ctx["mode"] == expect, (mode, ctx["mode"])


def test_combine_contexts_first_occurrence_leg_order(spark):
    """utils.py:269-297 process_combine_contexts: dedupe keeps the FIRST
    occurrence across legs in call order and ids are reassigned in that
    same leg-then-rank order (verified against the reference function's
    output on the same data)."""
    from aperag_spark.operators.context import combine_contexts

    # leg 0 (hl): [b, a] by rank; leg 1 (ll): [a, c] — reference output
    # order: b, a, c (a deduped to its leg-0 occurrence)
    hl = spark.createDataFrame(
        [("", "b", 1), ("", "a", 2)], "id string, text string, _ord int"
    )
    ll = spark.createDataFrame(
        [("", "a", 1), ("", "c", 2)], "id string, text string, _ord int"
    )
    out = combine_contexts(hl, ll).collect()
    by_id = {int(r["id"]): r["text"] for r in out}
    assert by_id == {1: "b", 2: "a", 3: "c"}
    assert all("_ord" not in r.asDict() and "_leg" not in r.asDict() for r in out)
