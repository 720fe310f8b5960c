"""The P/R parity gate (BASELINE.json: triple P/R >= 0.95 vs reference).

Runs the Spark pipeline and the independently-written reference-semantics
port (tests/reference_port.py) over the same deterministic synthetic pages
and compares:
  * triple sets (subj, pred, obj) — precision & recall
  * entity rows (name, type, description, source_id set)
  * relation weights / descriptions / keyword strings

With a deterministic extractor both sides should agree exactly; the gate
asserts >= 0.95 per BASELINE.json, plus equality where we expect it.
"""

import pyspark.sql.functions as F
import pytest

from aperag_spark.operators.chunking import chunk_texts, extract_texts
from aperag_spark.operators.extraction import extract_mentions, split_mentions
from aperag_spark.operators.merge import (
    merge_entities,
    merge_relations,
    stub_missing_endpoints,
)
from aperag_spark.synth import PAGES_SCHEMA, gen_pages_local
from tests.reference_port import golden_triples, run_reference_pipeline

N_PAGES = 60
SEED = 42


@pytest.fixture(scope="module")
def pages_rows():
    return gen_pages_local(N_PAGES, seed=SEED)


@pytest.fixture(scope="module")
def spark_result(spark, pages_rows):
    pages = spark.createDataFrame(pages_rows, schema=PAGES_SCHEMA)
    texts = extract_texts(pages)
    chunks = chunk_texts(texts)
    mentions = extract_mentions(chunks)
    raw_e, raw_r = split_mentions(mentions)
    relations = merge_relations(raw_r)
    entities = stub_missing_endpoints(merge_entities(raw_e), relations)
    return {
        "chunks": chunks.collect(),
        "entities": {r["entity_id"]: r.asDict() for r in entities.collect()},
        "relations": {
            (r["src_id"], r["tgt_id"]): r.asDict()
            for r in relations.select(
                "src_id", "tgt_id", "weight", "description", "keywords", "source_ids"
            ).collect()
        },
    }


@pytest.fixture(scope="module")
def golden(pages_rows):
    return run_reference_pipeline(pages_rows)


def test_chunk_parity(spark_result, golden):
    spark_chunks = {
        (c["chunk_id"], c["full_doc_id"], c["chunk_order_index"], c["tokens"], c["content"])
        for c in spark_result["chunks"]
    }
    golden_chunks = {
        (c["chunk_id"], c["full_doc_id"], c["chunk_order_index"], c["tokens"], c["content"])
        for c in golden["chunks"]
    }
    assert spark_chunks == golden_chunks
    assert len(spark_chunks) > N_PAGES / 2  # sanity: real volume


def test_triple_precision_recall(spark_result, golden):
    gold = golden_triples(golden)
    ours = {
        (src, rel["keywords"], tgt)
        for (src, tgt), rel in spark_result["relations"].items()
    }
    assert gold, "golden triple set must be non-empty"
    tp = len(ours & gold)
    precision = tp / len(ours) if ours else 0.0
    recall = tp / len(gold) if gold else 0.0
    # deterministic extractor ⇒ exact agreement expected; gate is >=0.95
    assert precision >= 0.95, f"precision {precision:.4f}\nextra={sorted(ours - gold)[:5]}"
    assert recall >= 0.95, f"recall {recall:.4f}\nmissing={sorted(gold - ours)[:5]}"
    assert precision == 1.0 and recall == 1.0


def test_relation_values_match(spark_result, golden):
    for key, grel in golden["relations"].items():
        srel = spark_result["relations"].get(key)
        assert srel is not None, f"missing relation {key}"
        assert srel["weight"] == pytest.approx(grel["weight"])
        assert srel["description"] == grel["description"]
        assert srel["keywords"] == grel["keywords"]
        assert set(srel["source_ids"]) == grel["source_ids"]


def test_entity_rows_match(spark_result, golden):
    gold = golden["entities"]
    ours = spark_result["entities"]
    assert set(ours) == set(gold)
    mismatches = []
    for name, g in gold.items():
        o = ours[name]
        if (
            o["entity_type"] != g["entity_type"]
            or o["description"] != g["description"]
            or set(o["source_ids"]) != g["source_ids"]
        ):
            mismatches.append((name, o, g))
    assert not mismatches, mismatches[:3]


def test_summary_threshold_hit(golden):
    # the generator plants entities with >=10 description fragments so the
    # LLM-summary path (operate.py:317-336) is actually exercised
    assert any(
        e["description"].startswith("SUMMARY:") for e in golden["entities"].values()
    )


def test_unknown_stub_nodes_exist(golden):
    # operate.py:431-443 path exercised (extractor plants "Phantom Body"
    # relations whose endpoint is never emitted as an entity)
    assert any(
        e["entity_type"] == "UNKNOWN" for e in golden["entities"].values()
    )
