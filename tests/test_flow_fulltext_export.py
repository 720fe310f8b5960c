"""Q11 flow merge, Q12 rerank, S8/Q10 fulltext, and KG-Eval export tests."""

import pyspark.sql.functions as F
import pytest

from aperag_spark.operators.flow import merge_docs, rerank_docs
from aperag_spark.operators.fulltext import analyze_col, bm25_search, build_fulltext_index


def _leg(spark, rows):
    return spark.createDataFrame(rows, "text string, score double, rank int")


def test_merge_docs_first_occurrence_order(spark):
    """Reference seen-set loop over docs_a + docs_b + docs_c
    (flow/runners/merge.py:60-68): first occurrence wins, in leg order."""
    v = _leg(spark, [("alpha", 0.9, 1), ("beta", 0.8, 2)])
    f = _leg(spark, [("beta", 0.7, 1), ("gamma", 0.6, 2)])
    g = _leg(spark, [("alpha", 0.5, 1), ("delta", 0.4, 2)])
    out = {r["text"]: r["source"] for r in merge_docs(v, f, g).collect()}
    assert out == {"alpha": "vector", "beta": "vector", "gamma": "fulltext", "delta": "graph"}
    # within-leg duplicate: lowest rank wins
    v2 = _leg(spark, [("x", 0.1, 2), ("x", 0.9, 1)])
    row = merge_docs(v2, None, None).collect()
    assert len(row) == 1 and row[0]["rank"] == 1
    # no dedupe → raw union
    assert merge_docs(v, f, g, deduplicate=False).count() == 6
    # unknown strategy raises (merge.py:57)
    with pytest.raises(ValueError):
        merge_docs(v, None, None, merge_strategy="intersect")
    with pytest.raises(ValueError):
        merge_docs(None, None, None)


def test_rerank_deterministic_and_complete(spark):
    docs = _leg(spark, [("graph join table", 0.1, 3), ("vector scan", 0.2, 2), ("zebra", 0.3, 1)])
    out = rerank_docs("vector scan query", docs).collect()
    assert len(out) == 3  # rerank returns ALL docs, reordered (rerank.py:118)
    ranks = sorted(r["rank"] for r in out)
    assert ranks == [1, 2, 3]
    by_rank = sorted(out, key=lambda r: r["rank"])
    scores = [r["rerank_score"] for r in by_rank]
    assert scores == sorted(scores, reverse=True)
    # deterministic: second run identical
    again = sorted(rerank_docs("vector scan query", docs).collect(), key=lambda r: r["rank"])
    assert [r["text"] for r in again] == [r["text"] for r in by_rank]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "quick quick quick brown foxes everywhere"),
        (3, "a lazy dog sleeps all day long in the sun"),
        (4, "completely unrelated text about spark shuffles"),
        (5, "brown dog and brown fox are friends"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_fulltext_index_shape(spark, corpus):
    idx = build_fulltext_index(corpus)
    p = {(r["term"], r["id"]): r["tf"] for r in idx["postings"].collect()}
    assert p[("quick", 2)] == 3 and p[("the", 1)] == 2
    dl = {r["id"]: r["dl"] for r in idx["doclens"].collect()}
    assert dl[1] == 9
    # analyzer: lowercase + non-word split
    toks = spark.range(1).select(
        analyze_col(F.lit("Hello, World! it's CamelCase-42")).alias("t")
    ).first()["t"]
    assert toks == ["hello", "world", "it", "s", "camelcase", "42"]


def test_bm25_search_ranking(spark, corpus):
    idx = build_fulltext_index(corpus)
    # single keyword: doc 2 (tf=3, shortest) must beat docs 1 and 4 absent
    out = bm25_search(idx, ["quick"], topk=5).collect()
    ids = [r["id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ids[0] == 2 and set(ids) == {1, 2}
    # min_should_match: 80% of 2 keywords → floor(1.6)=1 → docs matching
    # either term qualify; 80% of 3 → floor(2.4)=2
    out2 = bm25_search(idx, ["brown", "dog"], topk=10).collect()
    assert {r["id"] for r in out2} == {1, 2, 3, 5}
    out3 = bm25_search(idx, ["brown", "dog", "lazy"], topk=10).collect()
    assert {r["id"] for r in out3} == {1, 3, 5}  # doc2 matches only 'brown'
    with pytest.raises(ValueError):
        bm25_search(idx, [])


def test_export_for_kg_eval(spark):
    from aperag_spark.operators.export import export_for_kg_eval

    entities = spark.createDataFrame(
        [
            ("Alpha", "org", "d1", ["c1", "c2"]),
            ("Beta", "person", "d2", ["c2"]),
            ("Gamma", "org", "d3", ["c3"]),
        ],
        "entity_id string, entity_type string, description string, source_ids array<string>",
    )
    relations = spark.createDataFrame(
        [
            ("Alpha", "Beta", "works", "k1, k2,", 2.0, ["c1"]),
            ("Alpha", "Zeta", "ghost", "k3", 1.0, ["c9"]),  # Zeta not sampled
        ],
        "src_id string, tgt_id string, description string, keywords string, "
        "weight double, source_ids array<string>",
    )
    chunks = spark.createDataFrame(
        [("c1", "text one"), ("c2", "text two"), ("c3", "text three"), ("c9", "orphan")],
        "chunk_id string, content string",
    )
    out = export_for_kg_eval(entities, relations, chunks, sample_size=2)
    ents = sorted(r["entity_name"] for r in out["entities"].collect())
    assert ents == ["Alpha", "Beta"]  # first-2 of sorted labels (lightrag.py:1155)
    rels = out["relationships"].collect()
    # only edges with BOTH endpoints sampled (lightrag.py:1182-1187)
    assert len(rels) == 1 and rels[0]["source_entity_name"] == "Alpha"
    assert rels[0]["keywords"] == ["k1", "k2"]  # split/strip/drop-empty
    st = {r["content"]: r for r in out["source_texts"].collect()}
    assert set(st) == {"text one", "text two"}  # c3/c9 not linked by sample
    assert st["text one"]["linked_entity_names"] == ["Alpha"]
    assert st["text one"]["linked_edges"] == [["Alpha", "Beta"]]
    assert st["text two"]["linked_entity_names"] == ["Alpha", "Beta"]
    assert st["text two"]["linked_edges"] == []
    # without source texts: chunks not required
    out2 = export_for_kg_eval(entities, relations, sample_size=10, include_source_texts=False)
    assert set(out2) == {"entities", "relationships"}


def test_cjk_bigram_analyzer_bm25(spark):
    """ik-lite (fulltext_index.py:270,286 stand-in): Han runs index as
    overlapping bigrams gated by the lang column; a Chinese query phrase is
    bigrammed by the search analyzer and retrieves the right document,
    while English rows in the same corpus keep the standard analyzer."""
    from aperag_spark.operators.fulltext import (
        analyze_keywords,
        bm25_search,
        build_fulltext_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "机器学习是人工智能的一个分支", "zh"),
            (2, "深度学习需要大量数据", "zh"),
            (3, "machine learning is a branch of ai", "en"),
            (4, "图数据库存储知识图谱", "zh"),
        ],
        "doc_id bigint, text string, lang string",
    )
    idx = build_fulltext_index(docs, lang_col="lang")
    # search analyzer mirrors the index analyzer
    assert analyze_keywords(["机器学习"], cjk=True) == ["机器", "器学", "学习"]
    assert analyze_keywords(["知识图谱", "graph"], cjk=True) == ["知识", "识图", "图谱", "graph"]
    assert analyze_keywords(["单"], cjk=True) == ["单"]
    out = bm25_search(idx, ["机器学习"], topk=2, cjk=True).collect()
    assert out and out[0]["id"] == 1  # the doc containing 机器学习
    out2 = bm25_search(idx, ["知识图谱"], topk=2, cjk=True).collect()
    assert out2 and out2[0]["id"] == 4
    # English doc still reachable through the standard analyzer
    out3 = bm25_search(idx, ["machine", "learning"], topk=2).collect()
    assert out3 and out3[0]["id"] == 3


def test_korean_and_kana_index_and_search(spark):
    """Review finding: the CJK analyzer only covered Han — hangul/kana were
    silently dropped from the index while kept as query terms, so every ko
    search returned nothing. All three scripts now index as bigrams and
    retrieve."""
    from aperag_spark.operators.fulltext import analyze_keywords, bm25_search, build_fulltext_index

    docs = spark.createDataFrame(
        [
            (1, "한국어 문서 검색 테스트", "ko"),
            (2, "カタカナのテキスト", "ja"),
            (3, "ひらがな だけ の ぶん", "ja"),
            (4, "plain english text", "en"),
        ],
        "doc_id bigint, text string, lang string",
    )
    idx = build_fulltext_index(docs, lang_col="lang")
    assert analyze_keywords(["한국어"], cjk=True) == ["한국", "국어"]
    out = bm25_search(idx, ["한국어"], topk=2, cjk=True).collect()
    assert out and out[0]["id"] == 1
    out2 = bm25_search(idx, ["カタカナ"], topk=2, cjk=True).collect()
    assert out2 and out2[0]["id"] == 2
    out3 = bm25_search(idx, ["ひらがな"], topk=2, cjk=True).collect()
    assert out3 and out3[0]["id"] == 3


def test_min_should_match_counts_keyword_clauses(spark):
    """Review finding: ES applies minimum_should_match to per-KEYWORD match
    clauses (fulltext_index.py:206-210), a clause matching if ANY of its
    analyzed tokens matches — not to the flattened token set."""
    from aperag_spark.operators.fulltext import bm25_search, build_fulltext_index

    docs = spark.createDataFrame(
        [(1, "machine learning rocks"), (2, "neural networks rock"), (3, "unrelated")],
        "doc_id bigint, text string",
    )
    idx = build_fulltext_index(docs)
    # 2 keywords → floor(0.8*2)=1 clause required; doc 1 matches the first
    # clause fully and must be returned even though it has 2 of 4 tokens
    out = bm25_search(idx, ["machine learning", "neural networks"], topk=3).collect()
    ids = {r["id"] for r in out}
    assert 1 in ids and 2 in ids and 3 not in ids
