"""Flow-node runners, Spark restatement (SURVEY.md §2 Q11/Q12).

Reference:
  Q11 merge node  — aperag/flow/runners/merge.py:46-69: union of the
      vector / fulltext / graph doc lists, optional dedupe by doc TEXT
      keeping the FIRST occurrence in (vector, fulltext, graph) order.
  Q12 rerank node — aperag/flow/runners/rerank.py:52-120: an external
      rerank service scores (query, doc) pairs and reorders descending;
      on configuration failure the node degrades to the input order.

The rerank "service" here is the same deterministic stand-in family as the
stub embedder (operators/vectors.deterministic_embedding): score =
cosine(query_embedding, doc_embedding), computed JVM-side — swapping in a
real cross-encoder means replacing ONE pandas-UDF scorer, the surrounding
plan (broadcast query, score column, top-k) is unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from aperag_spark.operators.windows import rank_bounded
from pyspark.sql import DataFrame, Window

MERGE_SOURCE_ORDER = ("vector", "fulltext", "graph")  # merge.py:51-60 concat order


def merge_docs(
    vector_docs: DataFrame | None,
    fulltext_docs: DataFrame | None,
    graph_docs: DataFrame | None,
    deduplicate: bool = True,
    merge_strategy: str = "union",
) -> DataFrame:
    """Q11: union the three retrieval legs; if deduplicate, keep the FIRST
    occurrence of each text in (vector, fulltext, graph) leg order, then
    within-leg `rank` order — the Spark form of the reference's
    seen-set loop over docs_a + docs_b + docs_c (merge.py:60-68).

    Inputs share the DocumentWithScore shape: (text string, score double,
    rank int) where rank is the position within its own leg. Output adds
    `source` and keeps one row per text."""
    if merge_strategy != "union":
        raise ValueError(f"Unknown merge strategy: {merge_strategy}")  # merge.py:57
    legs = []
    for pri, (name, df) in enumerate(
        zip(MERGE_SOURCE_ORDER, (vector_docs, fulltext_docs, graph_docs))
    ):
        if df is not None:
            legs.append(
                df.select("text", "score", "rank")
                .withColumn("source", F.lit(name))
                .withColumn("source_pri", F.lit(pri))
            )
    if not legs:
        raise ValueError("merge node needs at least one doc list")
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    if not deduplicate:
        return out.drop("source_pri")
    w = Window.partitionBy("text").orderBy(F.asc("source_pri"), F.asc("rank"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "source_pri")
    )


def rerank_docs(query_text: str, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Q12: deterministic rerank — score every doc against the query with
    the stand-in relevance model, reorder descending (stable tie-break on
    the incoming text). Returns the docs with `rerank_score` and a fresh
    1-based `rank` (rerank.py:118 returns the service's ordering)."""
    from aperag_spark.operators.vectors import cosine_col, deterministic_embedding, embed_column

    q = F.array(*[F.lit(x) for x in deterministic_embedding(query_text)])
    scored = embed_column(docs, text_col).withColumn(
        "rerank_score", F.round(cosine_col(F.col("embedding"), q), 6)
    ).drop("embedding")
    # doc lists at this node are already top-k'd by upstream retrieval —
    # bounded, so the rank runs over k rows, not a table scan
    return rank_bounded(scored, [("rerank_score", "desc"), (text_col, "asc")])
