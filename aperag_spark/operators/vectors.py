"""Vector-side operators (SURVEY.md §2.5):

  V1 embed + upsert      kg/pg_ops_sync_vector_storage.py:166-215
  V2 top-k cosine search db/repositories/lightrag.py:321-470 (threshold 0.2,
                         top-60 — lightrag_manager.py:43, base.py:87-88)
  V3 entity VDB content  content = name + "\\n" + description, id ent-<md5>
                         operate.py:580-591
  V4 relation VDB content content = src\\ttgt\\nkeywords\\ndescription,
                         id rel-<md5(src+tgt)> — operate.py:622-633

The reference's embedding model is an external HTTP service; here it is a
deterministic content-derived pseudo-embedding (pandas UDF, batched like the
reference's embedding_batch_num=32 — the swap-in point for a real model).
Search is brute-force cosine with the query broadcast; at corpus scale the
corpus side stays partition-parallel (see queries.q_sim_topk for the
LSH-bucketed candidate path).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from aperag_spark.operators.windows import rank_bounded
from pyspark.sql import DataFrame

EMBED_DIM = 32


def deterministic_embedding(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Pure content-derived unit vector (stand-in for the embed service)."""
    h = hashlib.md5(text.encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    v = rng.standard_normal(dim)
    v = v / np.linalg.norm(v)
    return [float(x) for x in v]


def embed_column(df: DataFrame, text_col: str, dim: int = EMBED_DIM) -> DataFrame:
    """V1: append `embedding array<float>` via an Arrow-batched pandas UDF."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += ", embedding array<float>"

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["embedding"] = [
                deterministic_embedding(t, dim) for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(_embed, schema=out_schema)


def entity_vdb(entities: DataFrame, workspace: str = "") -> DataFrame:
    """V3: entity vector rows. content/id formulas per operate.py:580-591."""
    content = F.concat(F.col("entity_id"), F.lit("\n"), F.col("description"))
    ws = f"{workspace}::" if workspace else ""
    rows = entities.select(
        F.concat(F.lit("ent-"), F.md5(F.concat(F.lit(ws), F.col("entity_id")))).alias("id"),
        F.col("entity_id").alias("entity_name"),
        content.alias("content"),
        F.col("source_ids").alias("chunk_ids"),
    )
    return embed_column(rows, "content")


def relation_vdb(relations: DataFrame, workspace: str = "") -> DataFrame:
    """V4: relation vector rows per operate.py:622-633."""
    content = F.concat(
        F.col("src_id"), F.lit("\t"), F.col("tgt_id"), F.lit("\n"),
        F.col("keywords"), F.lit("\n"), F.col("description"),
    )
    ws = f"{workspace}::" if workspace else ""
    rows = relations.select(
        F.concat(
            F.lit("rel-"), F.md5(F.concat(F.lit(ws), F.col("src_id"), F.col("tgt_id")))
        ).alias("id"),
        "src_id",
        "tgt_id",
        content.alias("content"),
        F.col("source_ids").alias("chunk_ids"),
    )
    return embed_column(rows, "content")


def cosine_col(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return dot / (na * nb)


def topk_search(
    vdb: DataFrame, query_text: str, k: int = 60, threshold: float = 0.2
) -> DataFrame:
    """V2: `1 - (vec <=> q) > threshold ORDER BY distance LIMIT k` —
    db/repositories/lightrag.py:321-470; defaults per lightrag_manager.py:43
    and base.py:87-88 (top-60)."""
    q = F.array(*[F.lit(x) for x in deterministic_embedding(query_text)])
    scored = vdb.withColumn("score", cosine_col(F.col("embedding"), q)).where(
        F.col("score") > threshold
    )
    # TakeOrderedAndProject via orderBy+limit, then rank the k survivors —
    # the vdb can be the whole entity table; a global row_number window
    # would single-task it
    return rank_bounded(scored, [("score", "desc"), ("id", "asc")], k=k)
