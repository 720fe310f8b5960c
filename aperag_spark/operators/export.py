"""KG-Eval export (SURVEY.md §2 follow-on; reference
aperag/graph/lightrag/lightrag.py:1128-1280, export_for_kg_eval): project
the materialized graph into the three KG-Eval tables —

  entities      (entity_name, entity_type, description)
  relationships (source_entity_name, target_entity_name, description,
                 keywords array<string>, weight double)
                 — only edges whose BOTH endpoints are in the sampled
                   entity set (lightrag.py:1182-1187)
  source_texts  (content, linked_entity_names array<string>,
                 linked_edges array<array<string>>)
                 — chunks traced back from entity/edge source_ids
                   (lightrag.py:1219-1267)

Sampling is the reference's first-N over get_all_labels() (sorted entity
ids, lightrag.py:1155-1156). Everything is projections + semi-joins +
explode/collect aggregations; collected lists are sorted for determinism
under shuffle (the reference's dict iteration order is its insertion order,
which is the sorted label order)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def export_for_kg_eval(
    entities: DataFrame,
    relations: DataFrame,
    chunks: DataFrame | None = None,
    sample_size: int = 100_000,
    include_source_texts: bool = True,
) -> dict[str, DataFrame]:
    """→ {'entities', 'relationships'[, 'source_texts']} DataFrames."""
    sampled = (
        entities.orderBy("entity_id").limit(sample_size)  # first-N of sorted labels
    )
    ents_out = sampled.select(
        F.col("entity_id").alias("entity_name"),
        "entity_type",
        "description",
    )
    sample_ids = sampled.select("entity_id")
    rels_in = (
        relations.join(
            sample_ids.withColumnRenamed("entity_id", "src_id"), "src_id", "left_semi"
        ).join(
            sample_ids.withColumnRenamed("entity_id", "tgt_id"), "tgt_id", "left_semi"
        )
    )
    rels_out = rels_in.select(
        F.col("src_id").alias("source_entity_name"),
        F.col("tgt_id").alias("target_entity_name"),
        "description",
        # keywords stored '<,>'-joined → list of stripped non-empty
        # (lightrag.py:1204: split(',') + strip + drop empties)
        F.filter(
            F.transform(F.split("keywords", ","), lambda k: F.trim(k)),
            lambda k: k != "",
        ).alias("keywords"),
        F.col("weight").cast("double").alias("weight"),
    )
    result = {"entities": ents_out, "relationships": rels_out}
    if not include_source_texts:
        return result
    if chunks is None:
        raise ValueError("include_source_texts requires the chunks table")

    ent_links = (
        sampled.select("entity_id", F.explode("source_ids").alias("chunk_id"))
        .groupBy("chunk_id")
        .agg(F.array_sort(F.collect_list("entity_id")).alias("linked_entity_names"))
    )
    edge_links = (
        rels_in.select(
            F.array("src_id", "tgt_id").alias("edge"),
            F.explode("source_ids").alias("chunk_id"),
        )
        .groupBy("chunk_id")
        .agg(F.array_sort(F.collect_list("edge")).alias("linked_edges"))
    )
    linked = ent_links.join(edge_links, "chunk_id", "full_outer")
    result["source_texts"] = (
        linked.join(chunks.select("chunk_id", "content"), "chunk_id")
        .select(
            "content",
            F.coalesce(
                "linked_entity_names", F.array().cast("array<string>")
            ).alias("linked_entity_names"),
            F.coalesce(
                "linked_edges", F.array().cast("array<array<string>>")
            ).alias("linked_edges"),
        )
    )
    return result
