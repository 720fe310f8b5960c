"""Graph maintenance operators:

  M15 document delete / unindex — lightrag.py:888-1126 (239 LoC): the
  reference walks every entity/edge containing the doc's chunk ids in
  source_id, rewrites or deletes them row by row. The Spark restatement is
  an anti-join on provenance + re-aggregation of the surviving mentions —
  the mentions stage output is the append-only log of record-level facts,
  so "recompute merges over mentions minus the deleted docs" reproduces
  exactly the state the reference reaches by incremental surgery (and is
  idempotent, which the reference's in-place mutation is not).

  Salted two-phase entity aggregation — SURVEY.md §4 skew note: the
  reference serializes hot entities behind one lock (lightrag.py:500); at
  web scale a single head entity can still overwhelm one reducer's
  collect_set. merge_entities_salted splits each key across `salt` partial
  groups, then combines — identical results (verified in tests), bounded
  per-reducer state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from aperag_spark import FORCE_LLM_SUMMARY_ON_MERGE
from aperag_spark.operators.extraction import split_mentions
from aperag_spark.operators.merge import (
    _summarized_description,
    merge_entities,
    merge_relations,
    stub_missing_endpoints,
)


def delete_documents(
    mentions: DataFrame, doc_urls: list[str] | DataFrame
) -> tuple[DataFrame, DataFrame]:
    """M15: remove all facts sourced from the given page urls and return the
    re-aggregated (entities, relations). Entities/edges whose every source
    chunk came from deleted docs disappear (lightrag.py:1015-1046 delete-
    when-empty rule) — they simply have no surviving mention rows."""
    spark = mentions.sparkSession
    if isinstance(doc_urls, list):
        doc_urls = spark.createDataFrame(
            [(u,) for u in doc_urls], "file_path string"
        )
    surviving = mentions.join(
        F.broadcast(doc_urls.select("file_path")), "file_path", "left_anti"
    )
    raw_e, raw_r = split_mentions(surviving)
    relations = merge_relations(raw_r)
    entities = stub_missing_endpoints(merge_entities(raw_e), relations)
    return entities, relations


def rename_entity(
    entities: DataFrame, relations: DataFrame, old_name: str, new_name: str
) -> tuple[DataFrame, DataFrame]:
    """M14 aedit_entity rename (utils_graph.py:150-252): rename a node and
    rewire every edge endpoint; if the new name already exists the two nodes
    merge (the reference refuses in that case unless allow_merge — we merge,
    which is amerge_entities semantics). One-pair alias map through the same
    canonicalize machinery as automated linking."""
    spark = entities.sparkSession
    alias_map = spark.createDataFrame(
        [(old_name, new_name)], "entity_id string, canonical_id string"
    )
    from aperag_spark.operators.linking import canonicalize

    return canonicalize(entities, relations, alias_map)


def delete_entity(
    entities: DataFrame, relations: DataFrame, name: str
) -> tuple[DataFrame, DataFrame]:
    """M14 adelete_by_entity (utils_graph.py:255-305): drop the node and
    every edge touching it."""
    ents = entities.where(F.col("entity_id") != name)
    rels = relations.where(
        (F.col("src_id") != name) & (F.col("tgt_id") != name)
    )
    return ents, rels


def merge_entities_salted(
    raw_entities: DataFrame,
    salt: int = 16,
    summary_threshold: int = FORCE_LLM_SUMMARY_ON_MERGE,
) -> DataFrame:
    """Two-phase salted variant of merge_entities with identical output:
    phase 1 aggregates (entity_name, salt_bucket) partials, phase 2 combines
    per entity_name. Bounded reducer state for head entities."""
    from pyspark.sql import Window

    salted = raw_entities.withColumn(
        "_salt", F.pmod(F.xxhash64("source_id", "record_idx"), F.lit(salt))
    )
    occ = F.struct(
        F.col("file_path").alias("u"),
        F.col("chunk_order_index").alias("c"),
        F.col("record_idx").alias("r"),
    )
    # phase 1: partial aggregates per (name, salt) — and per (name, type, salt)
    p1 = salted.groupBy("entity_name", "_salt").agg(
        F.collect_set("description").alias("d"),
        F.collect_set("source_id").alias("s"),
        F.collect_set("file_path").alias("f"),
        F.count(F.lit(1)).alias("cnt"),
    )
    p1_votes = salted.groupBy("entity_name", "entity_type", "_salt").agg(
        F.count(F.lit(1)).alias("cnt"), F.min(occ).alias("first_occ")
    )
    # phase 2: combine partials per key
    merged = p1.groupBy("entity_name").agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("d")))).alias(
            "description_frags"
        ),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("s")))).alias("source_ids"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("f")))).alias("file_paths"),
        F.sum("cnt").alias("mention_count"),
    )
    votes = p1_votes.groupBy("entity_name", "entity_type").agg(
        F.sum("cnt").alias("cnt"), F.min("first_occ").alias("first_occ")
    )
    w = Window.partitionBy("entity_name").orderBy(F.desc("cnt"), F.asc("first_occ"))
    winner = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("entity_name", "entity_type")
    )
    return (
        merged.join(winner, "entity_name")
        .withColumn(
            "description",
            _summarized_description("description_frags", summary_threshold),
        )
        .select(
            F.col("entity_name").alias("entity_id"),
            "entity_type",
            "description",
            "description_frags",
            "source_ids",
            "file_paths",
            "mention_count",
        )
    )
