"""Incremental merge (M7): fold an existing entities/relations snapshot into
a new batch's aggregation — the Spark restatement of the reference's
merge-with-existing upsert:

  _merge_nodes_then_upsert reads the existing node and folds in
    - its entity_type as ONE extra vote, appended AFTER the new types
      (Counter insertion order → existing loses ties to new) operate.py:279-301
    - its rendered description as ONE fragment                operate.py:291-304
    - its source_ids / file_paths split on <SEP>              operate.py:285-289
  _merge_edges_then_upsert folds the existing edge's weight into the SUM,
    description as one fragment, keywords split on ',' union  operate.py:372-429

At scale this replaces per-key `SELECT ... FOR UPDATE` round-trips with one
outer join against the previous snapshot — the incremental batch is usually
small relative to the accumulated graph, so the existing side stays
partitioned and the batch side shuffles to it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from aperag_spark import FORCE_LLM_SUMMARY_ON_MERGE, GRAPH_FIELD_SEP
from aperag_spark.operators.merge import (
    _summarized_by_string,
    merge_relations,
)


def _union_arrays(a, b):
    return F.array_sort(
        F.array_distinct(
            F.concat(
                F.coalesce(a, F.array().cast("array<string>")),
                F.coalesce(b, F.array().cast("array<string>")),
            )
        )
    )


def merge_entities_incremental(
    raw_entities: DataFrame,
    existing: DataFrame,
    summary_threshold: int = FORCE_LLM_SUMMARY_ON_MERGE,
) -> DataFrame:
    """New-batch mention rows + previous `entities` snapshot → merged
    entities with reference fold-in semantics.

    ONE pass over the raw mention rows: a (entity_name, entity_type)-keyed
    level-1 aggregation carries the per-type fragment/provenance sets, the
    vote count and the first-occurrence key; the per-entity merge re-folds
    the level-1 sets (set union is associative, min-of-min == min,
    sum-of-count == count) and the type vote reads level-1 directly. The
    former shape called merge_entities() (whose type vote is DEAD here —
    the voted type is recomputed with the existing snapshot folded in, and
    merge_entities' winner join is 1:1 so dropping it is value-identical)
    and re-aggregated the raw rows a third time for the vote: three
    scan+explode passes over the batch where one suffices. Level-1 is
    lazily checkpointed — it is tiny (distinct (name, type) pairs) and
    feeds both the merge and the vote."""
    lvl1 = (
        raw_entities.groupBy("entity_name", "entity_type")
        .agg(
            F.array_sort(F.collect_set("description")).alias("d"),
            F.array_sort(F.collect_set("source_id")).alias("s"),
            F.array_sort(F.collect_set("file_path")).alias("f"),
            F.count(F.lit(1)).alias("cnt"),
            F.min(
                F.struct(
                    F.col("file_path").alias("u"),
                    F.col("chunk_order_index").alias("c"),
                    F.col("record_idx").alias("r"),
                )
            ).alias("first_occ"),
        )
        .localCheckpoint(eager=False)
    )
    new = lvl1.groupBy("entity_name").agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("d")))).alias(
            "description_frags"
        ),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("s")))).alias(
            "source_ids"
        ),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("f")))).alias(
            "file_paths"
        ),
        F.sum("cnt").alias("mention_count"),
    )

    # re-vote including the existing type as one count, losing ties to new
    # (Counter appends existing AFTER new — operate.py:296-301)
    votes_new = lvl1.select("entity_name", "entity_type", "cnt", "first_occ")
    votes_old = existing.select(
        F.col("entity_id").alias("entity_name"),
        "entity_type",
        F.lit(1).cast("long").alias("cnt"),
        F.struct(
            F.lit("\uffff").alias("u"),  # sorts after every url
            F.lit(2**31 - 1).alias("c"),
            F.lit(2**31 - 1).alias("r"),
        ).alias("first_occ"),
    )
    votes = votes_new.unionByName(votes_old).groupBy("entity_name", "entity_type").agg(
        F.sum("cnt").alias("cnt"), F.min("first_occ").alias("first_occ")
    )
    w = Window.partitionBy("entity_name").orderBy(F.desc("cnt"), F.asc("first_occ"))
    winner = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("entity_name", F.col("entity_type").alias("voted_type"))
    )

    old = existing.select(
        F.col("entity_id").alias("entity_name"),
        F.array(F.col("description")).alias("old_frags"),  # ONE fragment
        F.col("source_ids").alias("old_source_ids"),
        F.col("file_paths").alias("old_file_paths"),
        F.col("mention_count").alias("old_mentions"),
    )
    joined = new.join(old, "entity_name", "full_outer").join(winner, "entity_name")
    merged = joined.select(
        F.col("entity_name").alias("entity_id"),
        F.col("voted_type").alias("entity_type"),
        _union_arrays("description_frags", "old_frags").alias("description_frags"),
        _union_arrays("source_ids", "old_source_ids").alias("source_ids"),
        _union_arrays("file_paths", "old_file_paths").alias("file_paths"),
        (
            F.coalesce("mention_count", F.lit(0))
            + F.coalesce("old_mentions", F.lit(0))
        ).alias("mention_count"),
    )
    return merged.withColumn(
        "description", _summarized_by_string("description_frags", summary_threshold)
    ).select(
        "entity_id",
        "entity_type",
        "description",
        "description_frags",
        "source_ids",
        "file_paths",
        "mention_count",
    )


def merge_relations_incremental(
    raw_relations: DataFrame,
    existing: DataFrame,
    summary_threshold: int = FORCE_LLM_SUMMARY_ON_MERGE,
) -> DataFrame:
    """New-batch relation rows + previous `relations` snapshot (canonical
    pairs) → merged relations: weight SUM, description one-fragment fold,
    keyword union (operate.py:372-429)."""
    new = merge_relations(raw_relations, summary_threshold=10**9)  # defer summary

    old = existing.select(
        "src_id",
        "tgt_id",
        F.col("weight").alias("old_weight"),
        F.array(F.col("description")).alias("old_frags"),
        F.filter(
            F.transform(F.split("keywords", ","), lambda x: F.trim(x)),
            lambda x: x != "",
        ).alias("old_keywords"),
        F.col("source_ids").alias("old_source_ids"),
        F.col("file_paths").alias("old_file_paths"),
    )
    joined = new.join(old, ["src_id", "tgt_id"], "full_outer")
    merged = joined.select(
        "src_id",
        "tgt_id",
        (F.coalesce("weight", F.lit(0.0)) + F.coalesce("old_weight", F.lit(0.0))).alias(
            "weight"
        ),
        _union_arrays("description_frags", "old_frags").alias("description_frags"),
        _union_arrays("keyword_arr", "old_keywords").alias("keyword_arr"),
        _union_arrays("source_ids", "old_source_ids").alias("source_ids"),
        _union_arrays("file_paths", "old_file_paths").alias("file_paths"),
        "first_occ",
    )
    return (
        merged.withColumn("keywords", F.array_join("keyword_arr", ","))
        .withColumn(
            "pre_summary_description",
            F.array_join("description_frags", GRAPH_FIELD_SEP),
        )
        .withColumn(
            "description",
            _summarized_by_string("description_frags", summary_threshold),
        )
        .select(
            "src_id",
            "tgt_id",
            "weight",
            "description",
            "pre_summary_description",
            "description_frags",
            "keywords",
            "keyword_arr",
            "source_ids",
            "file_paths",
            "first_occ",
        )
    )
