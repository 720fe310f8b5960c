"""Entity / relation merge aggregations — the Spark restatement of the
reference's per-key, lock-guarded upsert loop (merge_nodes_and_edges,
operate.py:491-638). A shuffle groupBy gives each key to exactly one reducer,
so the reference's per-entity locks (operate.py:557-637) and the
component-scoped Semaphore(1) (lightrag.py:499-557) have no analog here —
this is the part of the design where Spark is strictly better at scale:
head-entity skew is handled by AQE + two-phase partial aggregation instead
of serializing behind one lock.

Semantics reproduced exactly (citations inline):
  M3  entity-type majority vote, ties → first-seen     operate.py:296-301
  M4  description = '<SEP>'.join(sorted(set))          operate.py:303-304
  M5  source_id / file_path = set union                operate.py:306-310
  M6  LLM summary when fragments >= 10 (stubbed        operate.py:317-336,
      deterministically as SUMMARY:md5[:16])           constants.py:44
  M8  undirected canonical pair (least, greatest)      operate.py:553-555
  M9  weight SUM, sorted-set desc, keyword union       operate.py:406-429
  M10 UNKNOWN stub node per missing endpoint, fields   operate.py:431-443
      from the first edge (insertion order) touching it

Multi-valued fields stay ArrayType internally (SURVEY.md §1.1); the
'<SEP>'-joined rendering is only applied to description (whose join is
order-defined in the reference) — source_ids/file_paths are compared as sets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from aperag_spark import FORCE_LLM_SUMMARY_ON_MERGE, GRAPH_FIELD_SEP

def _occ():
    """Deterministic occurrence key: reproduces the reference's insertion
    order (docs sorted by url, chunks in order, records in order) under any
    shuffle."""
    return F.struct(
        F.col("file_path").alias("u"),
        F.col("chunk_order_index").alias("c"),
        F.col("record_idx").alias("r"),
    )


def _summarized_by_string(frags_col: str, threshold: int):
    """Deterministic stand-in for _handle_entity_relation_summary
    (operate.py:118-149), JVM-side (no UDF). The trigger counts fragments on
    the JOINED string's <SEP> occurrences (operate.py:313-316:
    num_fragment = description.count(SEP)+1), NOT on array size — a single
    extracted fragment that itself embeds '<SEP>' (possible once a real LLM
    replaces the stub extractor) counts as multiple fragments in the
    reference. Shared by the batch path here and the incremental fold-in
    (operators/incremental.py), so both trigger identically."""
    joined = F.array_join(F.col(frags_col), GRAPH_FIELD_SEP)
    n = F.size(F.split(joined, GRAPH_FIELD_SEP))
    return F.when(
        (n > 1) & (n >= threshold),
        F.concat(F.lit("SUMMARY:"), F.substring(F.md5(joined), 1, 16)),
    ).otherwise(joined)


# Backwards-compatible alias (round-1 name).
_summarized_description = _summarized_by_string


def merge_entities(
    raw_entities: DataFrame,
    summary_threshold: int = FORCE_LLM_SUMMARY_ON_MERGE,
) -> DataFrame:
    """raw mention rows → one row per entity_name.

    ONE aggregation pass over the raw rows: the (entity_name, entity_type)
    level-1 aggregate carries the per-type fragment/provenance sets, the
    vote count and the first-occurrence key; the per-entity merge re-folds
    the level-1 sets (set union is associative, sum-of-count == count) and
    the M3 type vote is a window over level-1 directly. The former two
    independent aggregations (fragment merge by name + vote by name,type)
    could not share an exchange — different keys — so the raw mention
    explode upstream executed twice. Level-1 is tiny (distinct (name, type)
    pairs) and lazily checkpointed for its two consumers. Skewed head
    entities are split by AQE (partial aggregation happens map-side, so the
    hot key's reducer sees combined per-type sets).
    """
    lvl1 = (
        raw_entities.groupBy("entity_name", "entity_type")
        .agg(
            F.array_sort(F.collect_set("description")).alias("d"),
            F.array_sort(F.collect_set("source_id")).alias("s"),
            F.array_sort(F.collect_set("file_path")).alias("f"),
            F.count(F.lit(1)).alias("cnt"),
            F.min(_occ()).alias("first_occ"),
        )
        .localCheckpoint(eager=False)
    )
    # M3: vote. Counter + stable sort desc == (count desc, first-seen asc)
    w = Window.partitionBy("entity_name").orderBy(
        F.desc("cnt"), F.asc("first_occ")
    )
    winner = (
        lvl1.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("entity_name", "entity_type")
    )

    merged = lvl1.groupBy("entity_name").agg(
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

    return (
        merged.join(winner, "entity_name")
        .withColumn(
            "description", _summarized_description("description_frags", summary_threshold)
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


def merge_relations(
    raw_relations: DataFrame,
    summary_threshold: int = FORCE_LLM_SUMMARY_ON_MERGE,
) -> DataFrame:
    """raw relation rows → one row per canonical undirected pair."""
    canon = raw_relations.select(
        F.least("src_id", "tgt_id").alias("src_id"),  # M8 operate.py:553-555
        F.greatest("src_id", "tgt_id").alias("tgt_id"),
        "weight",
        "description",
        "keywords",
        "source_id",
        "file_path",
        "chunk_order_index",
        "record_idx",
    )
    merged = canon.groupBy("src_id", "tgt_id").agg(
        F.sum("weight").alias("weight"),  # SUM, not max — operate.py:406
        F.array_sort(
            F.collect_set(F.when(F.col("description") != "", F.col("description")))
        ).alias("description_frags"),
        # keyword union: split each on ',', trim, drop empties, global
        # sorted distinct — operate.py:411-422
        F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.collect_list(
                        F.filter(
                            F.transform(F.split("keywords", ","), lambda x: F.trim(x)),
                            lambda x: x != "",
                        )
                    )
                )
            )
        ).alias("keyword_arr"),
        F.array_sort(
            F.collect_set(F.when(F.col("source_id") != "", F.col("source_id")))
        ).alias("source_ids"),
        F.array_sort(
            F.collect_set(F.when(F.col("file_path") != "", F.col("file_path")))
        ).alias("file_paths"),
        F.min(_occ()).alias("first_occ"),
    )
    return (
        merged.withColumn("keywords", F.array_join("keyword_arr", ","))
        .withColumn("pre_summary_description", F.array_join("description_frags", GRAPH_FIELD_SEP))
        .withColumn(
            "description", _summarized_description("description_frags", summary_threshold)
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


def stub_missing_endpoints(entities: DataFrame, relations: DataFrame) -> DataFrame:
    """M10 — operate.py:431-443: every edge endpoint with no entity row gets
    an UNKNOWN stub whose description/source_id/file_path copy the merged
    edge. The reference creates the stub on first touch and skips later
    edges (`if not has_node`), with insertion-order iteration; we reproduce
    that as min(first_occ) per endpoint. Stub description is the *pre-summary*
    merged edge description (stub creation precedes the summary step in
    operate.py:431-443 vs :445-466).

    Returns entities ∪ stubs with the same schema as merge_entities().
    """
    endpoints = relations.select(
        F.explode(F.array("src_id", "tgt_id")).alias("entity_id"),
        F.col("pre_summary_description").alias("description"),
        F.col("description_frags"),
        "source_ids",
        "file_paths",
        "first_occ",
    )
    missing = endpoints.join(
        entities.select("entity_id"), "entity_id", "left_anti"
    )
    w = Window.partitionBy("entity_id").orderBy(F.asc("first_occ"))
    stubs = (
        missing.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "entity_id",
            F.lit("UNKNOWN").alias("entity_type"),
            "description",
            "description_frags",
            "source_ids",
            "file_paths",
            F.lit(0).alias("mention_count"),
        )
    )
    return entities.unionByName(stubs)


def finalize_relations(relations: DataFrame) -> DataFrame:
    """Drop merge-internal columns for the persisted `relations` table."""
    return relations.select(
        "src_id", "tgt_id", "weight", "description", "keywords", "source_ids", "file_paths"
    )
