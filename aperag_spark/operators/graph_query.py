"""Graph read-path operators over the materialized (entities, relations)
tables — Spark restatements of the reference's BaseGraphStorage query surface
(SURVEY.md §2.6).

  G1 node_degree      db/repositories/graph.py:212-229 (batch CTE :378-420)
  G2 edge_degree      kg/pg_ops_sync_graph_storage.py:122-126,186-211
  G3 get_node_edges   db/repositories/graph.py:231-257
  G5 get_all_labels   db/repositories/graph.py:302-315
  G6 bfs subgraph     base.py:525-538; pg impl kg/pg_ops_sync_graph_storage.py:285-388

The reference answers these with per-call SQL against covering indexes; at
Spark scale they are one shuffle each (degree is a groupBy over the exploded
endpoint column) or an iterative bounded join (BFS, same skeleton as
connected components). Edges are stored once per canonical (least, greatest)
pair — direction is moot (G7, operate.py:553-555).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from aperag_spark.operators.windows import rank_bounded
from pyspark.sql import DataFrame


def node_degree(relations: DataFrame) -> DataFrame:
    """G1: #edges touching each node (each canonical edge counts once per
    endpoint). One explode + one groupBy."""
    return (
        relations.select(F.explode(F.array("src_id", "tgt_id")).alias("entity_id"))
        .groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def edge_degree(relations: DataFrame) -> DataFrame:
    """G2: deg(src)+deg(tgt) per edge — join the edge list to the degree
    table twice (degree table is small → broadcast both joins)."""
    deg = F.broadcast(node_degree(relations))
    return (
        relations.select("src_id", "tgt_id")
        .join(deg.withColumnRenamed("entity_id", "src_id").withColumnRenamed("degree", "src_degree"), "src_id")
        .join(deg.withColumnRenamed("entity_id", "tgt_id").withColumnRenamed("degree", "tgt_degree"), "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            (F.col("src_degree") + F.col("tgt_degree")).alias("edge_degree"),
        )
    )


def get_node_edges(relations: DataFrame, node: str) -> DataFrame:
    """G3: all edges touching `node` (stored canonically, so one filter)."""
    return relations.where((F.col("src_id") == node) | (F.col("tgt_id") == node))


def get_all_labels(entities: DataFrame) -> DataFrame:
    """G5: all entity ids, sorted."""
    return entities.select("entity_id").orderBy("entity_id")


def top_k_by_degree(relations: DataFrame, k: int = 20) -> DataFrame:
    """The flagship read query: top-k entities by degree with their total
    edge weight — rank = degree, the reference's ranking signal for entity
    context (operate.py:1239-1368, `rank=degree`). Deterministic tie-break
    by entity_id."""
    contrib = relations.select(
        F.explode(F.array("src_id", "tgt_id")).alias("entity_id"), "weight"
    )
    agg = contrib.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("degree"),
        F.round(F.sum("weight"), 6).alias("total_weight"),
    )
    # orderBy+limit → TakeOrderedAndProject (per-partition heap, driver merge
    # of k rows) instead of funneling the whole entity aggregate through a
    # single-partition row_number window; rank is assigned on the k survivors
    keys = [("degree", "desc"), ("total_weight", "desc"), ("entity_id", "asc")]
    return rank_bounded(agg, keys, k=k).select(
        "rank", "entity_id", "degree", "total_weight"
    )


def bfs_subgraph(
    relations: DataFrame,
    seed: str,
    max_depth: int = 3,
    max_nodes: int = 1000,
) -> DataFrame:
    """G6: bounded BFS from `seed` → (entity_id, depth). Iterative join,
    one round per depth level (bounded, so no checkpoint needed); node cap
    applied at the end like the reference's truncation flag
    (kg/pg_ops_sync_graph_storage.py:285-388)."""
    spark = relations.sparkSession
    sym = (
        relations.select(F.col("src_id").alias("a"), F.col("tgt_id").alias("b"))
        .union(relations.select(F.col("tgt_id").alias("a"), F.col("src_id").alias("b")))
        .localCheckpoint(eager=False)  # joined once per depth — don't
        # recompute the upstream aggregation every round; lazy so the first
        # round's job materializes it instead of paying a separate job
    )

    frontier = spark.createDataFrame([(seed, 0)], "entity_id string, depth int")
    visited = frontier
    for d in range(1, max_depth + 1):
        nxt = (
            sym.join(
                frontier.select(F.col("entity_id").alias("a")).hint("broadcast"), "a"
            )
            .select(F.col("b").alias("entity_id"))
            .distinct()
            .join(visited.select("entity_id"), "entity_id", "left_anti")
            .withColumn("depth", F.lit(d))
        )
        # lazy checkpoint: the early-exit probe (or, on the last round, the
        # caller's action) materializes it — the former eager checkpoint +
        # isEmpty pair cost two driver-blocking jobs per round, the
        # dominant cost of this bounded iteration on small frontiers
        nxt = nxt.localCheckpoint(eager=False)
        if d < max_depth:
            if nxt.isEmpty():
                break
            visited = visited.union(nxt)
            frontier = nxt
        else:
            # final round: no further expansion, so no emptiness probe is
            # needed — an empty union leg is a no-op
            visited = visited.union(nxt)
    return visited.orderBy("depth", "entity_id").limit(max_nodes)
