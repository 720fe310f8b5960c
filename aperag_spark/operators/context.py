"""Query-side context building (SURVEY.md §2.7) — the read path that turns
the materialized graph into LLM context blocks:

  Q3 local mode: seed entities from vector search → rank = node degree →
     1-hop edges + provenance chunks              operate.py:1239-1368
  Q4 chunk ranking: vdb hit order, dedupe by first occurrence
                                                  operate.py:1371-1462
  Q5 edge ordering: (rank=edge degree, weight) desc
                                                  operate.py:1465-1525
  Q6 token-budget truncation: greedy prefix while Σ tokens ≤ budget
                                                  utils.py:252-266, base.py:90-97
  Q7 context dedupe/merge + re-id                 utils.py:269-297
  Q8 global mode: seed relations from vector search → endpoints + chunks
                                                  operate.py:1528-1657
  hybrid = local ∪ global through Q7              operate.py:1169-1231

Everything is joins + windows over the entities/relations/chunks tables; the
vector search seeds come from operators.vectors.topk_search. Token counting
for the budget uses the same tokenizer as chunking, JVM-approximated by the
chunk's stored token count (exact for chunk sections; entity/relation JSON
rows use a whitespace token estimate like the reference's tiktoken count —
deterministic either way)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from aperag_spark.operators.windows import rank_bounded
from pyspark.sql import DataFrame, Window

from aperag_spark.operators.graph_query import node_degree


def rank_entities_local(
    seed_hits: DataFrame, entities: DataFrame, relations: DataFrame
) -> DataFrame:
    """Q3: seed entity hits (id=entity name, rank=vdb order) → entity
    context rows with rank = node degree (operate.py:1295-1310)."""
    deg = node_degree(relations)
    return (
        seed_hits.select(F.col("entity_name").alias("entity_id"), F.col("rank").alias("vdb_rank"))
        .join(entities, "entity_id")
        .join(deg, "entity_id", "left")
        .fillna(0, subset=["degree"])
        .select(
            "entity_id",
            "entity_type",
            "description",
            F.col("degree").alias("rank"),
            "vdb_rank",
            "source_ids",
        )
    )


def one_hop_edges(
    seed_entities: DataFrame, relations: DataFrame, max_edges: int = 1000
) -> DataFrame:
    """Q5: edges touching the seed set, ordered by (edge degree, weight)
    desc (operate.py:1465-1525). Seed set is small → broadcast.

    Scale note: a hub seed can touch millions of edges, so the global
    ordering is done with orderBy().limit(max_edges) — Spark compiles that
    to TakeOrderedAndProject (per-partition partial top-K, no full sort, no
    single-task window over the raw edge table). Only the ≤max_edges
    survivors get the sequential `order` column; the reference truncates
    this list by token budget right after (Q6, utils.py:252-266), so a
    generous cap loses nothing."""
    seeds = F.broadcast(seed_entities.select("entity_id").distinct())
    touching = relations.join(
        seeds.withColumnRenamed("entity_id", "src_id"), "src_id", "left_semi"
    ).unionByName(
        relations.join(
            seeds.withColumnRenamed("entity_id", "tgt_id"), "tgt_id", "left_semi"
        )
    ).dropDuplicates(["src_id", "tgt_id"])
    deg = node_degree(relations)
    ranked = (
        touching.join(deg.withColumnRenamed("entity_id", "src_id").withColumnRenamed("degree", "sd"), "src_id")
        .join(deg.withColumnRenamed("entity_id", "tgt_id").withColumnRenamed("degree", "td"), "tgt_id")
        .withColumn("rank", F.col("sd") + F.col("td"))  # edge_degree — G2
        .drop("sd", "td")
    )
    keys = [("rank", "desc"), ("weight", "desc"), ("src_id", "asc"), ("tgt_id", "asc")]
    return rank_bounded(ranked, keys, k=max_edges, rank_col="order")


def related_chunks(
    seed_entities: DataFrame, chunks: DataFrame
) -> DataFrame:
    """Q4: provenance chunks of the seed entities, ordered by the seed's vdb
    hit order, deduped by first occurrence (operate.py:1371-1462)."""
    prov = seed_entities.select(
        "entity_id", F.col("vdb_rank"), F.explode("source_ids").alias("chunk_id")
    )
    w = Window.partitionBy("chunk_id").orderBy(F.asc("vdb_rank"), F.asc("entity_id"))
    first = prov.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        first.join(chunks, "chunk_id")
        .select("chunk_id", "full_doc_id", "content", "tokens", "vdb_rank")
    )


def truncate_by_token_budget(
    df: DataFrame, order_cols: list, tokens_col: str, budget: int
) -> DataFrame:
    """Q6: greedy prefix while the running token total ≤ budget
    (utils.py:252-266; per-section budgets base.py:90-97)."""
    w = (
        Window.orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("_cum", F.sum(tokens_col).over(w)).where(
        F.col("_cum") <= budget
    ).drop("_cum")


def combine_contexts(*contexts: DataFrame) -> DataFrame:
    """Q7: union context lists, dedupe on all non-id fields keeping the
    FIRST occurrence, reassign sequential ids (utils.py:269-297 —
    process_combine_contexts preserves leg-then-list order, not content
    order). Legs carrying an `_ord` column are ordered by it within their
    leg (leg index = argument position, matching the reference's
    hl-before-ll call order); frames without `_ord` fall back to the
    legacy lexicographic content order. The windows run on the already
    truncated/top-k'd context frames — bounded by construction."""
    has_ord = all("_ord" in c.columns for c in contexts)
    out = contexts[0].withColumn("_leg", F.lit(0))
    for i, c in enumerate(contexts[1:], start=1):
        out = out.unionByName(c.withColumn("_leg", F.lit(i)))
    cols = [c for c in out.columns if c not in ("id", "_leg", "_ord")]
    if has_ord:
        w_first = Window.partitionBy(*cols).orderBy(F.asc("_leg"), F.asc("_ord"))
        first = (
            out.withColumn("_rn", F.row_number().over(w_first))
            .where(F.col("_rn") == 1)
        )
        ranked = rank_bounded(
            first.drop("_rn", "id"),  # a stale leg-local id is re-assigned
            [("_leg", "asc"), ("_ord", "asc")] + [(c, "asc") for c in cols],
            rank_col="id",
            rank_type="string",
        )
        return ranked.drop("_leg", "_ord")
    deduped = out.dropDuplicates(cols).drop("_leg", "id")
    return rank_bounded(
        deduped, [(c, "asc") for c in cols], rank_col="id", rank_type="string"
    )


def build_local_context(
    query_text: str,
    entities: DataFrame,
    relations: DataFrame,
    chunks: DataFrame,
    entity_vdb_df: DataFrame,
    top_k: int = 60,
    token_budget: int = 4000,
) -> dict[str, DataFrame]:
    """Q3+Q4+Q5+Q6 composition — the `local` query mode
    (operate.py:1137-1236 routing)."""
    from aperag_spark.operators.vectors import topk_search

    hits = topk_search(entity_vdb_df, query_text, k=top_k).select(
        "entity_name", "rank"
    )
    seeds = rank_entities_local(hits, entities, relations)
    edges = one_hop_edges(seeds, relations)
    chs = related_chunks(seeds, chunks)
    chs = truncate_by_token_budget(
        chs, [F.asc("vdb_rank"), F.asc("chunk_id")], "tokens", token_budget
    )
    return {"entities": seeds, "relations": edges, "chunks": chs}


def build_naive_context(
    query_text: str,
    chunks: DataFrame,
    chunk_vdb_df: DataFrame,
    top_k: int = 10,
    token_budget: int = 4000,
) -> DataFrame:
    """Q9 naive mode (operate.py:1060-1134, 1769-1836): pure vector top-k
    over chunks + token-budget truncation — no graph involvement."""
    from aperag_spark.operators.vectors import topk_search

    hits = topk_search(chunk_vdb_df, query_text, k=top_k).select(
        F.col("id").alias("chunk_id"), "rank", "score"
    )
    joined = hits.join(chunks, "chunk_id").select(
        "chunk_id", "rank", "score", "content", "tokens"
    )
    return truncate_by_token_budget(
        joined, [F.asc("rank")], "tokens", token_budget
    )


_QUERY_STOP = {
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for",
    "what", "which", "who", "how", "about", "with",
}

# prompt.py:239
FAIL_RESPONSE = "Sorry, I'm not able to provide an answer to that question.[no-context]"

_ENTITY_RUN_RE = re.compile(r"\b[A-Z][\w.&-]*(?: [A-Z][\w.&-]*)*")


def extract_query_keywords(query_text: str, k: int = 8) -> list[str]:
    """Flat keyword list: top-k non-stopword tokens by frequency (ties
    lexicographic). Kept as the simple seeding primitive; the reference's
    hl/ll JSON contract lives in deterministic_keyword_model +
    parse_keywords_response."""
    from collections import Counter

    words = [w.lower().strip(".,;!?\"'") for w in query_text.split()]
    words = [w for w in words if w and w not in _QUERY_STOP]
    counts = Counter(words)
    return [w for w, _ in sorted(counts.items(), key=lambda x: (-x[1], x[0]))[:k]]


def deterministic_keyword_model(query_text: str) -> str:
    """Q1 LLM stand-in (declared swap point): emits the reference's keyword
    response contract — a JSON object {"high_level_keywords": [...],
    "low_level_keywords": [...]} (prompt.py:275-320 keywords_extraction,
    examples format) wrapped in prose, so the caller's `{.*}` extraction
    does real work. Deterministic rule: low-level = capitalized entity-run
    phrases in query order (specific entities/details); high-level =
    remaining non-stopword tokens by (freq desc, lex) (themes/concepts)."""
    import json

    ll: list[str] = []
    consumed: set[str] = set()
    for m in _ENTITY_RUN_RE.finditer(query_text):
        run = m.group(0).rstrip(".,;!?")
        if run.lower() in _QUERY_STOP:
            continue
        if run not in ll:
            ll.append(run)
        consumed.update(w.lower() for w in run.split())
    from collections import Counter

    words = [w.lower().strip(".,;!?\"'") for w in query_text.split()]
    words = [
        w for w in words if w and w not in _QUERY_STOP and w not in consumed
    ]
    counts = Counter(words)
    hl = [w for w, _ in sorted(counts.items(), key=lambda x: (-x[1], x[0]))[:8]]
    payload = json.dumps(
        {"high_level_keywords": hl, "low_level_keywords": ll}
    )
    return f"Here are the extracted keywords:\n{payload}\n"


def parse_keywords_response(result: str) -> tuple[list[str], list[str]]:
    """operate.py:1043-1057: locate the JSON object with re.search(r"{.*}",
    DOTALL); no match or a JSON decode error → ([], []) (the caller's
    empty-keyword fallback rules then fire)."""
    import json

    match = re.search(r"\{.*\}", result, re.DOTALL)
    if not match:
        return [], []
    try:
        data = json.loads(match.group(0))
    except json.JSONDecodeError:
        return [], []
    return (
        data.get("high_level_keywords", []),
        data.get("low_level_keywords", []),
    )


QUERY_MODES = ("local", "global", "hybrid", "naive", "mix", "bypass")


def kg_query_context(
    query_text: str,
    mode: str,
    entities: DataFrame,
    relations: DataFrame,
    chunks: DataFrame,
    entity_vdb_df: DataFrame,
    relation_vdb_df: DataFrame,
    top_k: int = 60,
    token_budget: int = 4000,
    chunk_vdb_df: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Q2 mode routing over all six reference modes (base.py:66-73 mode
    literal; lightrag.py:850-884 dispatch; kg_query operate.py:875-974):

      local / global / hybrid — graph context seeded by extracted keywords
      naive  — pure chunk-vdb top-k, no graph (operate.py:1769-1836);
               requires chunk_vdb_df
      mix    — hybrid graph context + vector text-units retrieved with the
               ORIGINAL query (lightrag.py:848 sets param.original_query;
               operate.py:1207-1231 pulls _get_vector_context from
               chunks_vdb only in mix mode, contributing no entities or
               relations, then process_combine_contexts merges all three);
               requires chunk_vdb_df
      bypass — no retrieval at all (lightrag.py:873-884 calls the LLM
               directly): empty context frames, prompt = the query itself

    Graph modes run the reference's keyword contract first (operate.py:834-856):
    the keyword model's JSON reply is parsed for high/low-level keywords;
    both empty → fail response with empty frames; ll empty in local/hybrid →
    switch to global; hl empty in global/hybrid → switch to local (mix is
    exempt from both switches, exactly as the reference's mode lists say).
    The low-level keywords seed the entity vdb (local leg) and the
    high-level keywords seed the relation vdb (global leg)
    (operate.py:1151-1186 _build_query_context_from_keywords).

    The returned dict carries "mode" = the EFFECTIVE mode after fallback.
    """
    ll_text = hl_text = ""
    if mode in ("local", "global", "hybrid", "mix"):
        hl, ll = parse_keywords_response(deterministic_keyword_model(query_text))
        if hl == [] and ll == []:
            # operate.py:842-844: no keywords at all → fail response
            return {
                "entities": entities.limit(0).select("entity_id", "entity_type", "description"),
                "relations": relations.limit(0).select("src_id", "tgt_id", "weight"),
                "chunks": chunks.limit(0).select("chunk_id", "content"),
                "prompt": FAIL_RESPONSE,
                "mode": mode,
            }
        if ll == [] and mode in ("local", "hybrid"):
            mode = "global"  # operate.py:845-850
        if hl == [] and mode in ("global", "hybrid"):
            mode = "local"  # operate.py:851-856
        ll_text = ", ".join(ll)
        hl_text = ", ".join(hl)
    if mode == "local":
        return build_local_context(
            ll_text, entities, relations, chunks, entity_vdb_df, top_k, token_budget
        ) | {"mode": "local"}
    if mode == "global":
        return build_global_context(
            hl_text, entities, relations, chunks, relation_vdb_df, top_k, token_budget
        ) | {"mode": "global"}
    if mode in ("hybrid", "mix"):
        lo = build_local_context(
            ll_text, entities, relations, chunks, entity_vdb_df, top_k, token_budget
        )
        gl = build_global_context(
            hl_text, entities, relations, chunks, relation_vdb_df, top_k, token_budget
        )
        # leg order mirrors process_combine_contexts call order: hl (global)
        # first, ll (local) second, vector leg last (operate.py:1224-1231);
        # within-leg order = the leg's own retrieval rank
        chunk_sources = [
            gl["chunks"].select(
                "chunk_id", "content", F.col("vdb_rank").cast("long").alias("_ord")
            ).withColumn("id", F.lit("")),
            lo["chunks"].select(
                "chunk_id", "content", F.col("vdb_rank").cast("long").alias("_ord")
            ).withColumn("id", F.lit("")),
        ]
        if mode == "mix":
            if chunk_vdb_df is None:
                raise ValueError("mix mode requires chunk_vdb_df (operate.py:1207)")
            # vector side: text units only, seeded by the ORIGINAL query —
            # the keyword extraction is skipped for the vector leg
            # (operate.py:1208 passes query_param.original_query)
            naive = build_naive_context(
                query_text, chunks, chunk_vdb_df, top_k=top_k, token_budget=token_budget
            )
            chunk_sources.append(
                naive.select(
                    "chunk_id", "content", F.col("rank").cast("long").alias("_ord")
                ).withColumn("id", F.lit(""))
            )
        # combine (operate.py:1169-1231 hybrid, 1224-1231 mix): dedupe on
        # non-id fields, sequential re-id; vector leg contributes empty
        # entity/relation lists (operate.py:1200-1204), so entities and
        # relations combine identically in hybrid and mix
        ents = combine_contexts(
            gl["entities"].select(
                "entity_id", "entity_type", "description",
                F.col("vdb_rank").cast("long").alias("_ord"),
            ).withColumn("id", F.lit("")),
            lo["entities"].select(
                "entity_id", "entity_type", "description",
                F.col("vdb_rank").cast("long").alias("_ord"),
            ).withColumn("id", F.lit("")),
        )
        chs = combine_contexts(*chunk_sources)
        # relations combine like the other sections: hl leg first, real
        # metadata carried through (reference relations_context rows keep
        # description/keywords/weight/rank, operate.py:1335-1357); the hl
        # leg's rank = edge degree like _get_edge_data (operate.py:1571)
        from aperag_spark.operators.graph_query import edge_degree

        gl_rank = edge_degree(relations)
        gl_leg = (
            gl["relations"]
            .join(gl_rank, ["src_id", "tgt_id"], "left")
            .select(
                "src_id", "tgt_id", "description", "keywords", "weight",
                F.coalesce(F.col("edge_degree"), F.lit(0)).cast("long").alias("rank"),
                F.col("vdb_rank").cast("long").alias("_ord"),
            )
            .withColumn("id", F.lit(""))
        )
        lo_leg = (
            lo["relations"]
            .select(
                "src_id", "tgt_id", "description", "keywords", "weight",
                F.col("rank").cast("long").alias("rank"),
                F.col("order").cast("long").alias("_ord"),
            )
            .withColumn("id", F.lit(""))
        )
        rels = combine_contexts(gl_leg, lo_leg)
        return {"entities": ents, "relations": rels, "chunks": chs, "mode": mode}
    if mode == "naive":
        if chunk_vdb_df is None:
            raise ValueError("naive mode requires chunk_vdb_df (operate.py:1769)")
        chs = build_naive_context(
            query_text, chunks, chunk_vdb_df, top_k=top_k, token_budget=token_budget
        )
        return {
            "entities": entities.limit(0).select("entity_id", "entity_type", "description"),
            "relations": relations.limit(0).select("src_id", "tgt_id", "weight"),
            "chunks": chs,
            "mode": "naive",
        }
    if mode == "bypass":
        # no knowledge retrieval: the reference hands the raw query to the
        # LLM with conversation history only (lightrag.py:873-884)
        return {
            "entities": entities.limit(0).select("entity_id", "entity_type", "description"),
            "relations": relations.limit(0).select("src_id", "tgt_id", "weight"),
            "chunks": chunks.limit(0).select("chunk_id", "content"),
            "prompt": query_text,
            "mode": "bypass",
        }
    raise ValueError(f"unknown mode: {mode} (expected one of {QUERY_MODES})")


def build_global_context(
    query_text: str,
    entities: DataFrame,
    relations: DataFrame,
    chunks: DataFrame,
    relation_vdb_df: DataFrame,
    top_k: int = 60,
    token_budget: int = 4000,
) -> dict[str, DataFrame]:
    """Q8: seed relations by vector match → endpoint entities + chunks
    (operate.py:1528-1657)."""
    from aperag_spark.operators.vectors import topk_search

    hits = topk_search(relation_vdb_df, query_text, k=top_k).select(
        "src_id", "tgt_id", F.col("rank").alias("vdb_rank")
    )
    edges = hits.join(relations, ["src_id", "tgt_id"])
    endpoints = (
        edges.select(F.explode(F.array("src_id", "tgt_id")).alias("entity_id"), "vdb_rank")
        .groupBy("entity_id")
        .agg(F.min("vdb_rank").alias("vdb_rank"))
        .join(entities, "entity_id")
        .select("entity_id", "entity_type", "description", "vdb_rank", "source_ids")
    )
    chs = related_chunks(
        endpoints.withColumnRenamed("entity_id", "entity_id"), chunks
    )
    chs = truncate_by_token_budget(
        chs, [F.asc("vdb_rank"), F.asc("chunk_id")], "tokens", token_budget
    )
    return {"entities": endpoints, "relations": edges, "chunks": chs}
