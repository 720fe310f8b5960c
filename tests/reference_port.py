"""Faithful plain-Python port of the reference's KG-construction semantics,
used ONLY to produce golden entities/relations for the P/R parity gate
(BASELINE.json: triple P/R >= 0.95). This mirrors the control flow of
/root/reference/aperag/graph/lightrag/{lightrag.py,operate.py} as a
document-at-a-time loop — deliberately NOT Spark — so the Spark pipeline is
checked against an independent execution of the same semantics.

Flow mirrored (citations):
  ainsert_and_chunk_document     lightrag.py:571-687 (clean_text, doc_id,
                                 chunking, chunk ids, empty-chunk skip)
  extract_entities               operate.py:641-814 (per-chunk extract+parse;
                                 gleaning=0 in prod, lightrag_manager.py:45)
  merge_nodes_and_edges          operate.py:491-638
    _merge_nodes_then_upsert     operate.py:233-356
    _merge_edges_then_upsert     operate.py:359-488

Order convention: documents are processed sorted by url; within a chunk,
entity records then relation records (matching the Spark extractor's
record_idx assignment). This pins down the reference's two order-dependent
behaviors (type-vote tie-break via Counter insertion order, stub-node
first-writer) to the same deterministic order the Spark pipeline uses.

The LLM is the deterministic extractor (textproc.deterministic_extract) and
the merge summarizer is textproc.stub_summarize — identical on both sides.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from aperag_spark import FORCE_LLM_SUMMARY_ON_MERGE, GRAPH_FIELD_SEP
from aperag_spark.textproc import (
    Tokenizer,
    get_tokenizer,
    chunking_by_token_size,
    clean_text,
    compute_mdhash_id,
    deterministic_extract,
    extract_text_from_html,
    parse_extraction_result,
    stub_summarize,
)


def run_reference_pipeline(
    pages: list[dict],
    workspace: str = "",
    summary_threshold: int = FORCE_LLM_SUMMARY_ON_MERGE,
    chunk_token_size: int = 1200,
    overlap_token_size: int = 100,
    existing: dict | None = None,
    max_gleaning: int = 0,
) -> dict:
    """pages rows → {'chunks': [...], 'entities': {name: {...}},
    'relations': {(src,tgt): {...}}} with reference merge semantics."""
    tokenizer = get_tokenizer()  # SAME factory as the Spark pipeline

    # --- chunking (lightrag.py:571-687) ---
    chunks: list[dict] = []  # (chunk_id, doc_id, url, order, content)
    for page in sorted(pages, key=lambda p: p["url"]):
        if page["lang"] != "en":
            continue
        content = clean_text(extract_text_from_html(bytes(page["html"])))
        doc_id = compute_mdhash_id(content, prefix="doc-", workspace=workspace)
        seen_ids = {}
        for ch in chunking_by_token_size(
            tokenizer,
            content,
            overlap_token_size=overlap_token_size,
            max_token_size=chunk_token_size,
        ):
            if not ch["content"]:
                continue  # lightrag.py:649-651
            cid = compute_mdhash_id(ch["content"], prefix="chunk-", workspace=workspace)
            seen_ids[cid] = {
                "chunk_id": cid,
                "full_doc_id": doc_id,
                "file_path": page["url"],
                "chunk_order_index": ch["chunk_order_index"],
                "tokens": ch["tokens"],
                "content": ch["content"],
            }
        chunks.extend(seen_ids.values())  # dict collapse: lightrag.py:652

    # --- extraction (operate.py:641-814), gleaning=0 ---
    all_nodes: dict[str, list[dict]] = defaultdict(list)
    all_edges: dict[tuple[str, str], list[dict]] = defaultdict(list)
    for ch in chunks:
        from aperag_spark.textproc import extract_with_gleaning

        entities, relations = extract_with_gleaning(
            ch["content"], max_gleaning=max_gleaning
        )
        rec_idx = 0
        for e in entities:
            all_nodes[e["entity_name"]].append(
                {
                    **e,
                    "source_id": ch["chunk_id"],
                    "file_path": ch["file_path"],
                    "occ": (ch["file_path"], ch["chunk_order_index"], rec_idx),
                }
            )
            rec_idx += 1
        for r in relations:
            key = tuple(sorted((r["src_id"], r["tgt_id"])))  # operate.py:553-555
            all_edges[key].append(
                {
                    **r,
                    "source_id": ch["chunk_id"],
                    "file_path": ch["file_path"],
                    "occ": (ch["file_path"], ch["chunk_order_index"], rec_idx),
                }
            )
            rec_idx += 1

    # --- entity merge (_merge_nodes_then_upsert, operate.py:233-356) ---
    # incremental: fold the existing node in — type as ONE vote appended
    # after new (operate.py:279-301), rendered description as ONE fragment
    # (:291-304), source_ids/file_paths split on <SEP> (:285-289)
    old_entities = (existing or {}).get("entities", {})
    old_relations = (existing or {}).get("relations", {})
    entities: dict[str, dict] = {}
    for name, nodes_data in all_nodes.items():
        nodes_data = sorted(nodes_data, key=lambda d: d["occ"])
        already = old_entities.get(name)
        already_types = [already["entity_type"]] if already else []
        already_descs = [already["description"]] if already else []
        already_sources = set(already["source_ids"]) if already else set()
        already_files = set(already["file_paths"]) if already else set()
        entity_type = sorted(
            Counter(
                [dp["entity_type"] for dp in nodes_data] + already_types
            ).items(),
            key=lambda x: x[1],
            reverse=True,
        )[0][0]  # stable sort → first-seen wins ties (operate.py:296-301)
        frags = sorted(set([dp["description"] for dp in nodes_data] + already_descs))
        description = GRAPH_FIELD_SEP.join(frags)
        num_fragment = description.count(GRAPH_FIELD_SEP) + 1
        if num_fragment > 1 and num_fragment >= summary_threshold:
            description = stub_summarize(GRAPH_FIELD_SEP.join(frags))
        entities[name] = {
            "entity_id": name,
            "entity_type": entity_type,
            "description": description,
            "description_frags": frags,
            "source_ids": set(dp["source_id"] for dp in nodes_data) | already_sources,
            "file_paths": set(dp["file_path"] for dp in nodes_data) | already_files,
        }
    # untouched existing entities persist as-is (no upsert happens for them)
    for name, e in old_entities.items():
        if name not in entities:
            entities[name] = dict(e)

    # --- edge merge (_merge_edges_then_upsert, operate.py:359-488) ---
    # Iterate edges by first-appearance order so the stub-node first-writer
    # rule (operate.py:431-443) is deterministic.
    relations: dict[tuple[str, str], dict] = {}
    edge_order = sorted(all_edges.items(), key=lambda kv: min(d["occ"] for d in kv[1]))
    for (src, tgt), edges_data in edge_order:
        if src == tgt:
            continue  # operate.py:366-367
        # incremental fold (operate.py:372-404): weight into the SUM,
        # rendered description as one fragment, keywords split on ','
        already = old_relations.get((src, tgt))
        already_weights = [already["weight"]] if already else []
        already_descs = [already["description"]] if already else []
        already_kws = [already["keywords"]] if already else []
        already_sources = set(already["source_ids"]) if already else set()
        already_files = set(already["file_paths"]) if already else set()
        weight = sum([dp["weight"] for dp in edges_data] + already_weights)
        frags = sorted(
            set(
                [dp["description"] for dp in edges_data if dp.get("description")]
                + already_descs
            )
        )
        description = GRAPH_FIELD_SEP.join(frags)
        all_keywords: set[str] = set()
        for kw_str in already_kws:
            all_keywords.update(k.strip() for k in kw_str.split(",") if k.strip())
        for dp in edges_data:
            if dp.get("keywords"):
                all_keywords.update(
                    k.strip() for k in dp["keywords"].split(",") if k.strip()
                )
        keywords = ",".join(sorted(all_keywords))
        source_ids = (
            set(dp["source_id"] for dp in edges_data if dp.get("source_id"))
            | already_sources
        )
        file_paths = (
            set(dp["file_path"] for dp in edges_data if dp.get("file_path"))
            | already_files
        )
        # M10 stub nodes, pre-summary description
        for need in (src, tgt):
            if need not in entities:
                entities[need] = {
                    "entity_id": need,
                    "entity_type": "UNKNOWN",
                    "description": description,
                    "description_frags": frags,
                    "source_ids": set(source_ids),
                    "file_paths": set(file_paths),
                }
        num_fragment = description.count(GRAPH_FIELD_SEP) + 1
        if num_fragment > 1 and num_fragment >= summary_threshold:
            description = stub_summarize(GRAPH_FIELD_SEP.join(frags))
        relations[(src, tgt)] = {
            "src_id": src,
            "tgt_id": tgt,
            "weight": weight,
            "description": description,
            "keywords": keywords,
            "source_ids": source_ids,
            "file_paths": file_paths,
        }
    # untouched existing relations persist as-is
    for key, r in old_relations.items():
        if key not in relations:
            relations[key] = dict(r)

    return {"chunks": chunks, "entities": entities, "relations": relations}


def golden_triples(result: dict) -> set[tuple[str, str, str]]:
    """(subj, pred=sorted keyword string, obj) per FIXTURES.md F3."""
    return {
        (src, rel["keywords"], tgt) for (src, tgt), rel in result["relations"].items()
    }
