"""Triple extraction: chunk → (entity | relation) mention rows.

The reference calls an LLM per chunk with the entity_extraction prompt
(operate.py:641-814) and parses the reply's record grammar
(operate.py:686-718, 152-230). The rebuild batches the "LLM" —
a deterministic extractor stub, textproc.deterministic_extract — inside an
Arrow pandas UDF so one Python invocation handles thousands of chunks
(the Spark analog of the reference's Semaphore(20) concurrency cap,
lightrag_manager.py:42). Swapping in a real LLM endpoint means replacing
one function inside the same mapInPandas — the batching, schema, and
downstream plan are unchanged.

Output carries (file_path, chunk_order_index, record_idx) so downstream
aggregations can reproduce the reference's insertion-order-dependent
behaviors (entity-type tie-break operate.py:296-301, stub-node first-writer
operate.py:431-443) deterministically under any shuffle.

Gleaning (operate.py:746-767) is a loop over the same extractor inside the
UDF; production config runs gleaning=0 (lightrag_manager.py:45), which is
what we ship.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from aperag_spark.textproc import deterministic_extract, parse_extraction_result

MENTIONS_SCHEMA = (
    "kind string, entity_name string, entity_type string, description string, "
    "src_id string, tgt_id string, weight double, keywords string, "
    "source_id string, file_path string, chunk_order_index int, record_idx int"
)


def extract_mentions(
    chunks: DataFrame,
    extractor=deterministic_extract,
    max_gleaning: int = 0,
) -> DataFrame:
    """chunks → union of raw entity/relation mention rows (kind column
    discriminates; explode happens here, not in a second pass).

    max_gleaning > 0 runs the reference's gleaning loop inside the same UDF
    (operate.py:746-767; production config is 0, lightrag_manager.py:45)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from aperag_spark.textproc import extract_with_gleaning

        for pdf in batches:
            rows: list[dict] = []
            for chunk_id, content, file_path, chunk_idx in zip(
                pdf["chunk_id"], pdf["content"], pdf["file_path"], pdf["chunk_order_index"]
            ):
                entities, relations = extract_with_gleaning(
                    content, max_gleaning=max_gleaning, extractor=extractor
                )
                rec_idx = 0
                for e in entities:
                    rows.append(
                        {
                            "kind": "entity",
                            "entity_name": e["entity_name"],
                            "entity_type": e["entity_type"],
                            "description": e["description"],
                            "src_id": None,
                            "tgt_id": None,
                            "weight": None,
                            "keywords": None,
                            "source_id": chunk_id,
                            "file_path": file_path,
                            "chunk_order_index": int(chunk_idx),
                            "record_idx": rec_idx,
                        }
                    )
                    rec_idx += 1
                for r in relations:
                    rows.append(
                        {
                            "kind": "relation",
                            "entity_name": None,
                            "entity_type": None,
                            "description": r["description"],
                            "src_id": r["src_id"],
                            "tgt_id": r["tgt_id"],
                            "weight": r["weight"],
                            "keywords": r["keywords"],
                            "source_id": chunk_id,
                            "file_path": file_path,
                            "chunk_order_index": int(chunk_idx),
                            "record_idx": rec_idx,
                        }
                    )
                    rec_idx += 1
            yield pd.DataFrame(rows, columns=[c.split(" ")[0] for c in MENTIONS_SCHEMA.split(", ")])

    return chunks.mapInPandas(_extract, schema=MENTIONS_SCHEMA)


def extract_mentions_fused(
    pages: DataFrame,
    workspace: str = "",
    lang_filter: str | None = "en",
    chunk_token_size: int = 1200,
    overlap_token_size: int = 100,
    extractor=deterministic_extract,
    max_gleaning: int = 0,
) -> DataFrame:
    """Fused narrow pipeline: pages → mentions in ONE mapInArrow — the
    manual operator fusion SURVEY.md §4 anticipates. Everything is per-page
    local (extract text → doc_id → chunk → extract → parse), so fusing is
    semantics-preserving (tested against the staged path) and removes two
    intermediate materializations plus two JVM↔Python Arrow round-trips.
    mapInArrow (not mapInPandas) builds the output RecordBatch directly
    from python lists, skipping pandas DataFrame construction + conversion
    on both sides of the hot stage (~10% measured at 20k pages — pure tax
    at 100 TB). Use when resume granularity at texts/chunks level isn't
    needed."""
    import pyarrow as pa

    from aperag_spark.textproc import (
        chunking_by_token_size,
        clean_text,
        compute_mdhash_id,
        extract_text_from_html,
        get_tokenizer,
    )

    cols = [c.split(" ")[0] for c in MENTIONS_SCHEMA.split(", ")]
    arrow_types = [pa.string()] * 6 + [
        pa.float64(), pa.string(), pa.string(), pa.string(), pa.int32(), pa.int32(),
    ]

    def _fused(batches):
        tokenizer = get_tokenizer()
        for batch in batches:
            out: dict[str, list] = {n: [] for n in cols}
            for url, html in zip(
                batch.column("url").to_pylist(), batch.column("html").to_pylist()
            ):
                text = clean_text(extract_text_from_html(bytes(html)))
                # Dict-collapse duplicate chunk_ids per document before
                # extraction (lightrag.py:652-657 keys chunks by chunk_id):
                # a periodic text whose windows repeat must be extracted once
                # per unique chunk, or relation weights / mention_count
                # inflate vs the reference. Last-writer, insertion order.
                seen_ids: dict[str, dict] = {}
                for ch in chunking_by_token_size(
                    tokenizer,
                    text,
                    overlap_token_size=overlap_token_size,
                    max_token_size=chunk_token_size,
                ):
                    if not ch["content"]:
                        continue
                    cid = compute_mdhash_id(
                        ch["content"], prefix="chunk-", workspace=workspace
                    )
                    seen_ids[cid] = ch
                for chunk_id, ch in seen_ids.items():
                    if max_gleaning > 0:
                        from aperag_spark.textproc import extract_with_gleaning

                        entities, relations = extract_with_gleaning(
                            ch["content"], max_gleaning=max_gleaning, extractor=extractor
                        )
                    else:
                        entities, relations = parse_extraction_result(
                            extractor(ch["content"])
                        )
                    rec_idx = 0
                    for e in entities:
                        out["kind"].append("entity")
                        out["entity_name"].append(e["entity_name"])
                        out["entity_type"].append(e["entity_type"])
                        out["description"].append(e["description"])
                        out["src_id"].append(None)
                        out["tgt_id"].append(None)
                        out["weight"].append(None)
                        out["keywords"].append(None)
                        out["source_id"].append(chunk_id)
                        out["file_path"].append(url)
                        out["chunk_order_index"].append(ch["chunk_order_index"])
                        out["record_idx"].append(rec_idx)
                        rec_idx += 1
                    for r in relations:
                        out["kind"].append("relation")
                        out["entity_name"].append(None)
                        out["entity_type"].append(None)
                        out["description"].append(r["description"])
                        out["src_id"].append(r["src_id"])
                        out["tgt_id"].append(r["tgt_id"])
                        out["weight"].append(r["weight"])
                        out["keywords"].append(r["keywords"])
                        out["source_id"].append(chunk_id)
                        out["file_path"].append(url)
                        out["chunk_order_index"].append(ch["chunk_order_index"])
                        out["record_idx"].append(rec_idx)
                        rec_idx += 1
            yield pa.RecordBatch.from_arrays(
                [pa.array(out[n], type=t) for n, t in zip(cols, arrow_types)],
                names=cols,
            )

    if lang_filter is not None:
        pages = pages.where(pages.lang == lang_filter)
    return pages.select("url", "html").mapInArrow(_fused, MENTIONS_SCHEMA)


def split_mentions(mentions: DataFrame) -> tuple[DataFrame, DataFrame]:
    raw_entities = mentions.where(mentions.kind == "entity").select(
        "entity_name",
        "entity_type",
        "description",
        "source_id",
        "file_path",
        "chunk_order_index",
        "record_idx",
    )
    raw_relations = mentions.where(mentions.kind == "relation").select(
        "src_id",
        "tgt_id",
        "weight",
        "description",
        "keywords",
        "source_id",
        "file_path",
        "chunk_order_index",
        "record_idx",
    )
    return raw_entities, raw_relations
