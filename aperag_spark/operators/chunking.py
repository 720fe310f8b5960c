"""Text extraction + token-window chunking as Arrow flat-map operators.

Reference semantics:
  * html→text extraction: aperag/docparser/markitdown_parser.py:25-68
    (rebuild invariant: byte-identical text per url — BASELINE.json input_hint)
  * clean_text: aperag/graph/lightrag/utils.py:467-476
  * doc_id:   "doc-" + md5(ws::clean_text)   — lightrag.py:610-612
  * chunking_by_token_size: operate.py:71-115 (windows of 1200 tokens,
    stride 1100, decode+strip)
  * chunk_id: "chunk-" + md5(ws::content), empty chunks skipped —
    lightrag.py:642-660

Both operators are narrow (no shuffle): one input row → 1 row (texts) or
k rows (chunks). At 100 TB this stage is purely scan-bound; parallelism is
the parquet/Iceberg split count, and the pandas UDF processes Arrow batches
(spark.sql.execution.arrow.maxRecordsPerBatch) with the tokenizer constructed
once per task, not per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from aperag_spark import CHUNK_OVERLAP_TOKEN_SIZE, CHUNK_TOKEN_SIZE
from aperag_spark.textproc import (
    chunking_by_token_size,
    get_tokenizer,
    clean_text,
    compute_mdhash_id,
    extract_text_from_html,
)

TEXTS_SCHEMA = "url string, warc_ts timestamp, doc_id string, text string, lang string"

CHUNKS_SCHEMA = (
    "chunk_id string, full_doc_id string, chunk_order_index int, "
    "tokens int, content string, file_path string"
)


def extract_texts(pages: DataFrame, workspace: str = "", lang_filter: str | None = "en") -> DataFrame:
    """pages → texts: deterministic html→binary extraction + clean_text +
    doc_id assignment. Filters non-target languages upstream (the reference
    only indexes what it is fed; FIXTURES.md F1 filters non-en)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = [clean_text(extract_text_from_html(bytes(h))) for h in pdf["html"]]
            out = pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "doc_id": [
                        compute_mdhash_id(t, prefix="doc-", workspace=workspace)
                        for t in texts
                    ],
                    "text": texts,
                    "lang": pdf["lang"],
                }
            )
            yield out

    if lang_filter is not None:
        pages = pages.where(pages.lang == lang_filter)  # pushed to the scan
    return pages.mapInPandas(_extract, schema=TEXTS_SCHEMA)


def chunk_texts(
    texts: DataFrame,
    workspace: str = "",
    chunk_token_size: int = CHUNK_TOKEN_SIZE,
    overlap_token_size: int = CHUNK_OVERLAP_TOKEN_SIZE,
) -> DataFrame:
    """texts → chunks flat-map (one text row → ceil(tokens/stride) chunk
    rows). file_path carries the url for provenance, mirroring the
    reference's file_path plumbing (lightrag.py:653-657)."""

    def _chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tokenizer = get_tokenizer()  # once per task (factory: tiktoken if available)
        for pdf in batches:
            rows: list[dict] = []
            for url, doc_id, text in zip(pdf["url"], pdf["doc_id"], pdf["text"]):
                # Per-document dict keyed by chunk_id: the reference stores
                # chunks in a dict (lightrag.py:652-657), so a document whose
                # token windows repeat (periodic text) collapses duplicate
                # chunk_ids with LAST-writer values, first-insertion order.
                seen_ids: dict[str, dict] = {}
                for ch in chunking_by_token_size(
                    tokenizer,
                    text,
                    overlap_token_size=overlap_token_size,
                    max_token_size=chunk_token_size,
                ):
                    if not ch["content"]:
                        continue  # empty chunks skipped — lightrag.py:649-651
                    cid = compute_mdhash_id(
                        ch["content"], prefix="chunk-", workspace=workspace
                    )
                    seen_ids[cid] = {
                        "chunk_id": cid,
                        "full_doc_id": doc_id,
                        "chunk_order_index": ch["chunk_order_index"],
                        "tokens": ch["tokens"],
                        "content": ch["content"],
                        "file_path": url,
                    }
                rows.extend(seen_ids.values())
            yield pd.DataFrame(
                rows,
                columns=[
                    "chunk_id",
                    "full_doc_id",
                    "chunk_order_index",
                    "tokens",
                    "content",
                    "file_path",
                ],
            )

    return texts.mapInPandas(_chunk, schema=CHUNKS_SCHEMA)
