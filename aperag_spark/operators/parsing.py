"""S2/S3 as a DataFrame operator: multi-format document parsing
(aperag_spark.docparser registry) over a pages-shaped input.

Reference flow: doc_parser.py:51-76 picks a parser by extension, the parser
emits a Part stream, and downstream indexers consume parts (vector path →
Rechunker, graph path → full text). This operator is the narrow flat-map
form: one (url, payload) row → k part rows; no shuffle, parallelism = the
scan's split count. Asset payloads (embedded images) stay as binary cells
in their own rows — they ride the same narrow stage and are never part of
a shuffle key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

PARTS_SCHEMA = (
    "url string, part_index int, kind string, level int, nesting int, "
    "content string, lang string, asset_id string, mime_type string, data binary, "
    "image_url string, alt_text string, title string"
)

_COLS = [c.split(" ")[0] for c in PARTS_SCHEMA.split(", ")]


def parse_pages(
    pages: DataFrame, path_col: str = "url", data_col: str = "html"
) -> DataFrame:
    """(url, binary payload) rows → Part rows via extension dispatch.
    Unparseable rows (NotImplementedError formats, decode errors) degrade to
    a single kind='error' row carrying the message — a poisoned document
    must not fail the batch (doc_parser.py logs and skips likewise)."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from aperag_spark.docparser import parse_document

        for pdf in batches:
            rows: list[dict] = []
            for url, data in zip(pdf[path_col], pdf[data_col]):
                try:
                    parts = parse_document(str(url), bytes(data))
                except Exception as ex:  # noqa: BLE001 — quarantine, never fail the stage
                    rows.append(
                        {
                            "url": url, "part_index": 0, "kind": "error",
                            "level": 0, "nesting": 0, "content": str(ex),
                            "lang": None, "asset_id": None, "mime_type": None,
                            "data": None, "image_url": None, "alt_text": None,
                            "title": None,
                        }
                    )
                    continue
                for idx, p in enumerate(parts):
                    rows.append(
                        {
                            "url": url,
                            "part_index": idx,
                            "kind": p["kind"],
                            "level": p["level"],
                            "nesting": p["nesting"],
                            "content": p["content"],
                            "lang": p["lang"],
                            "asset_id": p["asset_id"],
                            "mime_type": p["mime_type"],
                            "data": p["data"],
                            "image_url": p.get("url"),
                            "alt_text": p.get("alt_text"),
                            "title": p.get("title"),
                        }
                    )
            yield pd.DataFrame(rows, columns=_COLS)

    return pages.select(path_col, data_col).mapInPandas(_parse, schema=PARTS_SCHEMA)
