"""aperag_spark — a from-scratch PySpark-native rebuild of the
knowledge-graph construction pipeline of apecloud/ApeRAG (GraphRAG / LightRAG
indexing), plus the large-scale data-pipeline operators (dedup, similarity
search, text analysis) a 100 TB training-data pipeline needs.

Architecture (Spark-first, NOT a port):

    pages (url, warc_ts, html, text, lang)        # Iceberg/parquet scan
      └─ texts      : html→text extraction (Arrow pandas UDF, byte-identical)
      └─ chunks     : token-window chunking (mapInPandas flat-map)
      └─ mentions   : deterministic extraction + record-grammar parse
      └─ raw_entities / raw_relations (explode)
      └─ entities / relations           : two shuffle groupBy aggregations
      └─ alias_map  : MinHash-LSH blocking + connected components
      └─ entities_canonical / relations_canonical

All Python logic runs in Arrow-batched pandas UDFs; everything else is
DataFrame expressions that Catalyst optimizes (pushdown, pruning, AQE).
Reference semantics are cited per function as /root/reference file:line.
"""

__version__ = "0.1.0"

GRAPH_FIELD_SEP = "<SEP>"  # reference: aperag/graph/lightrag/prompt.py:38
TUPLE_DELIMITER = "<|>"  # prompt.py:43
RECORD_DELIMITER = "##"  # prompt.py:44
COMPLETION_DELIMITER = "<|COMPLETE|>"  # prompt.py:45
DEFAULT_ENTITY_TYPES = [
    "organization",
    "person",
    "geo",
    "event",
    "product",
    "technology",
    "category",
]  # prompt.py:47-56

# Production constants — aperag/graph/lightrag_manager.py:40-47
CHUNK_TOKEN_SIZE = 1200
CHUNK_OVERLAP_TOKEN_SIZE = 100
FORCE_LLM_SUMMARY_ON_MERGE = 10
ENTITY_EXTRACT_MAX_GLEANING = 0
