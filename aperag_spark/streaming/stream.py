"""Structured-Streaming ingest of `pages` — the continuous-indexing variant
of the batch pipeline.

The reference has no streaming path (SURVEY.md §2.8): new documents arrive
via Celery tasks one at a time (lightrag_manager.py:113-118). The rebuild's
analog is a file-source stream over the pages table: each micro-batch runs
the same narrow extract→chunk→mention operators (identical code, identical
semantics — mapInPandas is streaming-compatible), while the merge
aggregations run either as windowed streaming aggregates (monitoring) or as
periodic batch re-aggregation over the accumulated mention log (the
mentions table is append-only; entity/relation merges are associative
re-aggregations, so batch-recompute over appended data == the reference's
incremental upsert semantics, M7).

Watermarking: warc_ts bounds late data; host-windowed counts demonstrate
the stateful path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aperag_spark.operators.chunking import chunk_texts, extract_texts
from aperag_spark.operators.extraction import extract_mentions
from aperag_spark.synth import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, pages_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream over a pages parquet directory (at production
    scale: Iceberg streaming read / Kafka of WARC pointers)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )


def streaming_mentions(pages_stream: DataFrame, workspace: str = "") -> DataFrame:
    """The stateless prefix of the pipeline applied to a stream — identical
    operator code as batch (extract_texts/chunk_texts/extract_mentions)."""
    texts = extract_texts(pages_stream, workspace)
    chunks = chunk_texts(texts, workspace)
    return extract_mentions(chunks)


def windowed_chunk_rate(
    pages_stream: DataFrame,
    workspace: str = "",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed aggregate: chunks/tokens per host per window —
    the monitoring aggregate for a continuous-indexing deployment.

    Per-doc chunk stats come from one narrow mapInPandas (warc_ts carried
    through) — a stream-stream join back to texts would be disallowed in
    complete mode and needlessly stateful in append mode."""
    import pandas as pd

    from aperag_spark.textproc import chunking_by_token_size, get_tokenizer

    texts = extract_texts(pages_stream, workspace)

    def _stats(batches):
        tok = get_tokenizer()
        for pdf in batches:
            rows = []
            for url, ts, text in zip(pdf["url"], pdf["warc_ts"], pdf["text"]):
                chunks = [
                    c
                    for c in chunking_by_token_size(
                        tok, text, overlap_token_size=100, max_token_size=1200
                    )
                    if c["content"]
                ]
                rows.append(
                    {
                        "url": url,
                        "warc_ts": ts,
                        "n_chunks": len(chunks),
                        "n_tokens": sum(c["tokens"] for c in chunks),
                    }
                )
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "n_chunks", "n_tokens"])

    stats = texts.mapInPandas(
        _stats, "url string, warc_ts timestamp, n_chunks long, n_tokens long"
    )
    return (
        stats.withColumn("host", F.parse_url("url", F.lit("HOST")))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(
            F.sum("n_chunks").alias("n_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_chunks",
            "n_tokens",
        )
    )


def run_stream_to_table(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    workspace: str = "",
):
    """availableNow streaming job: drain all currently-available files into
    a mentions parquet table with exactly-once file-sink semantics, then
    stop. Restart-safe via the checkpoint dir (Spark's own WAL replaces the
    reference's reconciler CAS, reconciler.py:101-169)."""
    mentions = streaming_mentions(read_pages_stream(spark, pages_dir), workspace)
    q = (
        mentions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    return q
