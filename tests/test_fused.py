"""Fused pages→mentions narrow stage must equal the staged path exactly."""

from aperag_spark.operators.chunking import chunk_texts, extract_texts
from aperag_spark.operators.extraction import extract_mentions, extract_mentions_fused
from aperag_spark.synth import PAGES_SCHEMA, gen_pages_local


def test_fused_equals_staged(spark):
    pages = spark.createDataFrame(gen_pages_local(30, seed=5), schema=PAGES_SCHEMA)
    staged = extract_mentions(chunk_texts(extract_texts(pages)))
    fused = extract_mentions_fused(pages)
    cols = sorted(staged.columns)
    assert sorted(map(str, staged.select(cols).collect())) == sorted(
        map(str, fused.select(cols).collect())
    )
