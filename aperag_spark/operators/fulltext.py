"""Fulltext index + BM25 search (SURVEY.md §2 S8/Q10), Spark restatement of
the reference's Elasticsearch leg (aperag/index/fulltext_index.py):

  S8  insert/update/delete index  — fulltext_index.py:44-196: ES documents
      keyed by doc_id with analyzed `content`. Here the "index" is a pair of
      columnar tables — postings (term, id, tf) and doclens (id, dl, plus
      corpus stats) — the shape a distributed engine actually wants: the
      search join shuffles on `term`, and at 100 TB the postings table is
      written partitioned/bucketed by term so a query touches only its
      terms' buckets.
  Q10 search_document — fulltext_index.py:198-233: a bool/should query (one
      match clause per keyword, minimum_should_match "80%"), scored by ES's
      BM25 (k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5))),
      sorted by _score desc, top-k.

Analyzer: lowercase + non-alphanumeric split — the ES `standard` analyzer's
behavior on plain English text (no stemming, matching ES defaults without
language analyzers).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BM25_K1 = 1.2
BM25_B = 0.75


def analyze_col(col):
    """lowercase, split on non-word runs, drop empties → array<string>."""
    return F.filter(
        F.split(F.lower(col), r"[^\w]+"),
        lambda w: w != "",
    )


def build_fulltext_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> dict[str, DataFrame]:
    """S8: docs → {postings, doclens}. postings has one row per (term, doc)
    with the term frequency; doclens carries each doc's analyzed length.
    Corpus stats (N, avgdl) are derived from doclens at query time — they
    are a 1-row aggregate, not a materialization concern.

    Update/delete (fulltext_index.py:91-196) are the generic columnar-table
    upsert/anti-join patterns of operators/maintenance.py applied to these
    two tables keyed by id."""
    terms = docs.select(
        F.col(id_col).alias("id"), F.explode(analyze_col(F.col(text_col))).alias("term")
    )
    postings = terms.groupBy("term", "id").agg(F.count(F.lit(1)).alias("tf"))
    doclens = terms.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    return {"postings": postings, "doclens": doclens}


def bm25_search(
    index: dict[str, DataFrame],
    keywords: list[str],
    topk: int = 3,
    min_should_match: float = 0.8,
) -> DataFrame:
    """Q10: BM25 over the inverted index. One broadcast join of the (tiny)
    keyword list against postings — shuffle key is `term`, so only the
    queried terms' posting lists move — then a per-doc aggregate:
    score = Σ_matched idf(t)·tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)),
    keep docs matching ≥ floor(min_should_match·|keywords|) distinct terms
    (ES truncates percentage minimums), order by score desc, top-k.

    Returns (id, score double, matched int, rank int)."""
    if not keywords:
        raise ValueError("search_document requires keywords (fulltext_index.py:202)")
    spark = index["postings"].sparkSession
    doclens = index["doclens"]
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    kw = spark.createDataFrame([(k.lower(),) for k in set(keywords)], "term string")
    df_by_term = (
        index["postings"]
        .join(F.broadcast(kw), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    matched = (
        index["postings"]
        .join(F.broadcast(kw), "term", "left_semi")
        .join(F.broadcast(df_by_term), "term")
        .join(doclens, "id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = matched.withColumn("term_score", idf * tf_norm)
    required = int(math.floor(min_should_match * len(set(keywords))))
    per_doc = (
        scored.groupBy("id")
        .agg(
            F.round(F.sum("term_score"), 4).alias("score"),
            F.countDistinct("term").cast("int").alias("matched"),
        )
        .where(F.col("matched") >= max(required, 1))
    )
    order = [F.desc("score"), F.asc("id")]
    from pyspark.sql import Window

    w = Window.orderBy(*order)
    # orderBy+limit → TakeOrderedAndProject; rank assigned on the k survivors
    return (
        per_doc.orderBy(*order)
        .limit(topk)
        .withColumn("rank", F.row_number().over(w).cast("int"))
    )
