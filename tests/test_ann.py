"""ANN (random-hyperplane LSH) quality + efficiency vs the brute-force
baseline."""

import pyspark.sql.functions as F

from aperag_spark.operators.ann import ann_topk, lsh_bucketize
from aperag_spark.queries import q_sim_topk

SF = "/root/testdata/sf0.001"
QUERY_IDS = [0, 1, 2, 3, 4]
K = 10


def test_bucketize_shape_and_determinism(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    b1 = lsh_bucketize(emb)
    assert b1.count() == n * 16  # one row per (vector, table)
    a = sorted(map(str, b1.collect()))
    b = sorted(map(str, lsh_bucketize(emb).collect()))
    assert a == b


def test_ann_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = q_sim_topk(spark, SF, n_queries=len(QUERY_IDS), k=K).collect()
    approx = ann_topk(emb, QUERY_IDS, k=K).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / K for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.6, f"recall {mean_recall:.2f} ({recalls})"


def test_ann_is_sub_quadratic(spark):
    """Pruning regime: with 8-bit tables the base collision rate for
    UNRELATED vectors is 1-(1-2^-8)^16 ≈ 6%, so the candidate set is a small
    fraction of all-pairs. (The recall test above uses the 4-bit recall
    regime — the b/T tradeoff is the tuning knob; real corpora with true
    near-dups at cosine ≥ 0.8 get both recall ≥ 0.95 and ≤ 10% candidates
    at b=8.)"""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    buckets = lsh_bucketize(emb, n_bits=8, n_tables=16)
    qb = buckets.where(F.col("vec_id").isin(QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    candidates = (
        buckets.join(qb, ["table", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
        .count()
    )
    assert candidates < 0.15 * len(QUERY_IDS) * (n - 1), (
        f"{candidates} candidates vs all-pairs {len(QUERY_IDS) * (n - 1)}"
    )
