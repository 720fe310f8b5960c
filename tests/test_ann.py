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


def test_neardup_lsh_high_threshold_subquadratic(spark):
    """The LSH near-dup scale story: at a TRUE near-dup threshold (0.9),
    narrow buckets (16 bits) with few tables are both sub-quadratic and
    recall-complete on a clustered corpus — the regime where the exact
    block-pair GEMM (q_sim_neardup) must be abandoned at 100 TB."""
    import numpy as np

    from aperag_spark.operators.ann import lsh_bucketize, neardup_pairs_lsh

    rng = np.random.default_rng(7)
    n_clusters, per, dim = 40, 5, 64
    centers = rng.standard_normal((n_clusters, dim))
    vecs, ids = [], []
    for c in range(n_clusters):
        for j in range(per):
            v = centers[c] + 0.05 * rng.standard_normal(dim)  # tight near-dups
            vecs.append(v / np.linalg.norm(v))
            ids.append(c * per + j)
    mat = np.asarray(vecs)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, mat)],
        "vec_id bigint, embedding array<double>",
    )
    # ground truth (driver-side numpy — test oracle only)
    sims = np.round(mat @ mat.T, 6)
    ai, bj = np.where(sims >= 0.9)
    truth = {(int(ids[a]), int(ids[b])) for a, b in zip(ai, bj) if ids[a] < ids[b]}
    assert len(truth) >= n_clusters  # clusters actually produce near-dups

    got = {
        (r["vec_a"], r["vec_b"])
        for r in neardup_pairs_lsh(
            emb, threshold=0.9, dim=dim, n_tables=8, n_bits=16
        ).collect()
    }
    assert got == truth  # exact rescore → precision 1; buckets → recall 1 here

    # sub-quadratic: candidate work Σ bucket·(bucket-1)/2 ≪ n(n-1)/2
    n = len(ids)
    buckets = lsh_bucketize(emb, dim=dim, n_tables=8, n_bits=16)
    sizes = [r["c"] for r in buckets.groupBy("table", "bucket").agg(
        F.count(F.lit(1)).alias("c")).collect()]
    work = sum(s * (s - 1) // 2 for s in sizes)
    assert work < n * (n - 1) // 2 / 4, f"work {work} not sub-quadratic vs {n*(n-1)//2}"


def test_ivf_recall_and_pruning(spark):
    """IVF scale path: nprobe/n_centroids of the corpus scanned per query,
    recall vs brute force stays high; deterministic training (bounded
    md5-ordered sample + seeded Lloyd) makes the index reproducible."""
    from aperag_spark.operators.ann import ivf_assign, ivf_topk, ivf_train_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()

    cents1 = ivf_train_centroids(emb, n_centroids=8, seed=42)
    cents2 = ivf_train_centroids(emb, n_centroids=8, seed=42)
    assert (cents1 == cents2).all()  # deterministic across invocations

    lists = ivf_assign(emb, cents1)
    assert lists.count() == n  # every vector lands in exactly one list
    sizes = [r["c"] for r in lists.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("c")).collect()]
    assert len(sizes) >= 2  # the quantizer actually partitions

    exact = q_sim_topk(spark, SF, n_queries=len(QUERY_IDS), k=K).collect()
    approx = ivf_topk(emb, QUERY_IDS, k=K, n_centroids=8, nprobe=4).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(exact_sets[q] & approx_sets.get(q, set())) / K for q in exact_sets]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.6, f"recall {mean_recall:.2f} ({recalls})"

    # pruning: per-query candidate bound = sum of its nprobe list sizes,
    # which is under the whole corpus even for the 4 biggest lists
    biggest4 = sum(sorted(sizes, reverse=True)[:4])
    assert biggest4 < n, (biggest4, n)
