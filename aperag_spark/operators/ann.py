"""Approximate nearest neighbor over an embedding column — the scale path
for similarity search (the brute-force baseline is queries.q_sim_topk).

Random-hyperplane LSH (Charikar, STOC'02): each of `n_tables` hash tables
assigns a vector the sign-bit pattern of its dot products with `n_bits`
seeded Gaussian hyperplanes. Vectors sharing a (table, bucket) are candidate
neighbors; candidates are scored exactly and top-k'd. Collision probability
per bit is 1 - θ/π, so recall is tuned by (n_bits, n_tables): fewer bits →
bigger buckets → higher recall & cost.

Scale shape: bucketize is a narrow pandas-UDF pass (numpy GEMM against the
small broadcast plane matrix); the candidate join shuffles on the compact
(table, bucket) key — never all-pairs. At 100 TB the bucket tables are the
materialized "index" (partitioned by (table, bucket)) and queries probe only
their own buckets.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DEFAULT_TABLES = 16
DEFAULT_BITS = 4


def _planes(dim: int, n_tables: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def lsh_bucketize(
    emb: DataFrame,
    dim: int = 64,
    n_tables: int = DEFAULT_TABLES,
    n_bits: int = DEFAULT_BITS,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, table, bucket): one row per (vector, table)."""
    planes = _planes(dim, n_tables, n_bits, seed)
    weights = 1 << np.arange(n_bits)

    def _bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            ids = np.asarray(pdf[id_col], dtype=np.int64)
            out_ids, out_tables, out_buckets = [], [], []
            for t in range(n_tables):
                bits = (mat @ planes[t].T) > 0  # (n, n_bits)
                buckets = bits @ weights
                out_ids.append(ids)
                out_tables.append(np.full(len(ids), t, dtype=np.int32))
                out_buckets.append(buckets.astype(np.int64))
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_ids),
                    "table": np.concatenate(out_tables),
                    "bucket": np.concatenate(out_buckets),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        _bucket, "vec_id bigint, table int, bucket bigint"
    )


def neardup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    dim: int = 64,
    n_tables: int = 24,
    n_bits: int = 2,
    seed: int = 42,
    bucket_cap: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs near-duplicates via LSH blocking + per-bucket exact rescore:
    co-group vectors by (table, bucket), run ONE normalized float64 GEMM per
    bucket (applyInPandas), keep pairs ≥ threshold, dedupe across tables.

    Work is Σ bucket² ≈ n_tables·n²/2^n_bits instead of n² — sub-quadratic
    whenever n_tables < 2^n_bits, which a *near-dup* threshold (≥0.9 →
    per-bit collision p≈0.86) permits with high recall (e.g. 16 bits / 64
    tables → work ~1e-3·n², miss ~1e-3). The default (2 bits / 24 tables) is
    instead tuned recall-EXHAUSTIVE down to cosine 0.4 for the oracle-checked
    test corpora: per-pair miss ≤ (1-0.63²)^24 ≈ 4e-6 at the threshold and
    falling fast above it. Buckets beyond bucket_cap vectors are skipped
    (boilerplate-bucket guard — same rationale as MINHASH_BUCKET_CAP).

    Pair rows, not vectors, shuffle out of the buckets; the n_tables×
    embedding fan-out is the LSH index build cost and is embarrassingly
    parallel."""
    buckets = lsh_bucketize(emb, dim, n_tables, n_bits, seed, id_col, vec_col)
    with_vec = buckets.join(emb.select(id_col, vec_col), id_col)

    # float32 prescreen margin: a 64-term float32 dot of unit vectors has
    # worst-case error ~64·2^-23 ≈ 8e-6, so no pair whose exact float64
    # cosine rounds to >= threshold can fall below threshold - 1e-3. The
    # exact float64 dot + round-6 (the oracle contract) runs only on the
    # survivors — the former full-matrix float64 GEMM + np.round over
    # bucket² entries was the dominant kernel cost.
    lo32 = threshold - 1e-3
    strip = 2048  # bounds the live s32 slab to strip×bucket float32

    def _bucket_gemm(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        n = len(pdf)
        if n < 2 or n > bucket_cap:
            return empty
        ids = np.asarray(pdf[id_col], dtype=np.int64)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        order = np.argsort(ids)  # index order == id order ⇒ triangle == a<b
        ids, mat = ids[order], mat[order]
        m32 = mat.astype(np.float32)
        oa, ob, oc = [], [], []
        for i0 in range(0, n, strip):
            i1 = min(i0 + strip, n)
            s32 = m32[i0:i1] @ m32[i0:].T  # rows i0..i1 vs cols i0.. (j >= i0)
            ai, bj = np.nonzero(s32 >= lo32)
            keep = bj > ai  # strict upper triangle in global indices
            ai, bj = ai[keep] + i0, bj[keep] + i0
            sims = np.round(np.einsum("ij,ij->i", mat[ai], mat[bj]), 6)
            keep = sims >= threshold
            oa.append(ids[ai[keep]])
            ob.append(ids[bj[keep]])
            oc.append(sims[keep])
        if not oa:
            return empty
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(oa),
                "vec_b": np.concatenate(ob),
                "cosine": np.concatenate(oc),
            }
        )

    pairs = with_vec.groupBy("table", "bucket").applyInPandas(
        _bucket_gemm, "vec_a bigint, vec_b bigint, cosine double"
    )
    # a pair found in k buckets has the same rounded cosine each time (same
    # two normalized float64 vectors); max() is a belt-and-braces dedupe
    return pairs.groupBy("vec_a", "vec_b").agg(F.max("cosine").alias("cosine"))


def ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    dim: int = 64,
    n_tables: int = DEFAULT_TABLES,
    n_bits: int = DEFAULT_BITS,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k for the given query vector ids: bucket join →
    distinct candidates → exact cosine → window top-k per query."""
    buckets = lsh_bucketize(emb, dim, n_tables, n_bits, seed)
    qb = buckets.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    candidates = (
        buckets.join(F.broadcast(qb), ["table", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    q = emb.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    from aperag_spark.queries import _cosine

    scored = (
        candidates.join(emb, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cosine(F.col("qe"), F.col("embedding")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path alongside LSH, the
# standard coarse-quantizer layout (Jégou et al., PAMI'11 / faiss IVF):
# k-means centroids partition the corpus into posting lists; a query probes
# only its nprobe nearest lists. Training follows faiss practice: centroids
# are learned on a BOUNDED deterministic sample (driver-side numpy Lloyd
# iterations — the sample matrix is tiny), then assignment is one
# distributed GEMM pass against the broadcast centroid matrix.
# ---------------------------------------------------------------------------


def ivf_train_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 5,
    seed: int = 42,
    sample_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic seeded k-means on a bounded sample.

    The sample is the sample_cap vectors with the smallest md5(vec_id) —
    order-free and engine-independent, so training is reproducible
    regardless of partitioning. Lloyd runs driver-side on the (≤sample_cap,
    dim) matrix: at any corpus size this is constant work, the faiss
    train-on-sample pattern. Returns L2-normalized centroids (spherical
    k-means — assignment by max dot product = max cosine)."""
    sample = (
        emb.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(sample_cap)
        .collect()
    )
    mat = np.asarray([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    init = rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)
    cent = mat[np.sort(init)].copy()
    for _ in range(n_iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, centroid_id): the IVF posting lists. One narrow
    mapInPandas GEMM against the broadcast centroid matrix; at scale the
    result is materialized partitioned by centroid_id so probes read only
    their lists."""
    cent = np.asarray(centroids, dtype=np.float64)

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            # argmax over ROUND-6 cosine with lowest-centroid-id tiebreak
            # (np.argmax returns the first maximum): the cross-engine
            # determinism contract — a DuckDB oracle computing
            # round(list_cosine_similarity(raw, raw), 6) lands on the same
            # float64, so assignment is bit-agreed instead of hanging on
            # the last bit of two differently-associated dot products.
            yield pd.DataFrame(
                {
                    "vec_id": np.asarray(pdf[id_col], dtype=np.int64),
                    "centroid_id": np.argmax(
                        np.round(mat @ cent.T, 6), axis=1
                    ).astype(np.int32),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        _assign, "vec_id bigint, centroid_id int"
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 4096,
) -> DataFrame:
    """IVF search: per query, probe the nprobe centroids nearest its vector,
    exact-cosine the union of those posting lists, window top-k. Work per
    query ≈ nprobe/n_centroids of the corpus instead of all of it.

    sample_cap == n_centroids with n_iters=0 degenerates training to "the
    n_centroids smallest-md5(vec_id) vectors ARE the quantizer" — no rng,
    no Lloyd — which is the SQL-expressible configuration the DuckDB
    oracle (queries.q_sim_ann_ivf) rebuilds to check the assignment +
    probe + top-k machinery end-to-end."""
    centroids = ivf_train_centroids(
        emb, n_centroids, n_iters, seed, sample_cap, id_col=id_col, vec_col=vec_col
    )
    lists = ivf_assign(emb, centroids, id_col, vec_col)

    q_rows = emb.where(F.col(id_col).isin(query_ids)).select(id_col, vec_col).collect()
    qmat = np.asarray([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    # same round-6 + lowest-id tiebreak contract as ivf_assign (stable
    # argsort keeps ascending centroid order within a rounded tie)
    order = np.argsort(
        -np.round(qmat @ centroids.T, 6), axis=1, kind="stable"
    )[:, :nprobe]
    probe_rows = [
        (int(r[id_col]), int(c)) for r, cs in zip(q_rows, order) for c in cs
    ]
    spark = emb.sparkSession
    probes = spark.createDataFrame(probe_rows, "query_id bigint, centroid_id int")

    candidates = (
        lists.join(F.broadcast(probes), "centroid_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe")
    )
    from aperag_spark.queries import _cosine

    scored = (
        candidates.join(emb.select(id_col, vec_col), "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cosine(F.col("qe"), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
