"""Corpus-build operators: the detect → verify → cluster → select chain a
pre-training data pipeline runs over a web corpus, plus the Gopher-style
quality gate. Frame-level (every function takes/returns DataFrames), so the
same operators back three consumers:

  * the oracle battery (queries.py — each op hash-checked vs DuckDB),
  * the staged resumable corpus pipeline (plans/corpus.py),
  * the streaming ingest path (streaming/stream.py).

Scale shape (the reason each op looks the way it does):
  * minhash_docs: ONE Arrow pass per doc emits both the banding signature
    and the pre-hashed verify tokens — chained JVM HOF re-derivations run
    interpreted and re-split the text (measured 7.5s → 1.4s, see the
    hard-won-rules list in the repo build notes).
  * minhash_candidates: bucket-LOCAL pair generation (collect the ≤cap
    members of each (seed, minhash) bucket, emit O(bucket²) pairs from the
    sorted array) — never an all-pairs join; degenerate buckets beyond
    MINHASH_BUCKET_CAP are dropped and observable via bucket stats.
  * cluster_verdict: M1 connected components (hash-min + pointer jumping)
    over the tiny verified edge list, O(log diameter) rounds; the final
    verdict is one doc_id-keyed left join against the corpus.
  * quality_filter: scan-bound narrow projection (no shuffle) — the
    canonical first pass over 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

N_MINHASH = 8
MINHASH_BUCKET_CAP = 64  # standard LSH practice: a bucket this crowded is
# boilerplate (a shingle shared by everything) and carries no dedup signal;
# without the cap, ONE degenerate bucket of 1M docs builds ~10^12 pairs in a
# single task. Dropped buckets are observable via q_dedup_minhash_bucket_stats.
DEDUP_CLUSTER_T = 0.6  # exact-Jaccard threshold declaring two docs duplicates

# hl = the SAME verify tokens as hs, reinterpreted as signed int64 (the
# first 8 md5 digest bytes; byte→2-hex-char is bijective, so |hl ∩ hl'| ==
# |hs ∩ hs'| exactly). The Jaccard verify intersects hl: Spark's
# ArrayIntersect has a primitive-Long fast path (SQLOpenHashSet) where the
# string path pointer-chases a UTF8String per element — the verify stage is
# memory-bandwidth-bound at millions of pairs, so element width is the cost.
# hs stays for the oracle-mirrored consumers and human-readable state.
MINHASH_DOC_SCHEMA = "doc_id bigint, hs array<string>, hl array<long>, mh array<string>"

# Gopher-style quality gate thresholds (Rae et al. 2021 §A1.1, public)
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "on", "for"]
QF_MIN_TOKENS, QF_MAX_TOKENS = 15, 5000
QF_MIN_STOPWORD = 0.01
QF_MIN_DISTINCT_RATIO = 0.2
QF_TOKEN_LEN_RANGE = (2.0, 12.0)


def minhash_doc_batches(it):
    """Arrow-side combined MinHash kernel: ONE text pass per doc emits both
    the verify tokens (hs: 16-hex md5 prefixes of the distinct 3-word
    shingles) and the full signature (mh[k] = min over shingles of
    md5(shingle:k)). Replaces two separate JVM derivations that each
    re-split the text through interpreted HOF chains (the sig expr and the
    verify `sh` subplan) — measured value-identical to both. Word split
    mimics Java String.split (leading empties kept, trailing dropped) so
    the token sets match the F.split/string_split_regex pair the (unchanged)
    oracles use."""
    import hashlib
    import re as _re

    import pyarrow as pa

    sufs = [f":{k}".encode() for k in range(N_MINHASH)]
    md5 = hashlib.md5
    for batch in it:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        od, ohs, ohl, omh = [], [], [], []
        int_fb = int.from_bytes
        for d, t in zip(ids, texts):
            w = _re.split(r"\s+", t or "")
            while w and w[-1] == "":
                w.pop()
            if len(w) < 3:
                continue
            sh = {f"{w[i]} {w[i + 1]} {w[i + 2]}" for i in range(len(w) - 2)}
            enc = [s.encode() for s in sh]
            od.append(d)
            # hs (hex prefix) and hl (same 8 bytes as signed int64) from ONE
            # digest per shingle
            digs = [md5(e).digest()[:8] for e in enc]
            ohs.append([g.hex() for g in digs])
            ohl.append([int_fb(g, "big", signed=True) for g in digs])
            # min over hexdigests == hex of min over raw digests (byte→2
            # lowercase hex chars is order-preserving), so only the per-seed
            # winner pays the hex conversion — the digest() min saves ~40%
            # of this kernel's hashing cost at 8 seeds × |shingles| calls.
            omh.append(
                [min(md5(e + suf).digest() for e in enc).hex() for suf in sufs]
            )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(od, pa.int64()),
                pa.array(ohs, pa.list_(pa.string())),
                pa.array(ohl, pa.list_(pa.int64())),
                pa.array(omh, pa.list_(pa.string())),
            ],
            ["doc_id", "hs", "hl", "mh"],
        )


def minhash_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, hs, mh) per doc with >=1 shingle — the
    single source for the signature, candidate, bucket-stat, and cluster
    consumers."""
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text"
    ).mapInArrow(minhash_doc_batches, MINHASH_DOC_SCHEMA)


def bucket_pairs(buckets: DataFrame, members_col: str = "members") -> DataFrame:
    """Bucket-LOCAL pair generation: emit the O(bucket²) ordered pairs from
    each row's sorted `members_col` array — one aggregation-side expression
    instead of a self-join that recomputes the signature subplan. Callers
    must pre-filter to 2 ≤ size ≤ cap (sequence(1, size-1) descends through
    index 0 on single-member arrays). Shared by the batch candidates op and
    the streaming near-dup fold."""
    return (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.size(members_col) - 1),
                        lambda i: F.transform(
                            F.slice(F.col(members_col), i + 1, F.size(members_col)),
                            lambda m: F.struct(
                                F.element_at(members_col, i).alias("doc_a"),
                                m.alias("doc_b"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
    )


def verify_jaccard(pairs: DataFrame, sigs: DataFrame) -> DataFrame:
    """Exact shingle-Jaccard per candidate pair over the PRE-HASHED verify
    tokens (sigs: doc_id, hs): constant-width keys through the two pair
    joins; round(·, 6) is the cross-engine determinism contract the DuckDB
    oracle mirrors. Shared by the batch candidates op and the streaming
    near-dup fold.

    |A∪B| is computed as |A|+|B|−|A∩B| — hs carries DISTINCT tokens (it is
    set-derived in the kernel), so the identity is exact and the per-pair
    array_union set-build + array materialization (half the verify stage's
    per-task cost over millions of pairs) is replaced by integer math on
    sizes the intersect already requires.

    Join strategy is PINNED to shuffled-hash building the signature side:
    left to AQE, the multi-million-row PAIRS side (~60 MB of ids) slips
    under the broadcast threshold and becomes a driver-built hash relation
    — fast on a quiet heap but observed 4× slower under storage pressure
    (bimodal 8s/31s per-query times), and impossible at scale where the
    pair list dwarfs memory. Shuffled-hash builds only each task's slice of
    the bounded signature table (guide §3.1) — stable here and the only
    shape that survives 100 TB.

    When `sigs` carries the int64 token column `hl` (see
    MINHASH_DOC_SCHEMA), the intersect runs on primitive long arrays —
    bijective with the hex tokens, so |∩| and the Jaccard are bit-identical
    — instead of pointer-chasing a UTF8String per element."""
    tok = "hl" if "hl" in sigs.columns else "hs"
    sh = sigs.select("doc_id", tok)
    inter = F.size(F.array_intersect("t_a", "t_b"))
    return (
        pairs.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col(tok).alias("t_a")).hint(
                "shuffle_hash"
            ),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col(tok).alias("t_b")).hint(
                "shuffle_hash"
            ),
            "doc_b",
        )
        .select(
            F.col("doc_a").cast("bigint").alias("doc_a"),
            F.col("doc_b").cast("bigint").alias("doc_b"),
            F.round(
                inter / (F.size("t_a") + F.size("t_b") - inter),
                6,
            ).alias("jaccard"),
        )
    )


def minhash_candidates(
    md: DataFrame,
    bucket_cap: int = MINHASH_BUCKET_CAP,
    checkpoint: bool = True,
) -> DataFrame:
    """LSH banding + verify over a minhash_docs frame: docs sharing any
    (seed, minhash) bucket become candidate pairs, then exact
    shingle-Jaccard is computed per pair over the PRE-HASHED verify tokens
    (16-hex md5 prefixes: constant-size keys instead of raw 3-word shingle
    strings, so the two pair-joins shuffle a fraction of the bytes; the
    DuckDB oracle applies the SAME hashing, so both engines agree exactly).

    `checkpoint=False` when `md` is already materialized (e.g. read back
    from a pipeline stage) — the default guards the two consumers (banding
    + verify join) from re-executing the Arrow kernel."""
    if checkpoint:
        md = md.localCheckpoint()
    sig = md.select("doc_id", F.posexplode("mh").alias("seed", "minhash"))
    # bucket-local pair generation: group each (seed, minhash) bucket's
    # members and emit the O(bucket²) pairs from the sorted member array —
    # one aggregation instead of a self-join that recomputes the signature
    # subplan twice. Bucket sizes ≤ bucket_cap bound the blow-up
    # (max cap·(cap-1)/2 = 2016 pairs per bucket row) at any scale.
    # (A codegen self-join shape — the fix that took dedup_simhash_pairs
    # from 171s to seconds, where buckets reach 8k members — was A/B'd here
    # and is performance-neutral at this cap: 64-element arrays are cheap
    # even interpreted. Measured 3×-interleaved at sf1.0: 1.2-3.8s vs
    # 1.2-3.0s. Kept the single-scan aggregation form.)
    buckets = (
        sig.groupBy("seed", "minhash")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("members"))
        .where((F.size("members") > 1) & (F.size("members") <= bucket_cap))
    )
    pairs = bucket_pairs(buckets).distinct()
    return verify_jaccard(pairs, md)


def cluster_verdict(
    pairs: DataFrame,
    docs: DataFrame,
    checkpoint: bool = True,
) -> DataFrame:
    """Verified duplicate edges (doc_a, doc_b) + corpus ids → per-doc
    (doc_id, canonical_id, keep): M1 connected components groups transitive
    duplicates (A~B, B~C ⇒ one cluster even if A,C never met in a bucket);
    the canonical survivor per cluster is the min doc_id.

    `checkpoint` guards CC's iterative rounds from re-executing the edge
    subplan; pass False when `pairs` is already a materialized stage."""
    from aperag_spark.operators.components import connected_components

    edges = pairs.select("doc_a", "doc_b")
    if checkpoint:
        edges = edges.localCheckpoint()
    cc = connected_components(edges, src="doc_a", dst="doc_b")
    ids = docs.select(F.col("doc_id").cast("bigint").alias("doc_id"))
    canon = F.coalesce("component", F.col("doc_id"))
    return (
        ids.join(
            cc.select(F.col("node").alias("doc_id"), "component"), "doc_id", "left"
        )
        .select(
            "doc_id",
            canon.cast("bigint").alias("canonical_id"),
            (canon == F.col("doc_id")).alias("keep"),
        )
    )


def quality_filter(docs: DataFrame) -> DataFrame:
    """Gopher-style corpus quality gate (Rae et al. 2021 §A1.1, public):
    per-doc keep/drop with machine-readable reasons — length window,
    stopword floor, repetition (distinct-token ratio), mean token length
    window. One narrow projection; at 100 TB this is the canonical
    pre-training filter pass (scan-bound, no shuffle)."""
    ws = F.split(F.col("text"), r"\s+")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(ws)
    stop_ratio = (
        F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, w))) / n_tokens
    )
    distinct_ratio = F.size(F.array_distinct(ws)) / n_tokens
    tok_len = F.length("text") / n_tokens
    checks = [
        ("too_short", n_tokens < QF_MIN_TOKENS),
        ("too_long", n_tokens > QF_MAX_TOKENS),
        ("low_stopword", stop_ratio < QF_MIN_STOPWORD),
        ("repetitive", distinct_ratio < QF_MIN_DISTINCT_RATIO),
        (
            "weird_token_len",
            (tok_len < QF_TOKEN_LEN_RANGE[0]) | (tok_len > QF_TOKEN_LEN_RANGE[1]),
        ),
    ]
    reasons = F.filter(
        F.array(
            *[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for name, cond in checks]
        ),
        lambda x: x.isNotNull(),
    )
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        (F.size(reasons) == 0).alias("keep"),
        F.array_join(reasons, ",").alias("reasons"),
    )


def select_verdict(quality: DataFrame, clusters: DataFrame) -> DataFrame:
    """The corpus-build ENDPOINT: per-doc selection = quality gate AND
    near-dup keep-list, both component verdicts kept for observability
    (every dropped doc is attributable to quality reasons or a duplicate
    cluster). doc_id-keyed join — at 100 TB both sides are partitioned by
    the same key and the verdict join is co-located."""
    q = quality.select("doc_id", F.col("keep").alias("quality_keep"))
    d = clusters.select("doc_id", F.col("keep").alias("dedup_keep"))
    return q.join(d, "doc_id").select(
        "doc_id",
        "quality_keep",
        "dedup_keep",
        (F.col("quality_keep") & F.col("dedup_keep")).alias("selected"),
    )
