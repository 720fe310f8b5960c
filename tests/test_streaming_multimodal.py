"""Streaming ingest (availableNow drain, watermarked window agg) and
multimodal plumbing tests."""

import shutil

import pytest

from aperag_spark.operators.multimodal import (
    decode_media,
    extract_media_features,
    gen_media_df,
)
from aperag_spark.synth import gen_pages_df


def test_streaming_drain_matches_batch(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "mentions_stream")
    ckpt = str(tmp_path / "ckpt")
    gen_pages_df(spark, 30, seed=11, partitions=3).write.parquet(pages_dir)

    from aperag_spark.operators.chunking import chunk_texts, extract_texts
    from aperag_spark.operators.extraction import extract_mentions
    from aperag_spark.streaming.stream import run_stream_to_table

    run_stream_to_table(spark, pages_dir, out_dir, ckpt)
    streamed = spark.read.parquet(out_dir)

    batch = extract_mentions(chunk_texts(extract_texts(spark.read.parquet(pages_dir))))
    assert streamed.count() == batch.count()
    # identical mention multiset
    cols = ["kind", "entity_name", "src_id", "tgt_id", "source_id"]
    assert sorted(map(str, streamed.select(cols).collect())) == sorted(
        map(str, batch.select(cols).collect())
    )

    # restart on same checkpoint: no new data → no duplicates (exactly-once)
    run_stream_to_table(spark, pages_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == batch.count()
    shutil.rmtree(out_dir, ignore_errors=True)


def test_windowed_chunk_rate(spark, tmp_path):
    pages_dir = str(tmp_path / "pages_w")
    gen_pages_df(spark, 20, seed=3, partitions=2).write.parquet(pages_dir)
    from aperag_spark.streaming.stream import read_pages_stream, windowed_chunk_rate

    agg = windowed_chunk_rate(read_pages_stream(spark, pages_dir))
    # complete mode: append would only emit windows the watermark has passed,
    # and the synthetic corpus spans seconds — no window ever closes
    q = (
        agg.writeStream.format("memory")
        .queryName("chunk_rate")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_w"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from chunk_rate").collect()
    # watermark closes all windows under availableNow drain
    assert rows, "windowed aggregate produced no rows"
    assert all(r["n_chunks"] > 0 for r in rows)


def test_decode_media_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image")
    a = decode_media(b"xx", "image", deterministic_fake=True)
    b = decode_media(b"xx", "image", deterministic_fake=True)
    assert a.shape == (16, 16, 3) and (a == b).all()
    assert decode_media(b"xx", "video", deterministic_fake=True).shape == (4, 16, 16, 3)


def test_media_feature_extraction(spark):
    media = gen_media_df(spark, 24, seed=42, partitions=3)
    feats = extract_media_features(media).collect()
    assert len(feats) == 24
    by_id = {r["media_id"]: r for r in feats}
    assert all(len(r["feature"]) == 8 for r in feats)
    assert by_id["m2"]["kind"] == "video" and by_id["m2"]["frames"] == 4
    # determinism
    feats2 = {r["media_id"]: r["feature"] for r in extract_media_features(media).collect()}
    assert all(feats2[r["media_id"]] == r["feature"] for r in feats)


def test_streaming_entity_merge_stateful_matches_batch(spark, tmp_path):
    """applyInPandasWithState entity merge: state folded across multiple
    micro-batches must equal the batch merge (M2-M6) on the same pages —
    arrival order independence via the carried occurrence key."""
    from aperag_spark.operators.chunking import chunk_texts, extract_texts
    from aperag_spark.operators.extraction import extract_mentions, split_mentions
    from aperag_spark.operators.merge import merge_entities
    from aperag_spark.streaming.stream import (
        read_pages_stream,
        streaming_entity_merge,
        streaming_mentions,
    )

    pages_dir = str(tmp_path / "pages")
    pages = gen_pages_df(spark, 60, seed=11, partitions=6)
    pages.write.parquet(pages_dir)

    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=2)
    q = (
        streaming_entity_merge(streaming_mentions(stream))
        .writeStream.format("memory")
        .queryName("entstate")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    updates = spark.sql("select * from entstate").collect()
    assert len(updates) > 0
    # several micro-batches ran: at least one hot entity emitted >1 update
    from collections import Counter

    per_entity = Counter(r["entity_id"] for r in updates)
    assert max(per_entity.values()) > 1
    # final state per entity = the update with the highest mention_count
    final = {}
    for r in updates:
        cur = final.get(r["entity_id"])
        if cur is None or r["mention_count"] > cur["mention_count"]:
            final[r["entity_id"]] = r

    batch_pages = spark.read.parquet(pages_dir)
    raw_e, _ = split_mentions(extract_mentions(chunk_texts(extract_texts(batch_pages))))
    batch = {r["entity_id"]: r for r in merge_entities(raw_e).collect()}

    assert set(final) == set(batch)
    for eid, b in batch.items():
        s = final[eid]
        assert s["mention_count"] == b["mention_count"], eid
        assert s["entity_type"] == b["entity_type"], eid
        assert s["description"] == b["description"], eid
        assert s["source_ids"] == sorted(b["source_ids"]), eid
        assert s["description_frags"] == sorted(b["description_frags"]), eid


def test_streaming_relation_merge_stateful_matches_batch(spark, tmp_path):
    """Relation-side stateful merge across micro-batches equals the batch
    M8-M9 aggregation (weight sum, frag set, keyword union, source union)."""
    from aperag_spark.operators.chunking import chunk_texts, extract_texts
    from aperag_spark.operators.extraction import extract_mentions, split_mentions
    from aperag_spark.operators.merge import merge_relations
    from aperag_spark.streaming.stream import (
        read_pages_stream,
        streaming_mentions,
        streaming_relation_merge,
    )

    pages_dir = str(tmp_path / "pages")
    gen_pages_df(spark, 60, seed=11, partitions=6).write.parquet(pages_dir)

    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=2)
    q = (
        streaming_relation_merge(streaming_mentions(stream))
        .writeStream.format("memory")
        .queryName("relstate")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    updates = spark.sql("select * from relstate").collect()
    final = {}
    for r in updates:
        k = (r["src_id"], r["tgt_id"])
        cur = final.get(k)
        if cur is None or r["weight"] >= cur["weight"]:
            final[k] = r

    batch_pages = spark.read.parquet(pages_dir)
    _, raw_r = split_mentions(extract_mentions(chunk_texts(extract_texts(batch_pages))))
    batch = {(r["src_id"], r["tgt_id"]): r for r in merge_relations(raw_r).collect()}

    assert set(final) == set(batch)
    for k, b in batch.items():
        s = final[k]
        assert abs(s["weight"] - b["weight"]) < 1e-9, k
        assert s["description"] == b["description"], k
        assert sorted(s["keywords"].split(",")) == sorted(b["keywords"].split(",")), k
        assert s["source_ids"] == sorted(x for x in b["source_ids"]), k


def test_incremental_graph_stream_foreachbatch(spark, tmp_path):
    """foreachBatch continuous indexing: versioned snapshots + atomic LATEST
    pointer give exactly-once folds; associative fields equal the
    all-at-once batch merge, and a restart with no new input is a no-op."""
    import json

    from aperag_spark.operators.chunking import chunk_texts, extract_texts
    from aperag_spark.operators.extraction import extract_mentions, split_mentions
    from aperag_spark.operators.merge import merge_entities, merge_relations
    from aperag_spark.streaming.stream import run_incremental_graph_stream

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "graph")
    ckpt = str(tmp_path / "ckpt")
    gen_pages_df(spark, 60, seed=11, partitions=6).write.parquet(pages_dir)

    ptr = run_incremental_graph_stream(
        spark, pages_dir, out_dir, ckpt, max_files_per_trigger=2
    )
    assert ptr is not None and ptr["batch_id"] >= 1  # several folds ran

    ents = {r["entity_id"]: r for r in spark.read.parquet(ptr["entities"]).collect()}
    rels = {
        (r["src_id"], r["tgt_id"]): r
        for r in spark.read.parquet(ptr["relations"]).collect()
    }
    batch_pages = spark.read.parquet(pages_dir)
    raw_e, raw_r = split_mentions(extract_mentions(chunk_texts(extract_texts(batch_pages))))
    be = {r["entity_id"]: r for r in merge_entities(raw_e).collect()}
    br = {(r["src_id"], r["tgt_id"]): r for r in merge_relations(raw_r).collect()}

    # associative fields are batching-invariant (type vote / summary frag
    # folding are NOT — reference semantics count an existing entity as one
    # vote, covered by test_incremental)
    assert set(ents) == set(be)
    for eid, b in be.items():
        assert ents[eid]["mention_count"] == b["mention_count"], eid
        assert sorted(ents[eid]["source_ids"]) == sorted(b["source_ids"]), eid
    assert set(rels) == set(br)
    for k, b in br.items():
        assert abs(rels[k]["weight"] - b["weight"]) < 1e-9, k
        assert sorted(rels[k]["source_ids"]) == sorted(b["source_ids"]), k

    # restart with no new files: pointer unchanged (idempotent no-op)
    before = json.dumps(ptr, sort_keys=True)
    ptr2 = run_incremental_graph_stream(
        spark, pages_dir, out_dir, ckpt, max_files_per_trigger=2
    )
    assert json.dumps(ptr2, sort_keys=True) == before

    # new input arrives: pointer advances, counts grow monotonically
    gen_pages_df(spark, 20, seed=99, partitions=2).write.mode("append").parquet(pages_dir)
    ptr3 = run_incremental_graph_stream(
        spark, pages_dir, out_dir, ckpt, max_files_per_trigger=2
    )
    assert ptr3["batch_id"] > ptr["batch_id"]
    ents3 = spark.read.parquet(ptr3["entities"])
    assert ents3.count() >= len(ents)


def test_resize_and_frame_sampling(spark):
    """resize (nearest-neighbor, real math) and uniform frame sampling over
    the deterministic-fake decode path."""
    import numpy as np

    from aperag_spark.operators.multimodal import (
        _nn_resize,
        frame_sample_indices,
        gen_media_df,
        resize_images,
        sample_video_frames,
    )

    # pure-function checks first
    img = np.arange(4 * 6 * 3, dtype=np.float32).reshape(4, 6, 3)
    out = _nn_resize(img, width=3, height=2)
    assert out.shape == (2, 3, 3)
    assert (out[0, 0] == img[0, 0]).all() and (out[-1, -1] == img[-1, -1]).all()
    assert frame_sample_indices(10, 4) == [0, 3, 6, 9]
    assert frame_sample_indices(2, 8) == [0, 1]
    assert frame_sample_indices(0, 4) == []

    media = gen_media_df(spark, n=12, seed=1).localCheckpoint()
    rs = resize_images(media, width=8, height=8).collect()
    assert rs and all(len(r["pixels"]) == 8 * 8 * 3 for r in rs)
    n_images = media.where("kind = 'image'").count()
    assert len(rs) == n_images

    fr = sample_video_frames(media, n_frames=2).collect()
    n_videos = media.where("kind = 'video'").count()
    assert len(fr) == 2 * n_videos  # fake videos have 4 frames; sample 2
    for r in fr:
        assert r["frame_idx"] in (0, 3) and r["n_frames_total"] == 4
        assert len(r["feature"]) == 8


def test_parser_assets_flow_into_media_pipeline(spark):
    """End-to-end S3→multimodal integration: an HTML page with an embedded
    data-URI image parses into an asset part row, bridges into the media
    table, and yields feature rows — payload bytes never shuffle."""
    import base64
    from hashlib import md5

    from aperag_spark.operators.multimodal import assets_to_media, extract_media_features
    from aperag_spark.operators.parsing import parse_pages

    raw = b"imagebytes-for-integration"
    b64 = base64.b64encode(raw).decode()
    html = f'<html><body><p>pic: <img alt="a" src="data:image/png;base64,{b64}"></p></body></html>'
    pages = spark.createDataFrame(
        [("https://x/a.html", bytearray(html.encode())),
         ("https://x/b.html", bytearray(html.encode()))],  # same asset twice
        "url string, html binary",
    )
    parts = parse_pages(pages)
    media = assets_to_media(parts)
    rows = media.collect()
    assert len(rows) == 1  # deduped by asset id across documents
    assert rows[0]["media_id"] == md5(raw).hexdigest()
    assert rows[0]["kind"] == "image" and bytes(rows[0]["payload"]) == raw
    feats = extract_media_features(media).collect()
    assert len(feats) == 1 and len(feats[0]["feature"]) == 8


def test_streaming_exact_dedup_stateful_matches_batch(spark, tmp_path):
    """streaming_exact_dedup across micro-batches must agree with the batch
    content-hash grouping: same groups, exactly one non-duplicate per hash,
    canonical inside its group, final seen_count = group size. (Canonical
    CHOICE is first-batch-wins by design, so the batch comparison is on
    groups and invariants, which are arrival-order independent.)"""
    import pyspark.sql.functions as F

    from aperag_spark.streaming.stream import streaming_exact_dedup

    docs_dir = str(tmp_path / "docs")
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    # plant guaranteed exact duplicates: a shifted-id copy of 20 docs
    dups = base.limit(20).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    base.unionByName(dups).repartition(6).write.parquet(docs_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(docs_dir)
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedupstate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from dedupstate").collect()

    batch = spark.read.parquet(docs_dir).select(
        "doc_id", F.md5("text").alias("h")
    )
    groups: dict[str, set] = {}
    for r in batch.collect():
        groups.setdefault(r["h"], set()).add(r["doc_id"])

    # every doc got exactly one verdict row
    assert sorted(r["doc_id"] for r in rows) == sorted(
        d for g in groups.values() for d in g
    )
    by_hash: dict[str, list] = {}
    for r in rows:
        by_hash.setdefault(r["h"], []).append(r)
    assert set(by_hash) == set(groups)
    n_dup_groups = 0
    for h, g in groups.items():
        emitted = by_hash[h]
        canons = {r["canonical_doc_id"] for r in emitted}
        assert len(canons) == 1  # one canonical per hash, stable across batches
        canon = canons.pop()
        assert canon in g  # canonical is a member of its group
        keeps = [r for r in emitted if not r["is_duplicate"]]
        assert len(keeps) == 1 and keeps[0]["doc_id"] == canon
        assert max(r["seen_count"] for r in emitted) == len(g)
        if len(g) > 1:
            n_dup_groups += 1
    assert n_dup_groups >= 20  # the planted duplicates were caught


def test_probe_media_real_headers(spark):
    """probe_media parses REAL container headers (PNG IHDR, JPEG SOF0, GIF
    screen descriptor, WAV fmt/data chunks) — exact dimensions/durations
    with zero codec dependencies — and the DataFrame probe keeps payloads
    from shuffling."""
    import struct
    import zlib

    from aperag_spark.operators.multimodal import probe_media, probe_media_df

    # PNG 320x200: signature + IHDR
    ihdr = struct.pack(">II", 320, 200) + b"\x08\x02\x00\x00\x00"
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    # JPEG 640x480: SOI + APP0 + SOF0
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 480, 640) + b"\x01\x01\x11\x00"
    jpg = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    # GIF 12x34
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00\x00\x00"
    # WAV: 2s of 8kHz mono 16-bit => byte_rate 16000, data 32000 bytes
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data_chunk = b"\x00" * 32000
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data_chunk)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data_chunk)) + data_chunk
    )

    assert probe_media(png) == {"mime": "image/png", "width": 320, "height": 200, "duration_s": None}
    j = probe_media(jpg)
    assert (j["mime"], j["width"], j["height"]) == ("image/jpeg", 640, 480)
    g = probe_media(gif)
    assert (g["mime"], g["width"], g["height"]) == ("image/gif", 12, 34)
    w = probe_media(wav)
    assert (w["mime"], w["duration_s"]) == ("audio/wav", 2.0)
    assert probe_media(b"junk bytes") == {"mime": None, "width": None, "height": None, "duration_s": None}

    media = spark.createDataFrame(
        [("a", bytearray(png)), ("b", bytearray(jpg)), ("c", bytearray(wav)), ("d", bytearray(b"??"))],
        "media_id string, data binary",
    )
    rows = {r["media_id"]: r for r in probe_media_df(media).collect()}
    assert rows["a"]["width"] == 320 and rows["a"]["mime"] == "image/png"
    assert rows["b"]["height"] == 480
    assert rows["c"]["duration_s"] == 2.0
    assert rows["d"]["mime"] is None
    assert "data" not in rows["a"].asDict()  # payload dropped before shuffle


def _write_doc_batches(docs_dir, slices):
    """Write each slice as ONE parquet file with strictly increasing mtimes
    so FileStreamSource (which orders files by modification time) delivers
    exactly one slice per micro-batch under maxFilesPerTrigger=1 —
    repartition(N) gives no such guarantee (batch composition then depends
    on hash layout, which made the freeze test flaky)."""
    import glob
    import os
    import shutil

    os.makedirs(docs_dir, exist_ok=True)
    for k, df in enumerate(slices):
        tmp = docs_dir + f"_tmp{k}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(tmp + "/part-*.parquet")[0]
        dst = os.path.join(docs_dir, f"b{k:03d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_000_000_000 + k, 1_000_000_000 + k))
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_neardup_matches_batch_cluster(spark, tmp_path):
    """The streaming near-dup fold (run_streaming_neardup) must reach the
    SAME final verdict as the batch dedup_cluster endpoint when the same
    docs arrive across micro-batches — the regime where the two cap
    semantics coincide (no bucket ever exceeds the cap on this corpus;
    asserted below). Also: restart on the same checkpoint is a no-op."""
    import pyspark.sql.functions as F

    from aperag_spark.operators.corpus import (
        DEDUP_CLUSTER_T,
        cluster_verdict,
        minhash_candidates,
        minhash_docs,
    )
    from aperag_spark.streaming.stream import run_streaming_neardup

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")

    # precondition for exact equality: no bucket over the cap
    md = minhash_docs(docs).localCheckpoint()
    max_bucket = (
        md.select(F.posexplode("mh").alias("seed", "minhash"))
        .groupBy("seed", "minhash")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_bucket <= 64, "corpus no longer cap-free; pick another input"

    docs_dir = str(tmp_path / "docs")
    out = str(tmp_path / "neardup")
    ckpt = str(tmp_path / "ckpt_nd")
    # 4 deterministic micro-batches (any composition is fine here: on a
    # cap-free corpus the final verdict is arrival-order independent)
    _write_doc_batches(
        docs_dir, [docs.where(F.pmod("doc_id", F.lit(4)) == k) for k in range(4)]
    )

    ptr = run_streaming_neardup(spark, docs_dir, out, ckpt, max_files_per_trigger=1)
    assert ptr is not None and ptr["batch_id"] >= 1  # really incremental

    streamed = {
        (r["doc_id"], r["canonical_id"], r["keep"])
        for r in spark.read.parquet(ptr["verdicts"]).collect()
    }
    cand = minhash_candidates(md, checkpoint=False)
    batch = {
        (r["doc_id"], r["canonical_id"], r["keep"])
        for r in cluster_verdict(
            cand.where(F.col("jaccard") >= DEDUP_CLUSTER_T), docs
        ).collect()
    }
    assert streamed == batch
    assert len(streamed) == docs.count()

    # restart on the same checkpoint: nothing new → pointer unchanged
    ptr2 = run_streaming_neardup(spark, docs_dir, out, ckpt, max_files_per_trigger=1)
    assert ptr2 == ptr


def test_streaming_neardup_bucket_freeze(spark, tmp_path):
    """Prefix-cap semantics: once a bucket would overflow the cap it
    freezes — docs arriving later into a frozen bucket produce NO new
    pairs (bounded state and work, the cap's whole point), while
    already-emitted verdicts stand. Built from boilerplate docs that all
    share one shingle set so every bucket is the same."""
    import pyspark.sql.functions as F

    from aperag_spark.streaming.stream import run_streaming_neardup

    text = "alpha beta gamma delta epsilon"

    def _slice(ids):
        return spark.createDataFrame(
            [(i, text) for i in ids], "doc_id long, text string"
        )

    docs_dir = str(tmp_path / "docs_f")
    out = str(tmp_path / "neardup_f")
    # deterministic arrival: {0,1} → {2} → {3} → {4..7}. With cap=3 every
    # bucket (all docs share one shingle set) fills to 3 on batch 2, the
    # batch-3 arrival overflows it (frozen), and batch 4's docs see a
    # frozen bucket.
    _write_doc_batches(
        docs_dir, [_slice([0, 1]), _slice([2]), _slice([3]), _slice([4, 5, 6, 7])]
    )
    ptr = run_streaming_neardup(
        spark,
        docs_dir,
        out,
        str(tmp_path / "ckpt_f"),
        max_files_per_trigger=1,
        bucket_cap=3,
    )
    v = {r["doc_id"]: r for r in spark.read.parquet(ptr["verdicts"]).collect()}
    assert len(v) == 8
    # docs 0,1,2 clustered before the freeze (canonical 0); post-freeze
    # arrivals stay singletons (no retroactive pairing — bounded work)
    assert {i for i in v if not v[i]["keep"]} == {1, 2}
    assert v[1]["canonical_id"] == v[2]["canonical_id"] == 0
    assert all(v[i]["keep"] and v[i]["canonical_id"] == i for i in (0, 3, 4, 5, 6, 7))
    # bucket state growth is bounded: cap members + the single over-cap
    # batch recorded to keep the bucket frozen
    buckets = spark.read.parquet(f"{out}/buckets")
    per_bucket = buckets.groupBy("seed", "minhash").count().collect()
    assert max(r["count"] for r in per_bucket) == 4


def test_streaming_neardup_crash_replay(spark, tmp_path):
    """Crash-replay safety: a batch that crashes AFTER all its state
    appends but BEFORE the pointer swing is replayed by the checkpoint;
    the replay must not read the crashed attempt's own state back
    (double-counted bucket members would mis-freeze buckets and drop
    edges). Final verdicts must equal an uncrashed run's."""
    import pyspark.sql.functions as F

    from aperag_spark.streaming.stream import run_streaming_neardup

    sf = "/root/testdata/sf0.001"
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 120)
    )
    slices = [docs.where(F.pmod("doc_id", F.lit(3)) == k) for k in range(3)]

    crash_dir, clean_dir = str(tmp_path / "dc"), str(tmp_path / "dl")
    _write_doc_batches(crash_dir, slices)
    _write_doc_batches(clean_dir, slices)

    import pytest

    with pytest.raises(Exception, match="injected failure before commit"):
        run_streaming_neardup(
            spark, crash_dir, str(tmp_path / "oc"), str(tmp_path / "kc"),
            fail_before_commit=1,
        )
    # restart on the same checkpoint: batch 1 replays over its own leftovers
    ptr = run_streaming_neardup(
        spark, crash_dir, str(tmp_path / "oc"), str(tmp_path / "kc")
    )
    clean = run_streaming_neardup(
        spark, clean_dir, str(tmp_path / "ol"), str(tmp_path / "kl")
    )
    got = {
        (r["doc_id"], r["canonical_id"], r["keep"])
        for r in spark.read.parquet(ptr["verdicts"]).collect()
    }
    want = {
        (r["doc_id"], r["canonical_id"], r["keep"])
        for r in spark.read.parquet(clean["verdicts"]).collect()
    }
    assert got == want and len(got) == 120
