"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed by Arrow-batched pandas UDFs over
mapInPandas.

The reference parses documents via MarkItDown and stores extracted assets to
object storage (aperag/index/document_parser.py:95-126, S4); it has no media
feature extraction. This module provides the Spark-side plumbing a 100 TB
multimodal training-data pipeline needs — schema, partitioning, UDF
signatures, batch shapes — with the codec step STUBBED: the container has no
image/audio libraries, so `decode_media` raises NotImplementedError unless
`deterministic_fake=True`, which substitutes a seeded, content-derived fake
(stable md5-based pixels/samples) so every downstream operator is real and
testable.

Scale notes: media payloads are large → keep them out of shuffles. Feature
extraction is a narrow mapInPandas directly over the scan; only the small
feature vectors (array<float>) ever shuffle. maxRecordsPerBatch should be
lowered for big payloads (Arrow batch sizing is the memory knob).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "mime string, width int, height int, duration_ms int"
)

FEATURES_SCHEMA = (
    "media_id string, kind string, n_bytes bigint, sha1 string, "
    "feature array<float>, frames int"
)


def decode_media(payload: bytes, kind: str, deterministic_fake: bool = False) -> np.ndarray:
    """Decode a media payload into a sample array.

    Real decoding requires PIL/ffmpeg/soundfile — not present in this
    container. The fake is a pure function of the payload bytes, so the
    whole downstream pipeline (feature extraction, batching, similarity)
    is exercised with stable values.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "pass deterministic_fake=True or install PIL/soundfile"
        )
    digest = hashlib.md5(payload).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    if kind == "image":
        return rng.random((16, 16, 3), dtype=np.float32)
    if kind == "audio":
        return rng.random(1024, dtype=np.float32)
    if kind == "video":
        return rng.random((4, 16, 16, 3), dtype=np.float32)  # 4 sampled frames
    raise ValueError(f"unknown media kind: {kind}")


def extract_media_features(
    media: DataFrame, feature_dim: int = 8, deterministic_fake: bool = True
) -> DataFrame:
    """media → per-item feature rows. Narrow (no shuffle); payload bytes
    never leave the scan task."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                data = bytes(payload)
                arr = decode_media(data, kind, deterministic_fake=deterministic_fake)
                flat = arr.reshape(-1)
                # mean-pooled banded feature: deterministic, shape-stable
                bands = np.array_split(flat, feature_dim)
                feature = [float(np.float32(b.mean())) for b in bands]
                frames = int(arr.shape[0]) if kind == "video" else 1
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "n_bytes": len(data),
                        "sha1": hashlib.sha1(data).hexdigest(),
                        "feature": feature,
                        "frames": frames,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "n_bytes", "sha1", "feature", "frames"],
            )

    return media.mapInPandas(_extract, schema=FEATURES_SCHEMA)


def assets_to_media(parts: DataFrame) -> DataFrame:
    """Bridge the document parser's asset part rows (operators/parsing.
    parse_pages, kind='asset': embedded data-URI images etc.) into the media
    table shape — the reference uploads these same assets to object storage
    (aperag/index/document_parser.py:95-126); here they flow into the media
    pipeline. Narrow projection, payload bytes stay in place."""
    import pyspark.sql.functions as F

    return (
        parts.where(F.col("kind") == "asset")
        .select(
            F.col("asset_id").alias("media_id"),
            F.when(F.col("mime_type").startswith("image"), "image")
            .when(F.col("mime_type").startswith("audio"), "audio")
            .when(F.col("mime_type").startswith("video"), "video")
            .otherwise("image")
            .alias("kind"),
            F.col("data").alias("payload"),
            F.col("mime_type").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        )
        .dropDuplicates(["media_id"])  # same asset embedded in many docs
    )


def _nn_resize(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) array — real math; only the
    decode that produces `img` is environment-stubbed."""
    h, w = img.shape[0], img.shape[1]
    yi = np.clip(np.round(np.linspace(0, h - 1, height)).astype(int), 0, h - 1)
    xi = np.clip(np.round(np.linspace(0, w - 1, width)).astype(int), 0, w - 1)
    return img[yi][:, xi]


RESIZED_SCHEMA = (
    "media_id string, width int, height int, pixels array<float>"
)


def resize_images(
    media: DataFrame, width: int = 8, height: int = 8,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Image rows → nearest-neighbor-resized pixel rows (flattened float
    array). Narrow mapInPandas; only the small resized arrays leave the
    scan task."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "image":
                    continue
                arr = decode_media(bytes(payload), "image", deterministic_fake=deterministic_fake)
                out = _nn_resize(arr, width, height)
                rows.append(
                    {
                        "media_id": media_id,
                        "width": width,
                        "height": height,
                        "pixels": [float(x) for x in out.reshape(-1)],
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "pixels"])

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def frame_sample_indices(total: int, n_frames: int) -> list[int]:
    """Uniform temporal sampling: n_frames indices evenly spaced over
    [0, total-1] (first and last frames always included when n_frames≥2)."""
    if total <= 0 or n_frames <= 0:
        return []
    if n_frames >= total:
        return list(range(total))
    return sorted({int(round(x)) for x in np.linspace(0, total - 1, n_frames)})


FRAMES_SCHEMA = (
    "media_id string, frame_idx int, n_frames_total int, feature array<float>"
)


def sample_video_frames(
    media: DataFrame, n_frames: int = 2, feature_dim: int = 8,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Video rows → one row per sampled frame with its pooled feature.
    The temporal sampling and pooling are real; only the codec is stubbed."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video":
                    continue
                arr = decode_media(bytes(payload), "video", deterministic_fake=deterministic_fake)
                total = int(arr.shape[0])
                for idx in frame_sample_indices(total, n_frames):
                    flat = arr[idx].reshape(-1)
                    bands = np.array_split(flat, feature_dim)
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": idx,
                            "n_frames_total": total,
                            "feature": [float(np.float32(b.mean())) for b in bands],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "n_frames_total", "feature"]
            )

    return media.mapInPandas(_sample, schema=FRAMES_SCHEMA)


def gen_media_df(spark, n: int = 64, seed: int = 42, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table (binary payloads) for tests."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = hashlib.md5(f"media:{seed}:{i}".encode()).digest() * (8 + i % 5)
                rows.append(
                    {
                        "media_id": f"m{i}",
                        "kind": kind,
                        "payload": payload,
                        "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                        "width": 16 if kind != "audio" else None,
                        "height": 16 if kind != "audio" else None,
                        "duration_ms": 1000 if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(_gen, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Header probing — REAL metadata without codecs: container magic + header
# fields are plain byte parsing (PNG IHDR, JPEG SOFn, GIF logical screen,
# WAV/RIFF fmt chunk), so mime/dimensions/duration are extracted exactly
# even though pixel/sample DECODE stays env-gated behind decode_media.
# A dimension/duration filter is a first-class training-data operator
# (drop icons, drop >10min audio) and needs only these fields.
# ---------------------------------------------------------------------------


def probe_media(payload: bytes) -> dict:
    """→ {mime, width, height, duration_s} (None where not applicable /
    not parseable). Pure stdlib byte parsing; unknown containers yield
    mime=None rather than raising — probing is a filter, not a gate."""
    import struct

    out = {"mime": None, "width": None, "height": None, "duration_s": None}
    if payload.startswith(b"\x89PNG\r\n\x1a\n") and len(payload) >= 24:
        out["mime"] = "image/png"
        w, h = struct.unpack(">II", payload[16:24])
        out["width"], out["height"] = int(w), int(h)
    elif payload.startswith(b"\xff\xd8"):
        out["mime"] = "image/jpeg"
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            # SOF0-SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                out["width"], out["height"] = int(w), int(h)
                break
            i += 2 + seglen
    elif payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        out["mime"] = "image/gif"
        w, h = struct.unpack("<HH", payload[6:10])
        out["width"], out["height"] = int(w), int(h)
    elif payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        out["mime"] = "audio/wav"
        i = 12
        byte_rate = None
        data_size = None
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
            if cid == b"fmt " and i + 16 + 8 <= len(payload):
                byte_rate = struct.unpack("<I", payload[i + 16 : i + 20])[0]
            elif cid == b"data":
                data_size = size
            i += 8 + size + (size % 2)
        if byte_rate and data_size is not None:
            out["duration_s"] = round(data_size / byte_rate, 3)
    return out


def probe_media_df(media: DataFrame, data_col: str = "data") -> DataFrame:
    """Distributed probe: media rows → + (mime, width, height, duration_s).
    Payload bytes never shuffle — the probe runs where the row lives and
    only the (tiny) typed metadata columns move downstream."""

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probed = [probe_media(bytes(b) if b is not None else b"") for b in pdf[data_col]]
            res = pdf.drop(columns=[data_col]).reset_index(drop=True)
            res["mime"] = [p["mime"] for p in probed]
            res["width"] = pd.array([p["width"] for p in probed], dtype="Int32")
            res["height"] = pd.array([p["height"] for p in probed], dtype="Int32")
            res["duration_s"] = [p["duration_s"] for p in probed]
            yield res

    keep = [f"{c} {t}" for c, t in media.drop(data_col).dtypes]
    schema = ", ".join(
        keep + ["mime string", "width int", "height int", "duration_s double"]
    )
    return media.mapInPandas(_probe, schema)
