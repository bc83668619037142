"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB treats media as `binary` columns moved by
reference (path) or value (bytes), with decode / feature-extraction /
resize / frame-sampling as Arrow-batched pandas stages over mapInPandas —
batch-parallel, no per-row Python dispatch, no driver involvement.

The image/audio codec libraries are not available in this container, so the
actual DECODE step is stubbed: `decode_image_stub` produces deterministic
fake features (documented NotImplementedError escape hatch for real codecs).
Everything Spark-side — schemas, partitioning, UDF signatures, Arrow batch
shapes — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Typed metadata schema carried alongside every media column.
MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, n_channels int, "
    "duration_ms long, codec string"
)

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, sha string, mean_byte double, "
    "fake_width int, fake_height int"
)


def attach_binary(df: DataFrame, text_col: str, out_col: str = "media") -> DataFrame:
    """Stand-in media payload: utf-8 bytes of a text column as `binary`
    (the driver tables carry no real media; the column type and downstream
    plumbing are what matter)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake 'decode'. A real deployment plugs Pillow/ffmpeg here:

        raise NotImplementedError("install pillow and replace this stub")

    The fake derives stable pseudo-dimensions from the byte length so tests
    and oracles can verify the full pipeline shape.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "mean_byte": (sum(payload) / n) if n else 0.0,
        "fake_width": (n % 64) + 1,
        "fake_height": (n % 48) + 1,
    }


def extract_image_features(df: DataFrame, id_col: str = "doc_id",
                           media_col: str = "media") -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.

    The per-batch loop is pandas-vectorizable where the real codec allows;
    the stub shows the shape (iterate rows inside a batch, never per-row UDF
    dispatch)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_image_stub(bytes(b)) for b in pdf[media_col]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "sha": [hashlib.md5(bytes(b)).hexdigest() for b in pdf[media_col]],
                    "mean_byte": [round(f["mean_byte"], 6) for f in feats],
                    "fake_width": [f["fake_width"] for f in feats],
                    "fake_height": [f["fake_height"] for f in feats],
                }
            )
            yield out

    return df.select(id_col, media_col).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, "
    "orig_width int, orig_height int, resized binary"
)


def resize_images(df: DataFrame, width: int, height: int,
                  id_col: str = "doc_id",
                  media_col: str = "media") -> DataFrame:
    """Resize plumbing over mapInPandas: one Arrow batch in, one out, with
    typed (width, height, n_channels) metadata and the resized payload.

    The pixel work is the documented codec stub — a real deployment decodes
    with Pillow and emits the actual width*height*3 buffer:

        raise NotImplementedError("install pillow and replace this stub")

    The fake emits a DETERMINISTIC 64-byte digest of (payload, dims) as the
    'resized' bytes, so the schema/partitioning/batch shape — the parts
    Spark owns — are fully exercised and byte-stable for tests. Output rows
    ride the input's partitioning (no shuffle: resize is a map stage)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, b in zip(pdf[id_col], pdf[media_col]):
                b = bytes(b)
                meta = decode_image_stub(b)
                digest = hashlib.blake2b(
                    b + f":{width}x{height}".encode(), digest_size=64
                ).digest()
                rows.append((int(did), width, height, 3,
                             meta["fake_width"], meta["fake_height"], digest))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "n_channels",
                "orig_width", "orig_height", "resized"])

    return df.select(id_col, media_col).mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, id_col: str, media_col: str,
                  every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: explode a media payload into frame rows with
    (frame_idx, offset_ms). Decode is the same stub; partitioning carries
    (id, frame_idx) so downstream per-frame work distributes."""
    n_frames = (F.octet_length(media_col) % 10 + 1).cast("int")  # fake duration
    return (
        df.select(id_col, media_col, F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"))
        .withColumn("offset_ms", F.col("frame_idx") * every_ms)
        .withColumn("frame_bytes", F.expr(f"substring({media_col}, frame_idx * 16 + 1, 16)"))
    )


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, fake_duration_ms long, fake_sample_rate int, "
    "n_windows int, rms double"
)


def decode_audio_stub(payload: bytes) -> dict:
    """Deterministic fake audio 'decode'. A real deployment plugs soundfile/
    ffmpeg here:

        raise NotImplementedError("install soundfile and replace this stub")

    The fake derives a stable pseudo-duration and sample rate from the byte
    length and treats the raw bytes as the waveform for the RMS, so the full
    Spark-side shape (schema, Arrow batches, windowing math) is exercised
    byte-stably."""
    n = len(payload)
    sr = 8000 + (n % 3) * 4000  # 8/12/16 kHz
    return {
        "n_bytes": n,
        "fake_duration_ms": n * 1000 // sr if sr else 0,
        "fake_sample_rate": sr,
        "rms": (sum(b * b for b in payload) / n) ** 0.5 if n else 0.0,
    }


def extract_audio_features(df: DataFrame, id_col: str = "doc_id",
                           media_col: str = "media",
                           window_ms: int = 25) -> DataFrame:
    """Audio feature plumbing over mapInPandas (Arrow-batched, map-only):
    per payload the stubbed decode yields (duration, sample rate, RMS) and
    the number of ``window_ms`` analysis windows — the frame count a real
    MFCC/fbank extractor would produce. Mirrors extract_image_features; the
    codec stays a documented stub (see decode_audio_stub)."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, b in zip(pdf[id_col], pdf[media_col]):
                m = decode_audio_stub(bytes(b))
                n_windows = math.ceil(m["fake_duration_ms"] / window_ms) if window_ms else 0
                rows.append((int(did), m["n_bytes"], m["fake_duration_ms"],
                             m["fake_sample_rate"], n_windows, m["rms"]))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_bytes", "fake_duration_ms", "fake_sample_rate",
                "n_windows", "rms"])

    return df.select(id_col, media_col).mapInPandas(batches, AUDIO_FEATURES_SCHEMA)
