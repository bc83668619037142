"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB treats media as `binary` columns moved by
reference (path) or value (bytes), with decode / feature-extraction /
resize / frame-sampling as Arrow-batched pandas stages over mapInPandas —
batch-parallel, no per-row Python dispatch, no driver involvement.

The compressed-image/audio codec libraries are not available in this
container, so decode for THOSE formats is stubbed: `decode_image_stub`
produces deterministic fake features (documented NotImplementedError escape
hatch for real codecs). Uncompressed formats with public byte-layout specs
need no library, so `decode_image` REALLY decodes them — PPM (P6 binary /
P3 ASCII, the netpbm spec) and 24-bit uncompressed BI_RGB BMP — making one
pixel path exercisable end-to-end. Everything Spark-side — schemas,
partitioning, UDF signatures, Arrow batch shapes — is real and tested.
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


def _ppm_tokens(payload: bytes, need: int, start: int = 2):
    """Yield the first ``need`` whitespace-separated header tokens after the
    magic, honoring netpbm '#' comments; returns (tokens, index past the
    single whitespace char that terminates the last token)."""
    toks, i, n = [], start, len(payload)
    while len(toks) < need:
        while i < n and payload[i:i + 1].isspace():
            i += 1
        if i < n and payload[i:i + 1] == b"#":
            while i < n and payload[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not payload[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        toks.append(int(payload[i:j]))
        i = j
    return toks, i + 1  # exactly ONE whitespace after maxval (P6 spec)


def decode_image(payload: bytes) -> dict | None:
    """REAL pure-stdlib decode for uncompressed public formats:

    - PPM ``P6`` (binary) / ``P3`` (ASCII) per the netpbm spec: header
      tokens (width, height, maxval ≤ 255) with '#' comments, then
      RGB triplets row-major.
    - BMP ``BM`` with a BITMAPINFOHEADER, 24 bpp, BI_RGB (uncompressed):
      rows padded to 4 bytes, stored bottom-up (top-down when height < 0),
      BGR byte order — normalized here to row-major RGB.

    Returns {format, width, height, n_channels, pixels(bytes RGB)} or None
    when the payload is not one of these formats (caller falls back to
    `decode_image_stub` — the documented escape hatch for codec formats)."""
    import struct

    if payload[:2] in (b"P6", b"P3"):
        (w, h, maxval), i = _ppm_tokens(payload, 3)
        if maxval <= 0 or maxval > 255:
            raise ValueError(f"unsupported ppm maxval {maxval}")
        need = w * h * 3
        if payload[:2] == b"P6":
            px = payload[i:i + need]
        else:  # P3: ASCII sample values
            px = bytes(int(t) for t in payload[i - 1:].split()[:need])
        if len(px) < need:
            raise ValueError("truncated ppm pixel data")
        return {"format": "ppm", "width": w, "height": h,
                "n_channels": 3, "pixels": px[:need]}
    if payload[:2] == b"BM" and len(payload) >= 54:
        off = struct.unpack_from("<I", payload, 10)[0]
        dib = struct.unpack_from("<I", payload, 14)[0]
        if dib < 40:
            # BITMAPCOREHEADER (12-byte DIB): width/height/bpp live at
            # different offsets — reading 18/28/30 would decode garbage.
            # Fall back to the stub rather than misparse.
            return None
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or comp != 0:
            return None  # compressed / other depth -> stub path
        top_down, h = h < 0, abs(h)
        stride = (w * 3 + 3) & ~3
        rows = []
        for r in range(h):
            src = r if top_down else h - 1 - r
            row = payload[off + src * stride: off + src * stride + w * 3]
            if len(row) < w * 3:
                raise ValueError("truncated bmp pixel data")
            rows.append(bytes(b for px in
                              (row[c * 3: c * 3 + 3] for c in range(w))
                              for b in px[::-1]))  # BGR -> RGB
        return {"format": "bmp", "width": w, "height": h,
                "n_channels": 3, "pixels": b"".join(rows)}
    return None


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Emitter dual of the P6 arm of :func:`decode_image` (tests/round-trips)."""
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Emitter dual of the BMP arm: 24-bit BI_RGB, bottom-up, padded rows."""
    import struct

    stride = (width * 3 + 3) & ~3
    body = b"".join(
        b"".join(rgb[(r * width + c) * 3:(r * width + c) * 3 + 3][::-1]
                 for c in range(width)) + b"\0" * (stride - width * 3)
        for r in range(height - 1, -1, -1))
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return head + dib + body


DECODED_IMAGE_SCHEMA = (
    "doc_id long, format string, width int, height int, n_channels int, "
    "mean_r double, mean_g double, mean_b double"
)


def decode_images(df: DataFrame, id_col: str = "doc_id",
                  media_col: str = "media") -> DataFrame:
    """mapInPandas decode stage: recognized uncompressed formats (PPM/BMP)
    go through the REAL pixel path (per-channel means computed from the
    decoded buffer with numpy); anything else falls back to the stub's
    deterministic fake dims with NULL channel means. Map-only — rides the
    input partitioning, no shuffle."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, b in zip(pdf[id_col], pdf[media_col]):
                b = bytes(b)
                img = decode_image(b)
                if img is None:
                    meta = decode_image_stub(b)
                    rows.append((int(did), "unknown", meta["fake_width"],
                                 meta["fake_height"], 3, None, None, None))
                else:
                    px = np.frombuffer(img["pixels"], dtype=np.uint8)
                    means = px.reshape(-1, 3).mean(axis=0) if px.size else \
                        np.full(3, np.nan)
                    rows.append((int(did), img["format"], img["width"],
                                 img["height"], img["n_channels"],
                                 round(float(means[0]), 6),
                                 round(float(means[1]), 6),
                                 round(float(means[2]), 6)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "format", "width", "height", "n_channels",
                "mean_r", "mean_g", "mean_b"], dtype=object)

    return df.select(id_col, media_col).mapInPandas(
        batches, DECODED_IMAGE_SCHEMA)


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
