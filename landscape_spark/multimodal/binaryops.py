"""Multimodal columns: opaque binary payloads + typed metadata, processed in
Arrow batches.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct (mime, width/height or sample rate, frame count). The Spark
plumbing — schema, partition-preserving mapInPandas, batch shapes, metadata
propagation — is real and tested, and so are the codecs for the UNCOMPRESSED
formats, implemented from the public file-format specs in pure numpy:

* ``encode_bmp`` / ``decode_bmp``: 24-bit uncompressed BITMAPINFOHEADER BMP
  (4-byte-aligned bottom-up rows), grayscale carried as B=G=R.
* ``encode_wav`` / ``decode_wav``: RIFF/WAVE PCM 16-bit mono (proper chunk
  walk, not fixed offsets).

Compressed codecs (PNG/JPEG/MP4) need external libraries that are not in
this container; ``decode_image`` dispatches on the payload magic and raises
NotImplementedError for those — an honestly-marked gate, with the fake
checkerboard decoder kept for tests that need a decode for any mime.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from landscape_spark.hashing import splitmix64

MEDIA_SCHEMA = (
    "media_id long, mime string, width int, height int, n_frames int,"
    " sample_rate int, payload binary"
)

WAV_RATE = 8000


# ---------------------------------------------------------------------------
# Real pure-numpy codecs (uncompressed formats, public specs)
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (H, W) grayscale -> 24-bit uncompressed BMP bytes."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_bmp expects a (H, W) uint8 array")
    h, w = img.shape
    row_size = (w * 3 + 3) // 4 * 4  # rows padded to 4 bytes
    data_size = row_size * h
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = np.repeat(img[::-1, :, None], 3, axis=2)  # bottom-up row order
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return file_hdr + info_hdr + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> uint8 (H, W) grayscale (B channel;
    encoder writes B=G=R)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit uncompressed BMP (got bpp={bpp})")
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    arr = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=data_off
    ).reshape(h, row_size)
    img = arr[:, : w * 3].reshape(h, w, 3)[:, :, 0]
    return img[::-1].copy() if flip else img.copy()


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """int16 (N,) mono samples -> RIFF/WAVE PCM bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + 16 + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM 16-bit mono bytes -> (sample_rate, int16 samples).
    Walks chunks properly (fmt/data may not sit at fixed offsets)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError("only PCM 16-bit mono WAV")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + sz + (sz & 1)  # chunks are 2-byte aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


# ---------------------------------------------------------------------------
# Synthetic media table (real payload bytes; no external data)
# ---------------------------------------------------------------------------

def synthesize_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payloads: BMP bytes for images,
    WAV bytes for audio, seeded opaque bytes for video (MP4 needs a codec
    that is honestly gated). Dimensions kept small so payloads stay a few KB."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                h = int(splitmix64(np.uint64(mid) ^ np.uint64(seed)))
                kind = h % 3
                width = 16 + (h >> 2) % 48
                height = 16 + (h >> 8) % 48
                n_frames = 1 + (h >> 18) % 120
                if kind == 0:
                    idx = np.arange(width * height, dtype=np.uint64)
                    img = (
                        (splitmix64(idx ^ np.uint64(h)) & np.uint64(0xFF))
                        .astype(np.uint8)
                        .reshape(height, width)
                    )
                    rows.append(
                        (mid, "image/bmp", width, height, 1, 0, encode_bmp(img))
                    )
                elif kind == 1:
                    t = np.arange(WAV_RATE // 4, dtype=np.float64)  # 0.25s
                    freq = 100 + (h % 900)
                    wave = (
                        np.sin(2 * np.pi * freq * t / WAV_RATE) * 12000
                    ).astype(np.int16)
                    rows.append(
                        (mid, "audio/wav", 0, 0, 1, WAV_RATE, encode_wav(wave))
                    )
                else:
                    idx = np.arange(256, dtype=np.uint64)
                    blob = (splitmix64(idx ^ np.uint64(h)) & np.uint64(0xFF)).astype(
                        np.uint8
                    )
                    rows.append(
                        (mid, "video/mp4", width, height, n_frames, 0, blob.tobytes())
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "mime",
                    "width",
                    "height",
                    "n_frames",
                    "sample_rate",
                    "payload",
                ],
            )

    return spark.range(n).repartition(8).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decoder (seeded grid from the payload hash) for
    mimes whose real codec is gated."""
    seed = (
        np.frombuffer(payload[:8], dtype=np.uint64)[0]
        if len(payload) >= 8
        else np.uint64(0)
    )
    idx = np.arange(width * height, dtype=np.uint64)
    return (
        (splitmix64(idx ^ seed) & np.uint64(0xFF)).astype(np.uint8).reshape(height, width)
    )


def decode_image(
    payload: bytes, width: int = 0, height: int = 0, fake: bool = False
) -> np.ndarray:
    """Dispatch on payload magic: BMP decodes for real (pure numpy);
    compressed formats require codec libraries not present in this runtime
    and raise unless the deterministic fake decoder is requested."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if fake:
        return _fake_decode(payload, width, height)
    raise NotImplementedError(
        "compressed image codecs (png/jpeg) are not available in this runtime; "
        "BMP decodes natively — pass fake=True for the deterministic test decoder"
    )


# ---------------------------------------------------------------------------
# Feature extraction (Arrow-batched, real decode)
# ---------------------------------------------------------------------------

def image_features(media: DataFrame) -> DataFrame:
    """(media_id, mean_intensity, std_intensity, edge_energy): Arrow-batched
    feature extraction over REAL BMP decodes. Vectorized numpy inside."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, means, stds, energies = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                f = img.astype(np.float64)
                ids.append(int(mid))
                means.append(float(f.mean()))
                stds.append(float(f.std()))
                energies.append(float(np.abs(np.diff(f, axis=1)).mean()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "mean_intensity": means,
                    "std_intensity": stds,
                    "edge_energy": energies,
                }
            )

    return media.where(F.col("mime") == "image/bmp").select(
        "media_id", "payload"
    ).mapInPandas(
        feats,
        "media_id long, mean_intensity double, std_intensity double, edge_energy double",
    )


def audio_features(media: DataFrame) -> DataFrame:
    """(media_id, rms, zero_cross_rate, duration_sec) over REAL WAV decodes."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rms, zcr, dur = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, s = decode_wav(bytes(payload))
                x = s.astype(np.float64) / 32768.0
                ids.append(int(mid))
                rms.append(float(np.sqrt(np.mean(x**2))) if len(x) else 0.0)
                zcr.append(
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if len(x) > 1
                    else 0.0
                )
                dur.append(len(x) / rate if rate else 0.0)
            yield pd.DataFrame(
                {"media_id": ids, "rms": rms, "zero_cross_rate": zcr, "duration_sec": dur}
            )

    return media.where(F.col("mime") == "audio/wav").select(
        "media_id", "payload"
    ).mapInPandas(
        feats, "media_id long, rms double, zero_cross_rate double, duration_sec double"
    )


def resize_image(media: DataFrame, target: int = 224) -> DataFrame:
    """REAL resize over BMP payloads: nearest-neighbor to aspect-preserving
    target dims, re-encoded as BMP. (Nearest-neighbor is deliberate: exact,
    dependency-free, and deterministic across executors.)"""

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, payloads = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_bmp(bytes(payload))
                h, w = img.shape
                scale = min(target / w, target / h)
                # HALF_UP (floor(x+0.5)) to match resize_plan's Spark
                # F.round — Python round() is banker's rounding and would
                # disagree on exact-.5 products (e.g. 52.5 -> 52 vs 53)
                ow = max(int(np.floor(w * scale + 0.5)), 1)
                oh = max(int(np.floor(h * scale + 0.5)), 1)
                yi = (np.arange(oh) * (h / oh)).astype(np.int64).clip(0, h - 1)
                xi = (np.arange(ow) * (w / ow)).astype(np.int64).clip(0, w - 1)
                out = img[yi][:, xi]
                ids.append(int(mid))
                ws.append(ow)
                hs.append(oh)
                payloads.append(encode_bmp(out))
            yield pd.DataFrame(
                {"media_id": ids, "out_w": ws, "out_h": hs, "payload": payloads}
            )

    return media.where(F.col("mime") == "image/bmp").select(
        "media_id", "payload"
    ).mapInPandas(rz, "media_id long, out_w int, out_h int, payload binary")


def resize_plan(media: DataFrame, target: int = 224) -> DataFrame:
    """Resize as metadata transform: computes target dims preserving aspect
    ratio — pure column math, demonstrating metadata propagation."""
    scale = F.least(F.lit(target) / F.col("width"), F.lit(target) / F.col("height"))
    return media.where(F.col("width") > 0).select(
        "media_id",
        "mime",
        F.greatest(F.round(F.col("width") * scale).cast("int"), F.lit(1)).alias("out_w"),
        F.greatest(F.round(F.col("height") * scale).cast("int"), F.lit(1)).alias("out_h"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """(media_id, frame_idx) sampling plan for video rows: one row per kept
    frame — the explode pattern a real frame extractor would feed."""
    return media.where(F.col("mime") == "video/mp4").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
