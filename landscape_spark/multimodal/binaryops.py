"""Multimodal columns: opaque binary payloads + typed metadata, processed in
Arrow batches.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct (mime, width/height or sample rate, frame count). The Spark
plumbing — schema, partition-preserving mapInPandas, batch shapes, metadata
propagation — is real and tested; the actual codec step is STUBBED because
decode libraries (PIL/ffmpeg/etc.) are not in this container:

* ``decode_image`` raises NotImplementedError behind a clearly-marked gate
  unless a deterministic fake decoder is requested (the fake "decodes" a
  seeded checkerboard from the payload hash — stable across executors, so
  downstream feature tests are meaningful).
* ``extract_features`` / ``resize_stub`` / ``frame_sample_stub`` operate on
  the fake-decoded arrays with real vectorized numpy, preserving the exact
  UDF signatures a real decoder would use.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from landscape_spark.hashing import splitmix64

MEDIA_SCHEMA = (
    "media_id long, mime string, width int, height int, n_frames int, payload binary"
)


def synthesize_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes, metadata typed."""
    h = F.xxhash64(F.col("id"), F.lit(seed))
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.pmod(h, F.lit(3)) == 0, "image/png")
        .when(F.pmod(h, F.lit(3)) == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        (F.pmod(h, F.lit(512)) + 16).cast("int").alias("width"),
        (F.pmod(F.shiftright(h, 9), F.lit(512)) + 16).cast("int").alias("height"),
        (F.pmod(F.shiftright(h, 18), F.lit(120)) + 1).cast("int").alias("n_frames"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a real image decode: seeded uint8 grid of
    the declared dimensions. STUB — replace with a real codec when the
    decode libraries exist in the runtime."""
    seed = np.frombuffer(payload[:8], dtype=np.uint64)[0] if len(payload) >= 8 else np.uint64(0)
    idx = np.arange(width * height, dtype=np.uint64)
    return (splitmix64(idx ^ seed) & np.uint64(0xFF)).astype(np.uint8).reshape(height, width)


def decode_image(payload: bytes, width: int, height: int, fake: bool = False) -> np.ndarray:
    if not fake:
        # STUB: no image codec in this container (no PIL/opencv). The Spark
        # plumbing around this call is real; swap in a decoder here.
        raise NotImplementedError(
            "real image decoding requires a codec library not present in this "
            "runtime; pass fake=True for the deterministic test decoder"
        )
    return _fake_decode(payload, width, height)


def image_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """(media_id, mean_intensity, std_intensity, edge_energy): Arrow-batched
    feature extraction over decoded frames. Vectorized numpy inside; the
    decode step is the stub above."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, means, stds, energies = [], [], [], []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                img = decode_image(payload, int(w), int(h), fake=fake_decode)
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

    return media.where(F.col("mime") == "image/png").select(
        "media_id", "payload", "width", "height"
    ).mapInPandas(
        feats,
        "media_id long, mean_intensity double, std_intensity double, edge_energy double",
    )


def resize_plan(media: DataFrame, target: int = 224) -> DataFrame:
    """Resize as metadata transform (the real pixel work would live in the
    decode stub): computes target dims preserving aspect ratio — pure column
    math, demonstrating metadata propagation through the pipeline."""
    scale = F.least(F.lit(target) / F.col("width"), F.lit(target) / F.col("height"))
    return media.select(
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
