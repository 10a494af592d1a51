"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; all
decode/feature work runs in Arrow-batched ``mapInPandas`` so bytes never
round-trip through Python row objects. The decode kernels themselves are
STUBBED (no image/audio libs in this container): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic fake decoder so the Spark-side plumbing (schema, batching,
partitioning) is fully real and testable.

Reference precedent for binary side-channel ingestion: HDF satellite tiles
fetched and pixel-extracted out-of-band
(/root/reference/snow-cover/src/data_fetcher.py:115,164).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, byte_mean double, "
    "feature array<float>"
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8. STUB: real decode needs
    Pillow/libjpeg, absent here."""
    if not fake:
        raise NotImplementedError(
            "image decode requires Pillow/opencv (not in this container); "
            "pass fake=True for the deterministic test decoder"
        )
    # deterministic fake: bytes reshaped/tiled to 8x8x3
    arr = np.frombuffer(payload[:192].ljust(192, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8, 3)


def extract_features(df: DataFrame, fake_decode: bool = True,
                     feat_dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas keeps whole Arrow record batches in flight — payload bytes
    are numpy buffers, never Python row tuples. The "feature" is a byte
    histogram (stand-in for a real CNN/fbank embedding).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: 0 if b is None else len(b)).astype(
                "int64"
            )
            means, feats = [], []
            for b in payloads:
                if b is None or len(b) == 0:
                    means.append(0.0)
                    feats.append(np.zeros(feat_dim, dtype=np.float32))
                    continue
                a = np.frombuffer(b, dtype=np.uint8)
                means.append(float(a.mean()))
                hist, _ = np.histogram(a, bins=feat_dim, range=(0, 256))
                feats.append((hist / max(len(a), 1)).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "byte_mean": np.round(means, 6),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling stub: explode n_frames into sampled frame idx
    rows (the real decoder would emit per-frame payloads)."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)),
                       F.lit(every_n))
        ).alias("frame_idx"),
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes((i * 7 + j) % 256 for j in range(64 + (i % 5) * 32))
        rows.append(
            (i, kind, payload, 8 if kind == "image" else None,
             8 if kind == "image" else None,
             16000 if kind == "audio" else None,
             30 if kind == "video" else None)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
