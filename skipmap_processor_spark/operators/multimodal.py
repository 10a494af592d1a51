"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; all
decode/feature work runs in Arrow-batched ``mapInPandas`` so bytes never
round-trip through Python row objects.

Real decode kernels (pure numpy, no external libs) cover the uncompressed
formats: **PPM (P6)** images and **RIFF/WAV PCM16** audio — encode and
decode are exact inverses, so the decode path is oracle-checkable end to
end (sha of decoded payload == sha of the source bytes). Compressed formats
(JPEG/PNG/MP3) raise ``NotImplementedError`` — their codecs (Pillow/ffmpeg)
are not in this container; at deploy time you drop them into ``decode_image``
/ ``decode_audio`` and the Spark-side plumbing (schema, Arrow batching,
partitioning) is unchanged.

Reference precedent for binary side-channel ingestion + pixel extraction:
HDF satellite tiles fetched and pixel-extracted out-of-band
(/root/reference/snow-cover/src/data_fetcher.py:115,164 and
/root/reference/snow-cover/src/pixel_extractor.py:43-84).
"""

from __future__ import annotations

import hashlib
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

DECODED_SCHEMA = (
    "media_id bigint, kind string, width int, height int, sample_rate int, "
    "n_units bigint, payload_sha string"
)


# --------------------------------------------------------------- PPM (P6)

def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary PPM (P6)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> HxWx3 uint8. Pure numpy, no libs."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace-separated tokens,
    # '#' comments allowed between tokens
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval={maxval})")
    n = w * h * 3
    pix = np.frombuffer(payload, dtype=np.uint8, count=n, offset=i)
    return pix.reshape(h, w, 3)


# --------------------------------------------------------- WAV (PCM16 RIFF)

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * 2
    hdr = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")            # PCM
        + (1).to_bytes(2, "little")            # mono
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (2).to_bytes(2, "little")            # block align
        + (16).to_bytes(2, "little")           # bits/sample
        + b"data" + len(data).to_bytes(4, "little")
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> (int16 samples, sample_rate). Walks chunks, so
    extra chunks (LIST/INFO) before `data` are handled."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, bits, channels = 12, None, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            if fmt != 1:
                raise NotImplementedError(f"non-PCM WAV (fmt={fmt})")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            if bits != 16 or channels != 1:
                raise NotImplementedError("only PCM16 mono supported")
            return np.frombuffer(body, dtype="<i2"), int(rate)
        i += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


# --------------------------------------------------------------- dispatch

def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8. PPM is decoded natively;
    compressed formats need Pillow (absent in this container)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:3] == b"\xff\xd8\xff" or payload[:8] == b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError(
            "JPEG/PNG decode requires Pillow/opencv (not in this container); "
            "PPM payloads decode natively"
        )
    raise ValueError("unrecognized image payload")


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError("only RIFF/WAV PCM16 decodes natively")


# ----------------------------------------------------------- feature UDFs

def extract_features(df: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Arrow-batched raw-byte features (histogram + mean) over payloads.

    Fully vectorized across the batch: payload bytes are concatenated into
    one uint8 buffer and reduced with ``np.add.reduceat`` / ``np.bincount``
    — no per-row Python beyond the buffer join. feat_dim must divide 256.
    """
    assert 256 % feat_dim == 0
    shift = (256 // feat_dim).bit_length() - 1

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [b if b is not None else b"" for b in pdf["payload"]]
            lens = np.fromiter((len(b) for b in payloads), dtype=np.int64,
                               count=len(payloads))
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            n = len(payloads)
            safe = np.maximum(lens, 1)
            if len(buf):
                sums = np.add.reduceat(buf.astype(np.int64), starts)
                sums[lens == 0] = 0  # reduceat repeats on empty slices
                row_idx = np.repeat(np.arange(n), lens)
                hist = np.bincount(
                    row_idx * feat_dim + (buf >> shift),
                    minlength=n * feat_dim,
                ).reshape(n, feat_dim)
            else:
                sums = np.zeros(n, dtype=np.int64)
                hist = np.zeros((n, feat_dim), dtype=np.int64)
            feats = (hist / safe[:, None]).astype(np.float32)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": lens,
                    "byte_mean": np.round(sums / safe, 6),
                    "feature": list(feats),
                }
            )

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


def decode_features(df: DataFrame) -> DataFrame:
    """Decode payloads (PPM/WAV) and emit verifiable decode features:
    dimensions plus sha256 of the decoded payload's hex string. The hash is
    over *decoded* bytes — a header mis-parse or byte slip changes it — and
    hex-string hashing keeps it DuckDB-twin-able (sha256(VARCHAR)).

    Decode is inherently per-item (variable-length payloads); each item is
    one C-level frombuffer + hashlib call, no per-byte Python.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            width, height, rate, n_units, shas = [], [], [], [], []
            for kind, b in zip(pdf["kind"], pdf["payload"]):
                if kind == "image":
                    arr = decode_image(bytes(b))
                    width.append(arr.shape[1]); height.append(arr.shape[0])
                    rate.append(None); n_units.append(arr.size)
                    raw = arr.tobytes()
                else:
                    samples, r = decode_audio(bytes(b))
                    width.append(None); height.append(None)
                    rate.append(r); n_units.append(len(samples))
                    raw = samples.tobytes()
                shas.append(hashlib.sha256(raw.hex().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": pd.array(width, dtype="Int32"),
                    "height": pd.array(height, dtype="Int32"),
                    "sample_rate": pd.array(rate, dtype="Int32"),
                    "n_units": pd.array(n_units, dtype="Int64"),
                    "payload_sha": shas,
                }
            )

    return df.mapInPandas(gen, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: explode n_frames into sampled frame idx rows
    (the real decoder would emit per-frame payloads)."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)),
                       F.lit(every_n))
        ).alias("frame_idx"),
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table with REAL payloads: 4x4 PPM images and
    12-sample WAV clips whose bytes derive from md5 chains (portable to a
    SQL oracle), plus raw 'video' blobs for the plumbing tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        seed = f"m{i}"
        hexes = "".join(
            hashlib.md5(f"{seed}:{j}".encode()).hexdigest() for j in range(3)
        )  # 48 bytes
        raw = bytes.fromhex(hexes)
        if kind == "image":
            payload = encode_ppm(
                np.frombuffer(raw, dtype=np.uint8).reshape(4, 4, 3))
            rows.append((i, kind, payload, 4, 4, None, None))
        elif kind == "audio":
            payload = encode_wav(
                np.frombuffer(raw[:24], dtype="<i2"), 16000)
            rows.append((i, kind, payload, None, None, 16000, None))
        else:
            rows.append((i, kind, raw, None, None, None, 30))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
