"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or a reference into object storage), decode/feature
steps are Arrow-batched Python over ``mapInPandas``, and everything
relational (routing, filtering, joins, stats) happens on the typed
metadata columns so Catalyst can prune/push down without touching
bytes.

The actual codecs (PIL/torchaudio/ffmpeg) are NOT in this container,
so the decode kernels are deterministic fakes / explicit
NotImplementedError stubs — but the Spark-side contract (schemas,
batch iteration, partitioning) is real and tested. Swap `_fake_*`
with real decoders when the libs exist; nothing else changes.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("crc32", LongType()),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def pack_blob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    media_type: str = "text/plain",
) -> DataFrame:
    """Wrap a column as an opaque binary payload + metadata — the
    ingest shape for any modality. (Fixtures have no real media, so the
    payload is the utf-8 text; for images this would be the encoded
    file bytes.)"""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.crc32(payload).alias("crc32"),
        ).alias("meta"),
    )


def _fake_decode_image(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: derives plausible
    dimensions from the payload length. Pure function of the bytes →
    reproducible across executors and expressible in the SQL oracle."""
    n = len(payload)
    width = (n * 7919) % 1024 + 16
    height = (n * 104729) % 1024 + 16
    return width, height, 3


def decode_image_meta(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode over mapInPandas: each task pulls columnar
    batches, runs the (fake) decoder per payload, emits typed metadata.
    This is the real 100 TB plumbing — batch-at-a-time, no row pickling,
    decode parallelism = partition count."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            dims = [_fake_decode_image(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.str.len().astype("int64"),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "channels": pd.Series([d[2] for d in dims], dtype="int32"),
                }
            )

    return df.mapInPandas(kernel, IMAGE_META_SCHEMA)


FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def extract_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Feature-extraction kernel over mapInPandas: payload bytes → a
    FEATURE_DIM float vector (here a deterministic byte-histogram
    projection standing in for a CNN/audio embedding — the output
    schema, Arrow batching, and downstream array<float> compatibility
    with the similarity operators are the real contract)."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                # bucket byte values into FEATURE_DIM histogram bins,
                # normalized — deterministic, codec-free
                hist = np.bincount(arr // (256 // FEATURE_DIM), minlength=FEATURE_DIM)
                feats.append((hist / arr.size).astype("float32").tolist())
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "feature": feats}
            )

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_off", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 256,
    stride: int = 2,
    max_frames: int = 4,
) -> DataFrame:
    """Video frame-sampling plumbing: one payload row explodes into up
    to ``max_frames`` frame rows (every ``stride``-th fixed-size
    segment) — the 1→N batch-shape change real frame sampling has,
    which is why it's mapInPandas (an output batch is NOT row-aligned
    with its input batch) rather than a scalar pandas_udf.

    The segmenting arithmetic (frame count ⌈n/frame_bytes⌉, sampled
    indices, offsets, lengths) is deterministic and SQL-expressible —
    the driver query oracle-checks it — while the per-frame payload
    slice marks where a real ffmpeg/pyav decode would run (the slice
    IS the fake decode; swapping it for codec output changes nothing
    Spark-side). Emitting the sliced bytes, not the whole payload,
    bounds the explosion's output size to max_frames·frame_bytes per
    document regardless of payload size."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens, segs = [], [], [], [], []
            for doc, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(payload)
                n_frames = max(1, -(-n // frame_bytes))
                for i in list(range(0, n_frames, stride))[:max_frames]:
                    off = i * frame_bytes
                    # real decoder hook: ffmpeg frame extract would
                    # replace this slice
                    seg = bytes(payload[off : off + frame_bytes])
                    ids.append(int(doc))
                    idxs.append(i)
                    offs.append(off)
                    lens.append(len(seg))
                    segs.append(seg)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_off": pd.Series(offs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "frame_payload": segs,
                }
            )

    return df.mapInPandas(kernel, FRAME_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("new_width", IntegerType()),
        StructField("new_height", IntegerType()),
    ]
)


def resize_image_meta(
    df: DataFrame,
    max_side: int = 256,
    id_col: str = "doc_id",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """Aspect-preserving resize-to-fit planning over decoded image
    dims: the target box computation every image pipeline runs before
    the pixel op. INTEGER arithmetic only (w·max_side div max(w,h)) so
    the plan is bit-identical in any engine — the pixel resample
    itself is the codec-gated step (decode_image_pixels). Runs as an
    Arrow-batched kernel to mirror the production shape (dims arrive
    WITH the decoded pixels in one batch; here metadata-only)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf[width_col].astype("int64")
            h = pdf[height_col].astype("int64")
            mx = w.where(w >= h, h)
            scale_needed = mx > max_side
            nw = w.where(~scale_needed, (w * max_side) // mx).clip(lower=1)
            nh = h.where(~scale_needed, (h * max_side) // mx).clip(lower=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "new_width": nw.astype("int32"),
                    "new_height": nh.astype("int32"),
                }
            )

    return df.mapInPandas(kernel, RESIZE_SCHEMA)


def decode_image_pixels(*_args, **_kwargs):
    """Real pixel decode requires an image codec (PIL/libjpeg), which is
    not available in this environment. The metadata path above defines
    the contract; this stub marks the unimplemented kernel explicitly."""
    raise NotImplementedError(
        "pixel decode needs an image codec (PIL); not available in this "
        "container — decode_image_meta covers the Spark-side contract"
    )


def frame_sample_stub(*_args, **_kwargs):
    """Codec-gated REAL frame decode — same story as
    decode_image_pixels. The Spark-side plumbing (segmenting, 1→N
    explosion, offsets/lengths, Arrow batching) is fully implemented
    and oracle-checked in :func:`sample_frames`; this stub marks only
    the ffmpeg/pyav call that would replace its byte-slice line."""
    raise NotImplementedError(
        "video frame decoding needs ffmpeg; not available in this "
        "container — sample_frames covers the Spark-side contract"
    )
