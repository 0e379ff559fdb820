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


def decode_image_pixels(*_args, **_kwargs):
    """Real pixel decode requires an image codec (PIL/libjpeg), which is
    not available in this environment. The metadata path above defines
    the contract; this stub marks the unimplemented kernel explicitly."""
    raise NotImplementedError(
        "pixel decode needs an image codec (PIL); not available in this "
        "container — decode_image_meta covers the Spark-side contract"
    )


def frame_sample_stub(*_args, **_kwargs):
    """Video frame sampling stub — same story as decode_image_pixels."""
    raise NotImplementedError(
        "video frame sampling needs ffmpeg; not available in this container"
    )
