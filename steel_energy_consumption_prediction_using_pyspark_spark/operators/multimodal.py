"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or a reference into object storage), decode/feature
steps are Arrow-batched Python over ``mapInPandas``, and everything
relational (routing, filtering, joins, stats) happens on the typed
metadata columns so Catalyst can prune/push down without touching
bytes.

Decode tiers: PPM (P6) and 24-bit BMP decode for REAL in pure numpy
(encode_ppm/encode_bmp/decode_pixels/decode_image_pixels below) —
true pixel values flow through the Arrow-batched kernels end to end.
Formats needing external codecs (JPEG/PNG via PIL, video via ffmpeg —
not in this container) are covered by the same plumbing with
deterministic fakes (`_fake_decode_image`, `sample_frames`' byte
slices); swapping a fake for a codec call changes nothing Spark-side.
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
    DoubleType,
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


def extract_features_arrow(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """The mapInArrow tier of :func:`extract_features`: identical
    byte-histogram features computed straight on pyarrow RecordBatches
    — no pandas materialization between Arrow and numpy, the
    lowest-overhead Python kernel path Spark offers (pandas adds a
    per-batch Series construction + copy on both sides; for kernels
    that are pure numpy over binary payloads that copy is the whole
    Python-side cost). Output ≡ extract_features row-for-row (pinned
    in tests/test_multimodal.py); use whichever the surrounding code
    prefers — the plumbing contract (batching, schema, partitioning)
    is the same."""
    import numpy as np
    import pyarrow as pa

    def kernel(batches):
        for batch in batches:
            ids = batch.column(id_col)
            feats = []
            for payload in batch.column(payload_col):
                buf = payload.as_py()
                arr = np.frombuffer(buf, dtype=np.uint8) if buf else np.array([], np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                hist = np.bincount(
                    arr // (256 // FEATURE_DIM), minlength=FEATURE_DIM
                )
                feats.append((hist / arr.size).astype("float32").tolist())
            yield pa.RecordBatch.from_arrays(
                [ids.cast(pa.int64()), pa.array(feats, pa.list_(pa.float32()))],
                ["doc_id", "feature"],
            )

    return df.mapInArrow(kernel, FEATURE_SCHEMA)


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


# --- real pixel codecs (pure numpy — no PIL/ffmpeg needed) ------------------
#
# Two genuinely-decodable container formats make the multimodal tier
# end-to-end real instead of metadata-only (round-3 mandate):
#   PPM P6  — "P6\n<w> <h>\n255\n" header + raw RGB raster
#   BMP     — BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit BI_RGB,
#             bottom-up rows, BGR, each row padded to 4 bytes
# Both encode/decode in pure numpy; decode_pixels dispatches on magic.
# JPEG/PNG would slot into the same kernels when a codec lib exists.


def encode_ppm(pixels) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6)."""
    import numpy as np

    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("PPM P6 requires 3 channels")
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_bmp(pixels) -> bytes:
    """(h, w, 3) uint8 RGB array → 24-bit uncompressed BMP (BI_RGB,
    bottom-up, BGR, 4-byte-padded rows)."""
    import struct

    import numpy as np

    a = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = a.shape
    if c != 3:
        raise ValueError("24-bit BMP requires 3 channels")
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # RGB → BGR, top-down → bottom-up, pad rows
    bgr = a[::-1, :, ::-1]
    rows = bytearray()
    zeros = b"\x00" * pad
    for r in range(h):
        rows += bgr[r].tobytes() + zeros
    img_size = len(rows)
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + info + bytes(rows)


def decode_pixels(payload: bytes):
    """Decode PPM-P6 or 24-bit-BMP bytes → (h, w, 3) uint8 RGB array.
    Dispatches on the container magic; raises ValueError on anything
    else (the place a PIL/libjpeg call would slot in)."""
    import numpy as np

    if payload[:2] == b"P6":
        # header: magic, whitespace-separated width/height/maxval
        # (comments '#…' allowed per spec), single whitespace, raster
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # exactly one whitespace before the raster
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError("only 8-bit PPM supported")
        raster = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=pos)
        return raster.reshape(h, w, 3).copy()
    if payload[:2] == b"BM":
        import struct

        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
        planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
        if bpp != 24 or compression != 0:
            raise ValueError("only 24-bit uncompressed BMP supported")
        flip = h > 0
        h = abs(h)
        row_bytes = w * 3
        stride = row_bytes + ((-row_bytes) % 4)
        rows = np.frombuffer(
            payload, np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, :row_bytes]
        bgr = rows.reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
        return (rgb[::-1] if flip else rgb).copy()
    raise ValueError("unsupported image container (expected PPM P6 or BMP)")


PIXEL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def decode_image_pixels(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL pixel decode over mapInPandas: container bytes (PPM/BMP) →
    raw row-major RGB raster + dims. Replaces the former
    NotImplementedError stub — the decode is an actual format parse,
    so downstream kernels (feature extraction, resize, stats) consume
    true pixel values, and md5(pixels) is oracle-checkable whenever
    the raster's construction is known (workload `image_decode`)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cs, rasters = [], [], [], [], []
            for doc, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = decode_pixels(bytes(payload))
                h, w, c = arr.shape
                ids.append(int(doc))
                ws.append(w)
                hs.append(h)
                cs.append(c)
                rasters.append(arr.tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "channels": pd.Series(cs, dtype="int32"),
                    "pixels": rasters,
                }
            )

    return df.mapInPandas(kernel, PIXEL_SCHEMA)


SYNTH_WIDTH = 16  # synthetic raster width: 16 px × 3 ch = 48 bytes/row

VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)

FRAME_ROWS = 2  # synthetic video frame: 16 px × 2 rows × 3 ch = 96 bytes


def synthesize_video(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = SYNTH_WIDTH,
    rows: int = FRAME_ROWS,
) -> DataFrame:
    """Deterministic 'video' synthesis: the document's bytes cut into
    fixed-size chunks (width×rows×3 = 96 bytes), each chunk
    space-padded and encoded as ONE PPM frame, frames concatenated
    into a single payload — a decodable multi-frame container built
    the same engine-independent way as synthesize_images."""
    import numpy as np

    df = df.select(id_col, text_col)  # pruning barrier projection
    chunk = width * rows * 3

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, nframes = [], [], []
            for doc, text in zip(pdf[id_col], pdf[text_col]):
                raw = str(text).encode("utf-8")
                n = max(1, -(-len(raw) // chunk))
                raw = raw + b" " * (n * chunk - len(raw))
                frames = []
                for i in range(n):
                    px = np.frombuffer(
                        raw[i * chunk : (i + 1) * chunk], np.uint8
                    ).reshape(rows, width, 3)
                    frames.append(encode_ppm(px))
                ids.append(int(doc))
                payloads.append(b"".join(frames))
                nframes.append(n)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                    "n_frames": pd.Series(nframes, dtype="int32"),
                }
            )

    return df.mapInPandas(
        kernel,
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
                StructField("n_frames", IntegerType()),
            ]
        ),
    )


def decode_video_frames(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL multi-frame decode: scan the payload for consecutive PPM
    containers, decode each with the same pure-numpy parser as the
    image tier, emit one row per frame with its raster — the 1→N
    batch-shape change of true video decoding (mapInPandas, output
    rows not aligned with input rows), with an actual format parse
    where ffmpeg would sit."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, rasters = [], [], [], [], []
            for doc, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(payload)
                pos, fidx = 0, 0
                while pos < len(buf):
                    if buf[pos : pos + 2] != b"P6":
                        raise ValueError(
                            f"expected PPM frame at offset {pos}"
                        )
                    arr = decode_pixels(buf[pos:])
                    h, w, _ = arr.shape
                    header_len = len(b"P6\n%d %d\n255\n" % (w, h))
                    pos += header_len + w * h * 3
                    ids.append(int(doc))
                    idxs.append(fidx)
                    ws.append(w)
                    hs.append(h)
                    rasters.append(arr.tobytes())
                    fidx += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "pixels": rasters,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, VIDEO_FRAME_SCHEMA)


WAVE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
        StructField("zero_crossings", LongType()),
    ]
)


def synthesize_wave(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic 'audio' synthesis: each document's utf-8 bytes
    become a little-endian PCM16 payload (consecutive byte pairs →
    one signed 16-bit sample; odd tails zero-padded) with every ODD
    sample's high byte XOR'd with 0x80 — pure-ASCII text alone never
    sets the sign bit, so the flip guarantees mixed-sign waveforms
    and real zero-crossing behavior downstream. The audio counterpart
    of synthesize_images: engine-independent construction upstream, a
    genuine sample-format decode downstream."""
    df = df.select(id_col, text_col)  # pruning barrier projection

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc, text in zip(pdf[id_col], pdf[text_col]):
                raw = bytearray(str(text).encode("utf-8"))
                if len(raw) % 2:
                    raw += b"\x00"
                for off in range(3, len(raw), 4):  # odd samples' high byte
                    raw[off] ^= 0x80
                ids.append(int(doc))
                payloads.append(bytes(raw))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "payload": payloads}
            )

    return df.mapInPandas(
        kernel,
        StructType(
            [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
        ),
    )


def decode_wave_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL PCM16 decode + the classic waveform features: sample
    count, RMS, absolute peak, and zero-crossing count (sign changes
    between consecutive samples with sign(x≥0)=+1 — the simple
    convention, identical in SQL). numpy int16 little-endian parse
    per payload, Arrow-batched; every feature is integer/double
    arithmetic on the decoded samples, so the whole decode path is
    SQL-oracle-checkable (workload `audio_features`)."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rmss, peaks, zcs = [], [], [], [], []
            for doc, payload in zip(pdf[id_col], pdf[payload_col]):
                s = np.frombuffer(bytes(payload), dtype="<i2").astype("int64")
                ids.append(int(doc))
                ns.append(int(s.size))
                if s.size == 0:
                    rmss.append(0.0)
                    peaks.append(0)
                    zcs.append(0)
                    continue
                rmss.append(float(np.sqrt(np.mean((s * s).astype("float64")))))
                peaks.append(int(np.abs(s).max()))
                signs = np.where(s >= 0, 1, -1)
                zcs.append(int((signs[1:] != signs[:-1]).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "peak": pd.Series(peaks, dtype="int32"),
                    "zero_crossings": pd.Series(zcs, dtype="int64"),
                }
            )

    return df.mapInPandas(kernel, WAVE_SCHEMA)


def synthesize_images(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = SYNTH_WIDTH,
) -> DataFrame:
    """Deterministic image synthesis for codec-path testing: each
    document's utf-8 bytes become the RGB raster of a width×h image
    (h = ⌈n/3w⌉, space-padded to fill the last row), encoded PPM for
    even doc_ids and BMP for odd — both containers then take the REAL
    decode path. The raster is `text || ' '×pad` by construction, so
    an engine-independent oracle can recompute md5(raster) from the
    text alone (fixture is pure ASCII; see test_documents_fixture_is_
    ascii)."""
    import numpy as np

    # mapInPandas is a pruning barrier — Catalyst cannot push column
    # pruning through the Python kernel, so an unprojected input would
    # drag the full table width into Arrow. Project here.
    df = df.select(id_col, text_col)

    row = width * 3

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, fmts = [], [], []
            for doc, text in zip(pdf[id_col], pdf[text_col]):
                raw = str(text).encode("utf-8")
                h = max(1, -(-len(raw) // row))
                raw = raw + b" " * (h * row - len(raw))
                px = np.frombuffer(raw, np.uint8).reshape(h, width, 3)
                if int(doc) % 2 == 0:
                    payloads.append(encode_ppm(px))
                    fmts.append("ppm")
                else:
                    payloads.append(encode_bmp(px))
                    fmts.append("bmp")
                ids.append(int(doc))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                    "fmt": fmts,
                }
            )

    return df.mapInPandas(
        kernel,
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
                StructField("fmt", StringType()),
            ]
        ),
    )
