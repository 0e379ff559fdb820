"""Multimodal + streaming-semantics workload entries.

The multimodal decode uses mapInPandas (Arrow batches) with a
deterministic fake decoder — a pure function of the payload bytes —
so even the Python-kernel path gets a full SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.operators.multimodal import (
    decode_image_meta,
    decode_image_pixels,
    decode_video_frames,
    decode_wave_features,
    extract_features,
    pack_blob,
    resize_image_meta,
    sample_frames,
    synthesize_images,
    synthesize_video,
    synthesize_wave,
)
from steel_energy_consumption_prediction_using_pyspark_spark.streaming.windows import (
    session_window_agg,
)
from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → opaque binary payload → Arrow-batched (fake) decode
    → typed metadata. Exercises the full multimodal plumbing: binary
    packing, struct metadata, mapInPandas with an explicit schema."""
    d = T(spark, sf_dir, "documents")
    blobs = pack_blob(d, "text", "doc_id")
    return decode_image_meta(blobs, "payload", "doc_id")


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window on batch events — identical code path to
    the streaming version (streaming/windows.py)."""
    e = T(spark, sf_dir, "events")
    return session_window_agg(e, gap="30 minutes")


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized PPM/BMP containers → REAL pixel decode (pure-numpy
    format parse, operators/multimodal.py::decode_image_pixels) →
    Arrow-batched feature extraction over the DECODED raster →
    per-source aggregate. FULL oracle since round 4: the byte
    histogram is order-insensitive, so the raster's byte multiset
    (text + pad spaces) fully determines the features regardless of
    codec row order, and CAST(c/n AS FLOAT) reproduces the numpy
    float32 narrowing (see ORACLES["multimodal_features"]); the
    decode bytes stay pinned by `image_decode`."""
    d = T(spark, sf_dir, "documents")
    px = decode_image_pixels(synthesize_images(d))
    feats = extract_features(px, payload_col="pixels")
    joined = feats.join(d.select("doc_id", "source"), "doc_id")
    v = F.col("feature").cast("array<double>")
    return (
        joined.select(
            "source",
            F.round(v[0], 4).alias("f0"),
            F.round(
                F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)), 4
            ).alias("nrm"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("f0"), 4).alias("avg_f0"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
        )
        .orderBy("source")
    )


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over fake 'videos' (operators/multimodal.py::
    sample_frames): every 2nd 256-byte segment, max 4 per document —
    a 1→N mapInPandas explosion whose sampling arithmetic (frame
    count, indices, offsets, clipped lengths) the oracle re-derives in
    SQL; the md5 of the emitted frame BYTES is cross-checked too, so
    the kernel's payload slicing (the ffmpeg hook) is verified, not
    just its bookkeeping. Reduced per frame_idx to stay compact."""
    d = T(spark, sf_dir, "documents")
    frames = sample_frames(pack_blob(d, "text", "doc_id"))
    return (
        frames.groupBy("frame_idx")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum("frame_len").alias("total_bytes"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.count_distinct(F.md5("frame_payload")).alias("n_uniq_frames"),
        )
        .orderBy("frame_idx")
    )


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-to-fit planning (operators/multimodal.py::
    resize_image_meta) over the fake-decoded image dims: integer
    aspect-preserving box math, bit-identical in SQL. Reduced to a
    per-bucket histogram of output areas."""
    d = T(spark, sf_dir, "documents")
    dims = decode_image_meta(pack_blob(d, "text", "doc_id"))
    rs = resize_image_meta(dims, max_side=256)
    area_bucket = ((F.col("new_width") * F.col("new_height")) / 8192).cast("int")
    return (
        rs.select(
            area_bucket.alias("area_bucket"),
            (F.col("new_width") <= 256).alias("w_ok"),
            (F.col("new_height") <= 256).alias("h_ok"),
        )
        .groupBy("area_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.bool_and("w_ok").alias("all_w_fit"),
            F.bool_and("h_ok").alias("all_h_fit"),
        )
        .orderBy("area_bucket")
    )


def q_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL image decode: each document's text becomes the
    raster of a 16-px-wide image (space-padded), encoded into an
    actual container — PPM P6 for even doc_ids, 24-bit BMP for odd —
    then parsed back by the pure-numpy decoder. The per-source digest
    hashes the DECODED raster bytes, so the oracle (which recomputes
    md5(text || padding) straight from the text) verifies the whole
    encode→decode path byte-exactly through both container formats —
    the multimodal tier's answer to 'is the decode real?'."""
    d = T(spark, sf_dir, "documents")
    px = decode_image_pixels(synthesize_images(d))
    joined = px.join(d.select("doc_id", "source"), "doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("height").alias("sum_h"),
            F.sum(F.octet_length("pixels")).alias("raster_bytes"),
            F.count_distinct(F.md5("pixels")).alias("n_uniq_rasters"),
        )
        .orderBy("source")
    )


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio tier, end-to-end real: documents synthesized into
    little-endian PCM16 payloads (odd samples' high byte XOR 0x80 so
    ASCII text yields mixed-sign waveforms), then genuinely decoded
    and featurized — sample count, RMS, absolute peak, zero-crossing
    count — in the Arrow-batched kernel. Every feature is exact
    integer/double arithmetic on the decoded samples, so the DuckDB
    oracle re-derives the samples from character codes and reproduces
    the numbers — the audio analogue of image_decode's raster-md5
    proof."""
    d = T(spark, sf_dir, "documents")
    waves = decode_wave_features(synthesize_wave(d))
    return (
        waves.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_samples").cast("bigint").alias("total_samples"),
            F.round(F.avg("rms"), 4).alias("avg_rms"),
            F.max("peak").alias("max_peak"),
            F.sum("zero_crossings").cast("bigint").alias("total_crossings"),
        )
        .orderBy("source")
    )


def q_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video tier, end-to-end real: documents cut into 96-byte
    chunks, each chunk a PPM frame, frames concatenated into one
    payload — then the whole container genuinely re-parsed frame by
    frame (operators/multimodal.py::decode_video_frames, the 1→N
    decode explosion with an actual format parse). The digest hashes
    every DECODED frame raster; the oracle re-derives each frame's
    bytes as text-slice‖padding and reproduces the md5s — proving
    frame boundaries, ordering, and pixel content byte-exactly."""
    d = T(spark, sf_dir, "documents")
    frames = decode_video_frames(synthesize_video(d))
    joined = frames.join(d.select("doc_id", "source"), "doc_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.count_distinct("doc_id").alias("n_videos"),
            F.max("frame_idx").alias("max_frame_idx"),
            F.count_distinct(F.md5("pixels")).alias("n_uniq_frames"),
            F.sum(F.octet_length("pixels")).cast("bigint").alias("raster_bytes"),
        )
        .orderBy("source")
    )


QUERIES = {
    "video_decode": q_video_decode,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_features": q_multimodal_features,
    "image_decode": q_image_decode,
    "audio_features": q_audio_features,
    "frame_sample": q_frame_sample,
    "image_resize": q_image_resize,
    "session_window": q_session_window,
}

ORACLES = {
    # multimodal_features (round 4): the byte-histogram "embedding"
    # kernel is fully SQL-derivable because the histogram is ORDER-
    # INSENSITIVE — whatever the PPM/BMP codec does to row order, the
    # decoded raster's byte multiset is text || pad-spaces (48-byte
    # rows, h=ceil(nb/48) min 1). Bin = byte // 32 (FEATURE_DIM=8;
    # ASCII fixture occupies bins 1-3, the rest are exactly 0.0 and
    # drop out of the norm). float32 semantics mirrored: numpy's
    # float64 divide narrowed to float32 == CAST(c/n AS FLOAT); the
    # norm then squares/sums in double in bin order, exactly
    # F.aggregate's left fold.
    "multimodal_features": """
        WITH d AS (
            SELECT doc_id, source, text,
                   CAST(octet_length(encode(text)) AS BIGINT) AS nb,
                   48 * greatest(1,
                       (CAST(octet_length(encode(text)) AS BIGINT) + 47)
                       // 48) AS n
            FROM documents
        ),
        chars AS (
            SELECT doc_id,
                   ascii(substring(text, CAST(i AS INT), 1)) // 32 AS bin
            FROM d, UNNEST(range(1, nb + 1)) AS r(i)
            WHERE nb > 0
        ),
        cnt AS (
            SELECT d.doc_id, d.source, d.n,
                   coalesce(sum(CASE WHEN bin = 0 THEN 1 END), 0) AS c0,
                   coalesce(sum(CASE WHEN bin = 1 THEN 1 END), 0)
                       + (d.n - d.nb) AS c1,
                   coalesce(sum(CASE WHEN bin = 2 THEN 1 END), 0) AS c2,
                   coalesce(sum(CASE WHEN bin = 3 THEN 1 END), 0) AS c3
            FROM d LEFT JOIN chars USING (doc_id)
            GROUP BY d.doc_id, d.source, d.n, d.nb
        ),
        f AS (
            SELECT doc_id, source,
                   CAST(CAST(CAST(c0 AS DOUBLE) / n AS FLOAT) AS DOUBLE) AS f0,
                   CAST(CAST(CAST(c1 AS DOUBLE) / n AS FLOAT) AS DOUBLE) AS f1,
                   CAST(CAST(CAST(c2 AS DOUBLE) / n AS FLOAT) AS DOUBLE) AS f2,
                   CAST(CAST(CAST(c3 AS DOUBLE) / n AS FLOAT) AS DOUBLE) AS f3
            FROM cnt
        ),
        rowed AS (
            SELECT source, round(f0, 4) AS f0r,
                   round(sqrt((((0e0 + f0*f0) + f1*f1) + f2*f2) + f3*f3),
                         4) AS nrm
            FROM f
        )
        SELECT source, CAST(count(*) AS BIGINT) AS n,
               round(avg(f0r), 4) AS avg_f0,
               round(avg(nrm), 4) AS avg_norm
        FROM rowed GROUP BY source ORDER BY source
    """,

    # each frame's raster = 96-byte text slice ‖ space padding (the
    # last frame pads; frame count = ceil(nb/96), min 1) — md5 over
    # the VARCHAR slice reproduces the engine's md5 over the decoded
    # frame bytes (pure-ASCII fixture, as image_decode/frame_sample)
    "video_decode": """
        WITH d AS (
            SELECT doc_id, source, text,
                   CAST(octet_length(encode(text)) AS BIGINT) AS nb
            FROM documents
        ),
        fr AS (
            SELECT doc_id, source, nb, CAST(i AS INTEGER) AS frame_idx,
                   substring(text, CAST(i * 96 + 1 AS INT), 96)
                   || repeat(' ', CAST(least(96,
                          greatest(0, (i + 1) * 96 - nb)) AS INT)) AS raster
            FROM d,
                 UNNEST(range(0, greatest(1, (nb + 95) // 96))) AS r(i)
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_frames,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_videos,
               CAST(max(frame_idx) AS INTEGER) AS max_frame_idx,
               CAST(count(DISTINCT md5(raster)) AS BIGINT) AS n_uniq_frames,
               CAST(count(*) * 96 AS BIGINT) AS raster_bytes
        FROM fr GROUP BY source ORDER BY source
    """,
    # PCM16 samples re-derived from character codes: sample i (1-based)
    # = ascii(char 2i−1) + 256·hi, hi = ascii(char 2i) (0 past the end
    # — the zero pad), XOR 128 on even-numbered samples (byte offsets
    # 3, 7, … — 0-based odd samples); signed wrap at 32768. Features
    # are exact integer/double arithmetic — RMS sums of squared int16
    # stay < 2^53, so even the float mean is EXACT in both engines.
    "audio_features": """
        WITH d AS (
            SELECT doc_id, source, text,
                   octet_length(encode(text)) AS nb
            FROM documents
        ),
        samples AS (
            SELECT doc_id, source, i,
                   ascii(substring(text, CAST(2*i - 1 AS INT), 1)) AS lo,
                   CASE WHEN nb >= 2*i
                        THEN ascii(substring(text, CAST(2*i AS INT), 1))
                        ELSE 0 END AS hi
            FROM d, UNNEST(range(1, CAST((nb + 1) // 2 AS BIGINT) + 1)) AS r(i)
            WHERE nb > 0
        ),
        vals AS (
            SELECT doc_id, source, i,
                   lo + 256 * (CASE WHEN i % 2 = 0 THEN xor(hi, 128)
                                    ELSE hi END) AS v
            FROM samples
        ),
        signed_s AS (
            SELECT doc_id, source, i,
                   CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
            FROM vals
        ),
        marked AS (
            SELECT doc_id, source, s,
                   CASE WHEN s >= 0 THEN 1 ELSE -1 END AS sgn,
                   lag(CASE WHEN s >= 0 THEN 1 ELSE -1 END)
                       OVER (PARTITION BY doc_id ORDER BY i) AS prev_sgn
            FROM signed_s
        ),
        per_doc0 AS (
            SELECT doc_id, source,
                   count(*) AS n_samples,
                   sqrt(avg(CAST(s * s AS DOUBLE))) AS rms,
                   max(abs(s)) AS peak,
                   sum(CASE WHEN prev_sgn IS NOT NULL AND sgn <> prev_sgn
                            THEN 1 ELSE 0 END) AS zc
            FROM marked GROUP BY doc_id, source
        ),
        per_doc AS (
            -- empty docs decode to zero samples (rms 0, peak 0, zc 0)
            SELECT d.doc_id, d.source,
                   coalesce(p.n_samples, 0) AS n_samples,
                   coalesce(p.rms, 0e0) AS rms,
                   coalesce(p.peak, 0) AS peak,
                   coalesce(p.zc, 0) AS zc
            FROM d LEFT JOIN per_doc0 p USING (doc_id, source)
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_samples) AS BIGINT) AS total_samples,
               round(avg(rms), 4) AS avg_rms,
               CAST(max(peak) AS INTEGER) AS max_peak,
               CAST(sum(zc) AS BIGINT) AS total_crossings
        FROM per_doc GROUP BY source ORDER BY source
    """,
    # raster = text || ' '×pad by construction (synthesize_images), so
    # md5 over the VARCHAR recomputes the engine's md5 over the decoded
    # binary raster — pure-ASCII fixture assumption as frame_sample.
    "image_decode": """
        WITH d AS (
            SELECT doc_id, source, text,
                   CAST(octet_length(encode(text)) AS BIGINT) AS nb
            FROM documents
        ),
        dims AS (
            SELECT *, greatest(1, (nb + 47) // 48) AS h FROM d
        ),
        ras AS (
            SELECT source, h,
                   text || repeat(' ', CAST(h * 48 - nb AS INTEGER))
                       AS raster
            FROM dims
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_images,
               CAST(sum(h) AS BIGINT) AS sum_h,
               CAST(sum(h) * 48 AS BIGINT) AS raster_bytes,
               CAST(count(DISTINCT md5(raster)) AS BIGINT) AS n_uniq_rasters
        FROM ras GROUP BY source ORDER BY source
    """,
    # Both frame oracles slice the document text with VARCHAR substring
    # (character offsets). The engine slices the utf-8 BYTES. These
    # agree because the documents fixture is pure ASCII — asserted by
    # tests/test_multimodal.py::test_documents_fixture_is_ascii, which
    # names this assumption if a future fixture breaks it.
    "frame_sample": """
        WITH d AS (
            SELECT doc_id, text,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n
            FROM documents
        ),
        fr AS (
            SELECT doc_id, text, n, CAST(fi AS INTEGER) AS frame_idx
            FROM d, unnest(list_slice(
                     range(0, greatest(1, (n + 255) // 256), 2), 1, 4)) AS t(fi)
        ),
        f2 AS (
            SELECT doc_id, frame_idx,
                   least(256, n - frame_idx * 256) AS frame_len,
                   md5(substring(text, frame_idx * 256 + 1, 256)) AS fhash
            FROM fr
        )
        SELECT frame_idx,
               CAST(count(*) AS BIGINT) AS n_frames,
               CAST(sum(frame_len) AS BIGINT) AS total_bytes,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT fhash) AS BIGINT) AS n_uniq_frames
        FROM f2 GROUP BY frame_idx ORDER BY frame_idx
    """,
    "image_resize": """
        WITH dims AS (
            SELECT doc_id,
                   CAST((octet_length(encode(text)) * 7919) % 1024 + 16 AS BIGINT) AS w,
                   CAST((octet_length(encode(text)) * 104729) % 1024 + 16 AS BIGINT) AS h
            FROM documents
        ),
        rs AS (
            SELECT doc_id, w, h, greatest(w, h) AS mx,
                   CASE WHEN greatest(w, h) <= 256 THEN w
                        ELSE greatest(1, (w * 256) // greatest(w, h)) END AS nw,
                   CASE WHEN greatest(w, h) <= 256 THEN h
                        ELSE greatest(1, (h * 256) // greatest(w, h)) END AS nh
            FROM dims
        )
        SELECT CAST((nw * nh) // 8192 AS INTEGER) AS area_bucket,
               CAST(count(*) AS BIGINT) AS n,
               bool_and(nw <= 256) AS all_w_fit,
               bool_and(nh <= 256) AS all_h_fit
        FROM rs GROUP BY area_bucket ORDER BY area_bucket
    """,
    "multimodal_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST((octet_length(encode(text)) * 7919) % 1024 + 16 AS INTEGER) AS width,
               CAST((octet_length(encode(text)) * 104729) % 1024 + 16 AS INTEGER) AS height,
               CAST(3 AS INTEGER) AS channels
        FROM documents
    """,
    "session_window": """
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts,
                   sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM flagged
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
               count(*) AS n_events
        FROM sess GROUP BY user_id, sid
    """,
}
