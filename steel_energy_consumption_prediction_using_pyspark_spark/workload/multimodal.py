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
    extract_features,
    pack_blob,
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
    """payload → Arrow-batched feature extraction (byte-histogram fake
    embedding) → per-source aggregate. Rows-only: the kernel's numpy
    float32 arithmetic has no faithful SQL twin; shape/determinism
    pinned in tests/test_multimodal.py."""
    d = T(spark, sf_dir, "documents")
    blobs = pack_blob(d, "text", "doc_id")
    feats = extract_features(blobs)
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


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_features": q_multimodal_features,
    "session_window": q_session_window,
}

ORACLES = {
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
