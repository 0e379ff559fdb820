"""Structured Streaming surface (SURVEY.md §2.10 extension).

The reference is batch-only; the engine adds the streaming upgrade
path with IDENTICAL transformation code for batch and stream — the
aggregations below accept either a batch DataFrame or a streaming one
(spark.readStream), because F.window / session_window / watermarks are
the same logical operators in both modes. Tests drive them with the
parquet fixtures through a memory sink using availableNow, which is
exactly how a backfill replays history before switching to a live
source (kafka/kinesis) — same code, different reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Schema of events.parquet as Spark reads it. The ts physical encoding
# has two observed variants across fixture generations: TIMESTAMP(NANOS)
# (arrives as int64 under nanosAsLong) and TIMESTAMP(MICROS,
# isAdjustedToUTC=false) (arrives as TIMESTAMP_NTZ). The stream source
# needs a static schema, so we build it per-variant and normalize ts to
# TIMESTAMP right after load, exactly like the batch path in
# workload/util.py::T.
def _events_raw_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


EVENTS_RAW_SCHEMA = _events_raw_schema(LongType())


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based streaming source over the events fixture. On a real
    deployment this is a kafka reader; the transformation code below
    does not change."""
    # Probe the footer with a cheap batch schema read to pick the ts
    # variant (metadata-only — no data scan).
    import os as _os

    probed = spark.read.parquet(_os.path.join(sf_dir, "events.parquet")).schema
    ts_type = probed["ts"].dataType
    # The file stream source requires a DIRECTORY; select the single
    # fixture file with a glob filter.
    reader = (
        spark.readStream.schema(_events_raw_schema(ts_type))
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(sf_dir)
    if isinstance(ts_type, LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_window_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows + watermark. On a stream the
    watermark bounds state: windows older than (max event time -
    watermark) finalize and evict; late rows beyond it drop. On batch
    the watermark is a no-op and semantics match workload/core.py's
    q_tumbling_window oracle exactly."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "event_type",
            "cnt",
        )
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (dynamic-length, gap-based). Batch-mode
    result agrees with the window-lag sessionization in
    workload/core.py::q_sessionize on session counts."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def run_to_memory_sink(
    agg: DataFrame, name: str, output_mode: str = "complete"
) -> None:
    """Drive a streaming aggregation to completion with availableNow
    (bounded backfill), leaving results queryable as table `name`."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: dropDuplicates on the key within the
    watermark horizon. On a stream, state holds one entry per key seen
    within the watermark and evicts beyond it — bounded memory, the
    ingest-dedup primitive a training-data firehose needs (re-delivered
    events, at-least-once sources). On batch, semantics are plain
    dropDuplicates and match a groupBy-key count of 1 row per key.

    On streams the EVENT-TIME column is appended to the dedup keys:
    Spark only evicts dropDuplicates state when the watermark column
    is part of the key subset — without it, state grows one entry per
    key FOREVER (caught live by tests/test_streaming_soak.py in round
    7: a 50-batch rate-source soak showed a linear state curve, ~45k
    rows and climbing, where the fixed operator plateaus at the
    watermark horizon). Semantics are unchanged for the operator's
    contract — at-least-once REDELIVERY carries the original event
    time, so (key, ts) collapses exactly the redelivered copies.
    Duplicates whose retry rewrites the timestamp are
    :func:`stream_dedup_within_watermark`'s job (last-sighting
    eviction, key-only state).
    """
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    if ts_col not in keys:
        keys = [*keys, ts_col]
    return events.withWatermark(ts_col, watermark).dropDuplicates(keys)


def stream_dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming dedup for redeliveries whose EVENT TIME differs
    between attempts (retry with a fresh timestamp — the case plain
    dropDuplicates misses, since its state key would admit the second
    copy after the first evicts). dropDuplicatesWithinWatermark
    (Spark 3.5+) keeps a key's state for the watermark delay measured
    from the LAST sighting, deduping any copy arriving within it.
    Batch mode falls back to plain dropDuplicates (watermarks don't
    exist in batch; semantics coincide when duplicate copies carry
    identical keys)."""
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
