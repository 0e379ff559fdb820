"""Streaming sinks (SURVEY.md §2.10 extension).

Structured Streaming's file/kafka sources give at-least-once delivery
on failure/replay; end-to-end exactly-once needs the sink to be
idempotent per micro-batch. The standard recipe: key every write by
`batchId` and make re-writing the same batch replace, not append —
here via dynamic partition overwrite on a `_batch_id` partition
column. Replaying a batch after a crash overwrites its own partition
and nothing else; the checkpoint guarantees batch ids are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def idempotent_parquet_sink(
    stream_df: DataFrame, path: str, checkpoint: str
) -> StreamingQuery:
    """foreachBatch parquet sink with batch-keyed dynamic partition
    overwrite — exactly-once under replay. availableNow trigger:
    drains all pending input then stops (the backfill/cron shape);
    swap the trigger for a continuous deployment."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        (
            df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(path)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def cdc_merge_sink(
    stream_changes: DataFrame,
    base_dir: str,
    key: str,
    checkpoint: str,
) -> StreamingQuery:
    """Streaming CDC apply: each micro-batch of change rows (base
    schema + op in {'U','D'} + change_ts) is MERGEd into the current
    snapshot version with operators/cdc.py::merge_apply, producing the
    next version directory — the streaming half of the lakehouse
    MERGE INTO pattern on plain parquet.

    Versioned snapshots are what make replay exactly-once WITHOUT
    table-format transactions: batch k always reads `v{k}` (its
    pre-state) and rewrites `v{k+1}` deterministically, so a crashed
    and replayed batch regenerates the identical successor version
    instead of compounding its changes; reading the snapshot you are
    overwriting in the same job (the naive single-dir design) is both
    unsafe in Spark and non-idempotent. The caller seeds `v0`.
    availableNow trigger, same deployment notes as
    idempotent_parquet_sink."""
    import os

    from steel_energy_consumption_prediction_using_pyspark_spark.operators.cdc import (
        merge_apply,
    )

    def apply_batch(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        base = spark.read.parquet(os.path.join(base_dir, f"v{batch_id}"))
        merged = merge_apply(base, df, key)
        merged.write.mode("overwrite").parquet(
            os.path.join(base_dir, f"v{batch_id + 1}")
        )

    return (
        stream_changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
