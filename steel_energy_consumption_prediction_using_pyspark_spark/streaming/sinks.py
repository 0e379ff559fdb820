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
