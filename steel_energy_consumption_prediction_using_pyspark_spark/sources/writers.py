"""Batch sinks (SURVEY.md §2.1 S7-S8 + the 100 TB-required parquet
sink the reference lacks).

Scale rules encoded here:
- parquet, snappy, target file sizes via per-partition row control —
  thousands of tiny files kill listing + scan planning at 100 TB;
- partitionBy for coarse pruning keys (dates, sources), never
  high-cardinality keys;
- bucketing (saveAsTable) for co-located joins on a stable key: two
  tables bucketed by the same key join WITHOUT a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    coalesce_to: int | None = None,
) -> None:
    out = df.coalesce(coalesce_to) if coalesce_to else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on `bucket_col`
    between tables bucketed the same way skip the exchange entirely."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Reference-parity CSV sink (header on, like the input the
    reference reads at SteelPred.py:27)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line; Spark's json writer is
    line-delimited by default) — the interchange format for corpus
    hand-offs to non-Spark tooling."""
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
