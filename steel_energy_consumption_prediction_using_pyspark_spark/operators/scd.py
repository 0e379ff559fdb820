"""Slowly-changing-dimension (SCD type-2) compression.

Turns an append-only change/event stream into versioned dimension
history: one row per (key, state) *run*, with ``valid_from`` /
``valid_to`` interval bounds and a current-row flag. This is the
standard CDC → warehouse-dimension materialization step (the reference
notebook has no CDC surface — SURVEY.md §2.10 — but any 100 TB
deployment ingesting change streams needs it).

Scale shape: ONE shuffle on the key. Both window passes (the
change-detection lag and the interval-closing lead) use the same
(key, ts) partitioning, so Catalyst plans a single Exchange followed
by one sort; the run-compression filter happens before the second
window, shrinking the data between passes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_compress(
    df: DataFrame,
    key: str,
    state: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Compress consecutive equal-``state`` rows per ``key`` into SCD2
    validity intervals.

    Returns columns: ``key``, ``state``, ``valid_from`` (run start),
    ``valid_to`` (next run's start, null while current), ``is_current``
    (1 for the open interval). Rows whose state equals the immediately
    preceding state (by ``ts``, ties broken by ``tiebreak``) are
    absorbed into the preceding run — the classic "only persist
    changes" compression.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    prev_state: Column = F.lag(state).over(w)
    runs = df.withColumn(
        "_changed", prev_state.isNull() | (prev_state != F.col(state))
    ).filter(F.col("_changed"))
    w2 = Window.partitionBy(key).orderBy(ts, tiebreak)
    valid_to = F.lead(ts).over(w2)
    return runs.select(
        F.col(key),
        F.col(state).alias("state"),
        F.col(ts).alias("valid_from"),
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )
