"""Mergeable partial aggregates — incremental rollup maintenance.

At 100 TB you never recompute a rollup from scratch when a late batch
lands: you keep *partial* aggregate state (count/sum/min/max per key —
every algebraic aggregate), aggregate only the new slice, and MERGE.
The merge is itself a groupBy (sum of sums, sum of counts, min of
mins, max of maxes), so partials compose associatively across any
number of batches, days, or partitions — the same property the
DataSketches tier (operators/sketches.py) provides for the
*non*-algebraic aggregates (distinct counts, quantiles).

Derived aggregates (avg = sum/count) are computed only at finalize
time — storing avg in the partial would make it non-mergeable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARTIAL_COLS = ("_n", "_sum", "_min", "_max")


def partial_rollup(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """One batch's partial aggregate state for ``value_col`` per key."""
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("_n"),
        F.sum(value_col).alias("_sum"),
        F.min(value_col).alias("_min"),
        F.max(value_col).alias("_max"),
    )


def merge_partials(parts: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge any number of partial states into one. Associative and
    commutative — merge order never changes the result (pinned in
    tests/test_maintenance.py)."""
    u = reduce(lambda a, b: a.unionByName(b), parts)
    return u.groupBy(*keys).agg(
        F.sum("_n").alias("_n"),
        F.sum("_sum").alias("_sum"),
        F.min("_min").alias("_min"),
        F.max("_max").alias("_max"),
    )


def finalize_rollup(partial: DataFrame) -> DataFrame:
    """Resolve derived aggregates from the mergeable state."""
    return partial.select(
        *[c for c in partial.columns if c not in PARTIAL_COLS],
        F.col("_n").alias("n"),
        F.col("_sum").alias("total"),
        (F.col("_sum") / F.col("_n")).alias("mean"),
        F.col("_min").alias("vmin"),
        F.col("_max").alias("vmax"),
    )
