"""CDC change application — MERGE INTO semantics on plain DataFrames.

Applies a change stream (upserts + deletes) to a base snapshot: the
batch half of a change-data-capture pipeline. The reference has no CDC
surface (SURVEY.md §2.10); lakehouse formats expose this as MERGE
INTO — here it is the join algebra those engines compile MERGE into,
so it runs on any DataFrame source:

    kept     = base ANTI JOIN touched-keys      (untouched rows pass)
    applied  = latest 'U' change per key        (last-writer-wins)
    deletes  drop out by never being unioned back

Scale shape: one shuffle of the base on the key for the anti join
(broadcast when the change batch is small — the common case: daily
changes ≪ snapshot), one window pass over the (small) change batch
for last-writer-wins. No full rewrite of untouched data happens here —
pair with sources/writers.py partitioned writes so only partitions
containing touched keys are rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_apply(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    ts_col: str = "change_ts",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply ``changes`` (rows = base schema + ``op_col`` in
    {'U','D'} + ``ts_col``) to ``base``; the latest change per key wins
    (ties broken by preferring 'D' — a delete-then-reinsert at the
    same timestamp must not resurrect stale data nondeterministically).
    """
    w = Window.partitionBy(key).orderBy(
        F.col(ts_col).desc(), F.when(F.col(op_col) == "D", 0).otherwise(1)
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    touched = latest.select(key)
    if broadcast_changes:
        touched = F.broadcast(touched)
    kept = base.join(touched, key, "left_anti")
    upserts = latest.filter(F.col(op_col) == "U").drop(op_col, ts_col)
    return kept.unionByName(upserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    row_hash,
) -> DataFrame:
    """Row-level diff between two snapshot versions: the drill-down
    that follows a table_fingerprint mismatch (operators/quality.py).
    One full outer join on the key, change classification by comparing
    a caller-supplied `row_hash` column expression (same portability
    contract as table_fingerprint's row_str):

        added     key only in new
        removed   key only in old
        changed   key in both, hash differs
        unchanged key in both, hash equal

    Returns per-class counts (1-4 rows). Scale shape: one shuffle of
    each side on the key (co-partitioned sort-merge); the hash is
    computed scan-side so the join carries (key, hash) pairs, never
    full rows.
    """
    o = old.select(F.col(key).alias("k"), row_hash.alias("h_old"))
    n = new.select(F.col(key).alias("k"), row_hash.alias("h_new"))
    return (
        o.join(n, "k", "full_outer")
        .select(
            F.when(F.col("h_old").isNull(), F.lit("added"))
            .when(F.col("h_new").isNull(), F.lit("removed"))
            .when(F.col("h_old") == F.col("h_new"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("change"),
        )
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("change")
    )
