"""Range (interval-tolerance) self-join: pairs of rows within a time
tolerance — the other time-series join Spark lacks as a built-in.

The naive theta-join (`a.by = b.by AND abs(a.ts - b.ts) <= τ`) is a
per-key cross product that Spark can only plan as a nested-loop
filter. The scalable formulation BUCKETS time into τ-wide cells: any
pair within τ lands in the same or adjacent cells, so joining one
side exploded to its 3 neighboring cells against the other side's
home cell reduces the range predicate to an EQUI-join on
(key, bucket) — hash-partitionable, AQE-skew-splittable, and each
qualifying pair is produced exactly once (for |b_a - b_b| <= 1
exactly one of a's three probe cells equals b's home cell; the
residual |Δt| <= τ filter runs on the tiny candidate set).
Cost: 3× row replication of ONE side, vs |key-group|² pairs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def within_tolerance_pairs(
    df: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    id_col: str = "event_id",
    tolerance_s: float = 300.0,
    carry: Sequence[str] = (),
) -> DataFrame:
    """All unordered pairs (id_a < id_b) sharing the `by` key with
    |a.on - b.on| <= tolerance_s. Returns id_a, id_b, the carried
    columns suffixed _a/_b, and gap_s (absolute, seconds)."""
    by = list(by)
    carry = list(carry)
    tol_us = int(tolerance_s * 1_000_000)

    base = df.select(
        F.col(id_col).alias("_id"),
        *by,
        F.unix_micros(F.col(on)).alias("_us"),
        *[F.col(c) for c in carry],
    ).withColumn("_bkt", F.expr(f"_us div {tol_us}"))

    probe = base.withColumn(
        "_bkt", F.explode(F.array(F.col("_bkt") - 1, F.col("_bkt"), F.col("_bkt") + 1))
    )

    a, b = probe.alias("a"), base.alias("b")
    cond = (F.col("a._id") < F.col("b._id")) & (
        F.abs(F.col("a._us") - F.col("b._us")) <= F.lit(tol_us)
    )
    return (
        a.join(b, [*by, "_bkt"])
        .filter(cond)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            *by,
            (F.abs(F.col("a._us") - F.col("b._us")) / F.lit(1e6)).alias("gap_s"),
            *[F.col(f"a.{c}").alias(f"{c}_a") for c in carry],
            *[F.col(f"b.{c}").alias(f"{c}_b") for c in carry],
        )
    )
