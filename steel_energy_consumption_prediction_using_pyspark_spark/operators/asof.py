"""As-of (nearest-predecessor) joins — the time-series join Spark
lacks as a built-in, expressed as a composition of built-in operators.

The naive formulation (theta-join on ``l.ts >= r.ts`` + keep latest)
explodes into a per-key cross product. The scalable idiom is
UNION-MERGE: tag both sides, union them, and carry the right side's
columns forward with ``last(col, ignorenulls=True)`` over a window
ordered by (ts, tag) within each `by` key. Cost: ONE shuffle on the
`by` key + a per-partition sort — the same price as any windowed
aggregation, independent of how many left rows match each right row.
At 1000 executors both inputs co-partition on the `by` key and the
merge never materializes pairs.

Semantics match DuckDB/pandas ``merge_asof``:
- direction='backward': latest right row with r.ts <= l.ts (inclusive).
- direction='forward':  earliest right row with r.ts >= l.ts (inclusive).
- Unmatched left rows survive with nulls (left-outer flavor).
- Ties on (by, ts) inside the right table are broken deterministically
  by the largest `right_id` (callers wanting different tie policy
  pre-dedup the right side).

The reference has no joins at all (SURVEY.md §2.3); this operator is
part of the engine's training-data-pipeline extension surface (event
attribution, feature as-of lookup).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    right_cols: Sequence[str] = (),
    right_id: str | None = None,
    direction: str = "backward",
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row plus the nearest right row's
    ``right_cols`` (renamed ``{prefix}{col}``), nearest meaning latest
    r.on <= l.on (backward) or earliest r.on >= l.on (forward) within
    the same `by` key. ``right_id`` (default: first of right_cols)
    deterministically breaks right-side ties on (by, on)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = list(by)
    right_cols = list(right_cols)
    if not right_cols:
        raise ValueError("right_cols must name at least one column to carry")
    right_id = right_id or right_cols[0]

    carried = list(
        dict.fromkeys(c for c in [*right_cols, on, right_id] if c not in by)
    )
    # The right side keeps its UNPREFIXED `on` column too — the merge
    # window orders the union by it; without it right rows would sort
    # on a null ts and every frame would see all of them.
    r = right.select(
        *by,
        F.col(on),
        *[F.col(c).alias(f"{prefix}{c}") for c in carried],
    ).withColumn("_tag", F.lit(0))
    l = left.withColumn("_tag", F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)

    # Within a ts tie the right row must enter the frame before the
    # left rows it matches (inclusive semantics) → tag asc; among tied
    # right rows the LAST in frame wins → right_id asc so max id wins.
    if direction == "backward":
        order = [F.asc(on), F.asc("_tag"), F.asc(f"{prefix}{right_id}")]
        frame = (Window.unboundedPreceding, Window.currentRow)
        pick = F.last
    else:
        # Mirror image: earliest following right row. first() over the
        # forward-unbounded frame, ordered so tied right rows still
        # resolve to max right_id (desc → first seen is the max).
        order = [F.asc(on), F.desc("_tag"), F.desc(f"{prefix}{right_id}")]
        frame = (Window.currentRow, Window.unboundedFollowing)
        pick = F.first

    w = Window.partitionBy(*by).orderBy(*order).rowsBetween(*frame)
    out = merged
    for c in carried:
        out = out.withColumn(f"{prefix}{c}", pick(f"{prefix}{c}", ignorenulls=True).over(w))
    return out.filter(F.col("_tag") == 1).drop("_tag")
