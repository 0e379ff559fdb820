"""Scalar function surface (SURVEY.md §2.8) + the histogram composite.

The reference imports the full datetime-extraction family but never
calls it (SteelPred.py:13 — declared intent); here it is applied for
real. ``format_number`` (F1) and the histogram pattern (A9, the
Databricks-generated WIDTH_BUCKET SQL at SteelPred.ipynb:131375) are
first-class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The reference's date column format: `01/01/2018 00:15` (data.csv:2).
REFERENCE_DATE_FORMAT = "dd/MM/yyyy HH:mm"


def parse_reference_date(col: Column | str) -> Column:
    """`to_timestamp` with the reference CSV's format (F3)."""
    return F.to_timestamp(col, REFERENCE_DATE_FORMAT)


def datetime_features(ts: Column | str, prefix: str = "") -> list[Column]:
    """The full extraction family the reference imports
    (SteelPred.py:13): hour month year day minute second weekday
    weekofyear dayofweek dayofmonth dayofyear. All JVM-side Catalyst
    expressions — zero Python in the row path."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return [
        F.hour(c).alias(f"{prefix}hour"),
        F.month(c).alias(f"{prefix}month"),
        F.year(c).alias(f"{prefix}year"),
        F.day(c).alias(f"{prefix}day"),
        F.minute(c).alias(f"{prefix}minute"),
        F.second(c).alias(f"{prefix}second"),
        F.weekday(c).alias(f"{prefix}weekday"),
        F.weekofyear(c).alias(f"{prefix}weekofyear"),
        F.dayofweek(c).alias(f"{prefix}dayofweek"),
        F.dayofmonth(c).alias(f"{prefix}dayofmonth"),
        F.dayofyear(c).alias(f"{prefix}dayofyear"),
    ]


def format_number_col(col: Column | str, decimals: int = 2) -> Column:
    """`format_number(x, 2)` — rounds and adds thousands separators,
    returning a STRING (reference F1, SteelPred.py:57)."""
    return F.format_number(col, decimals)


def histogram(
    df: DataFrame,
    col: str,
    nbins: int = 10,
    bin_col: str = "bin",
    count_col: str = "cnt",
) -> DataFrame:
    """Equi-width histogram — the engine-native version of the
    Databricks auto-generated visualization SQL (reference A9,
    SteelPred.ipynb:131375), which computes WIDTH_BUCKET against
    scalar-subquery min/max and clamps the top edge with LEAST.

    Differences by design (SURVEY §7.4): bin bounds derive
    deterministically from the bin id instead of FIRST() (A7 is
    non-deterministic), and the bucket id uses explicit floor
    arithmetic so the same expression is expressible in any ANSI
    engine (the oracle) — semantics identical to
    WIDTH_BUCKET(x, min, max, n) with the max clamped into bin n.

    Plan shape: one tiny whole-table min/max aggregate (scalar
    subquery, broadcast into the scan) + one hash aggregate on the
    bin id. Two passes over the column, both full-scan-parallel; at
    100 TB the min/max pass is the cheapest possible aggregate and
    the bin agg has at most ``nbins`` groups.
    """
    x = F.col(col)
    stats = df.select(
        F.min(x).alias("_mn"), F.max(x).alias("_mx"), F.count(x).alias("_n")
    )
    mn, mx = F.col("_mn"), F.col("_mx")
    step = (mx - mn) / F.lit(float(nbins))
    bucket = F.least(
        F.floor((x - mn) / step).cast("int") + F.lit(1), F.lit(nbins)
    )
    bin_id = F.when(x.isNull(), F.lit(None).cast("int")).otherwise(
        F.when(mx == mn, F.lit(1)).otherwise(bucket)
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .select(bin_id.alias(bin_col))
        .groupBy(bin_col)
        .agg(F.count(F.lit(1)).alias(count_col))
        .orderBy(bin_col)
    )
