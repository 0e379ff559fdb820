"""Synthetic replica of the reference's input table (FIXTURES.md §11).

Shape and semantics of `/root/reference/Steel_industry_data.csv`
(header at Steel_industry_data.csv:1; inferred types per SURVEY.md
§1.2): one row per 15-minute interval, calendar columns materialized
as strings, Load_Type frequency order Light > Medium > Maximum, and
corr(CO2, Usage_kWh) ≈ 0.99 — the invariants the reference's EDA and
ML goldens depend on (BASELINE.md).

Generated entirely with Catalyst expressions over ``spark.range`` —
deterministic (seeded xxhash64 noise, no RNG state), distributed (no
driver-side materialization), and scale-free (any row count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Reference column order (post-normalization names, SteelPred.py:139-146).
STEEL_COLUMNS = [
    "date",
    "Usage_kWh",
    "Lagging_Current_Reactive_Power_kVarh",
    "Leading_Current_Reactive_Power_kVarh",
    "CO2",
    "Lagging_Current_Power_Factor",
    "Leading_Current_Power_Factor",
    "NSM",
    "WeekStatus",
    "Day_of_week",
    "Load_Type",
]

FULL_YEAR_ROWS = 35_040  # 365 days × 96 fifteen-minute intervals


def _noise(seed_col, salt: int, lo: float, hi: float):
    """Deterministic pseudo-uniform in [lo, hi): xxhash64 of (row id,
    salt) scaled. Pure column expression — reproducible on any
    partitioning/executor count."""
    u = (F.pmod(F.xxhash64(seed_col, F.lit(salt)), F.lit(1_000_000)) / 1_000_000.0)
    return u * (hi - lo) + lo


def steel_energy(spark: SparkSession, n_rows: int = FULL_YEAR_ROWS) -> DataFrame:
    """Build the steel_energy fixture with `n_rows` 15-min intervals
    starting 2018-01-01 00:00 (the reference data's first timestamp,
    data.csv:2)."""
    base = spark.range(n_rows)  # id = interval index
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2018-01-01 00:00:00")) + F.col("id") * 900
    )
    hour = F.hour(ts)
    dow = F.date_format(ts, "EEEE")  # Monday...Sunday
    weekend = F.dayofweek(ts).isin(1, 7)  # Sun=1, Sat=7

    # Load_Type by hour band — Light the most frequent (pins the
    # StringIndexer frequencyDesc golden: Light→0.0), roughly matching
    # the reference's Light 18072 / Medium 9696 / Maximum 7272 split.
    load_type = (
        F.when(hour < 12, "Light_Load")
        .when(hour < 19, "Medium_Load")
        .otherwise("Maximum_Load")
    )

    # Usage: load-type base + hour shape + noise; weekends run lighter.
    base_kwh = (
        F.when(hour < 12, 4.0).when(hour < 19, 28.0).otherwise(55.0)
    )
    weekday_factor = F.when(weekend, 0.55).otherwise(1.0)
    usage = (
        (base_kwh + _noise(F.col("id"), 1, 0.0, 1.0) ** F.lit(2.0) * 60.0)
        * weekday_factor
    )

    # CO2 tracks usage almost linearly (reference corr 0.98818,
    # SteelPred.ipynb:132859); tiny independent noise keeps it <1.
    co2 = usage * 0.0004 + _noise(F.col("id"), 2, 0.0, 0.004)

    lagging_rp = usage * 0.6 + _noise(F.col("id"), 3, 0.0, 8.0)
    leading_rp = F.when(
        hour >= 19, _noise(F.col("id"), 4, 0.0, 2.0)
    ).otherwise(_noise(F.col("id"), 4, 0.0, 12.0))
    lagging_pf = 100.0 - _noise(F.col("id"), 5, 0.0, 40.0)
    leading_pf = 100.0 - _noise(F.col("id"), 6, 0.0, 60.0)

    return base.select(
        F.date_format(ts, "dd/MM/yyyy HH:mm").alias("date"),
        F.round(usage, 2).alias("Usage_kWh"),
        F.round(lagging_rp, 2).alias("Lagging_Current_Reactive_Power_kVarh"),
        F.round(leading_rp, 2).alias("Leading_Current_Reactive_Power_kVarh"),
        F.round(co2, 4).alias("CO2"),
        F.round(lagging_pf, 2).alias("Lagging_Current_Power_Factor"),
        F.round(leading_pf, 2).alias("Leading_Current_Power_Factor"),
        ((F.col("id") % 96) * 900).cast("int").alias("NSM"),
        F.when(weekend, "Weekend").otherwise("Weekday").alias("WeekStatus"),
        dow.alias("Day_of_week"),
        load_type.alias("Load_Type"),
    )
