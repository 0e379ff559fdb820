"""Synthetic replica of the reference's input table (FIXTURES.md §11).

Shape and semantics of `/root/reference/Steel_industry_data.csv`
(header at Steel_industry_data.csv:1; inferred types per SURVEY.md
§1.2): one row per 15-minute interval, calendar columns materialized
as strings, Load_Type frequency order Light > Medium > Maximum, and
corr(CO2, Usage_kWh) ≈ 0.99 — the invariants the reference's EDA and
ML goldens depend on (BASELINE.md).

Generated entirely with Catalyst expressions over ``spark.range`` —
deterministic (seeded md5-derived noise, no RNG state), distributed
(no driver-side materialization), and scale-free (any row count).

Round 4: the noise family moved from Spark-internal ``xxhash64`` to
the same portable md5 recipe the MinHash/SimHash tiers use
(operators/dedup.py::gram_hash32 — first 8 md5 hex digits as a
uint32), so the WHOLE fixture is reproducible in any engine with
md5(): DuckDB re-derives every row via
``CAST('0x' || substr(md5(id || ':' || salt), 1, 8) AS UBIGINT)``,
which is what lets ``steel_eda`` replay the reference's EDA golden
as a full value-checked oracle instead of a rows-only entry.
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
    """Deterministic pseudo-uniform in [lo, hi): first 8 md5 hex
    digits of "<id>:<salt>" as a uint32, scaled by 2^-32. Pure column
    expression — reproducible on any partitioning/executor count AND
    in any engine with md5() (the portable family shared with the
    MinHash/SimHash oracles; DuckDB twin in workload/ml.py)."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", seed_col.cast("string"), F.lit(str(salt)))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / 4294967296.0
    )
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

    # Usage: a STEP shape over dayparts deliberately misaligned with
    # the Load_Type bands (6h grid vs 12/7/5h bands) plus
    # heteroscedastic multiplicative noise. Step functions of NSM are
    # what trees capture and linear models can't — this reproduces the
    # reference's quality ordering (GBT/DT ≈ 0.99 > LR ≈ 0.978,
    # BASELINE.md) instead of a linearly-solvable target.
    # 3-hour step grid: enough structure that trees reach the ≥0.99
    # band while linear models top out near the reference's 0.978 —
    # the LR ceiling comes from the unmodellable steps + the leak
    # noise below, NOT from irreducible noise (which would cap trees).
    daypart_level = (
        F.when(hour < 3, 5.0)
        .when(hour < 6, 9.0)
        .when(hour < 9, 16.0)
        .when(hour < 12, 30.0)
        .when(hour < 15, 48.0)
        .when(hour < 18, 60.0)
        .when(hour < 21, 70.0)
        .otherwise(52.0)
    )
    weekday_factor = F.when(weekend, 0.55).otherwise(1.0)
    # n1*n1, not pow(n1, 2.0): IEEE multiplication is correctly
    # rounded in every engine, libm pow is not guaranteed to be.
    _n1 = _noise(F.col("id"), 1, 0.0, 1.0)
    rel_noise = 0.93 + 0.14 * _n1 * _n1
    usage = daypart_level * weekday_factor * rel_noise + _noise(
        F.col("id"), 7, 0.0, 1.0
    )

    # CO2 tracks usage with mild relative noise (reference corr
    # 0.98818, SteelPred.ipynb:132859).
    co2 = usage * 0.0004 * (
        1.0 + 0.38 * (_noise(F.col("id"), 2, 0.0, 1.0) - 0.5)
    ) + _noise(F.col("id"), 8, 0.0, 0.0006)

    # Reactive power leaks usage with usage-proportional noise — a
    # strong-but-imperfect linear signal, like the real plant.
    lagging_rp = usage * 0.6 * (
        1.0 + 0.6 * (_noise(F.col("id"), 3, 0.0, 1.0) - 0.5)
    )
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
