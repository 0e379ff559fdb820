"""Behavioral-analytics family: SCD2 compression semantics + the
funnel/cohort invariants the oracle hash can't express directly."""

import datetime as dt

from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.operators.scd import (
    scd2_compress,
)
from steel_energy_consumption_prediction_using_pyspark_spark.workload import behavior


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def _events(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts", "event_id"])


def test_scd2_compresses_consecutive_runs(spark):
    """A A B A collapses to runs A, B, A — repeats inside a run are
    absorbed, but a state REVISITED after a change opens a new row
    (the property dropDuplicates would get wrong)."""
    df = _events(
        spark,
        [
            (1, "a", _ts(0), 10),
            (1, "a", _ts(1), 11),
            (1, "b", _ts(2), 12),
            (1, "a", _ts(3), 13),
        ],
    )
    out = scd2_compress(df, "user_id", "event_type", "ts", "event_id")
    rows = out.orderBy("valid_from").collect()
    assert [r.state for r in rows] == ["a", "b", "a"]
    assert [r.is_current for r in rows] == [0, 0, 1]


def test_scd2_intervals_tile_without_gaps(spark, sf_dir):
    """Each closed interval's valid_to must equal the next run's
    valid_from (half-open [from, to) tiling), and every key has exactly
    one open (current) row."""
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    out = scd2_compress(e, "user_id", "event_type", "ts", "event_id")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from")
    checked = out.withColumn("next_from", F.lead("valid_from").over(w))
    gaps = checked.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    ).count()
    assert gaps == 0
    per_key_current = (
        out.groupBy("user_id").agg(F.sum("is_current").alias("n")).filter(F.col("n") != 1)
    )
    assert per_key_current.count() == 0


def test_scd2_partition_invariant(spark, sf_dir):
    """Same history regardless of input partitioning — the window
    shuffle must be the only order-defining step."""
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    a = scd2_compress(e, "user_id", "event_type", "ts", "event_id")
    b = scd2_compress(e.repartition(13), "user_id", "event_type", "ts", "event_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_funnel_stages_monotone(spark, sf_dir):
    """Strict ordering can only lose users stage over stage."""
    rows = {r.stage: r.users for r in behavior.q_funnel_strict(spark, sf_dir).collect()}
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"]
    assert rows["1_view"] > 0


def test_cohort_week_zero_covers_all_users(spark, sf_dir):
    """Every user is active in their own first week: summing
    week_offset=0 active_users over cohorts equals the distinct-user
    total."""
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

    df = behavior.q_cohort_retention(spark, sf_dir)
    week0 = (
        df.filter(F.col("week_offset") == 0)
        .agg(F.sum("active_users").alias("s"))
        .collect()[0]
        .s
    )
    total = T(spark, sf_dir, "events").select("user_id").distinct().count()
    assert week0 == total


def test_ewma_hand_computed(spark):
    """y = [1, 2, 3] with alpha 0.3: y0=1, y1=0.3*2+0.7*1=1.3,
    y2=0.3*3+0.7*1.3=1.81; order must follow (ts, event_id)."""
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.behavior import (
        q_ewma_value,
    )
    import datetime as dt

    # build a tiny events-shaped frame and monkey-route through the
    # same fold expression by calling the operator inline
    from pyspark.sql import functions as F

    rows = [
        (2, dt.datetime(2024, 1, 1, 0, 2), 7, 3.0),
        (0, dt.datetime(2024, 1, 1, 0, 0), 7, 1.0),
        (1, dt.datetime(2024, 1, 1, 0, 1), 7, 2.0),
    ]
    e = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    seq = (
        e.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))).alias("seq"))
        .withColumn("vals", F.expr("transform(seq, s -> s.value)"))
    )
    ewma = F.aggregate(
        F.slice(F.col("vals"), 2, F.size("vals") - 1),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    got = seq.select(F.round(ewma, 6).alias("y")).collect()[0].y
    assert got == 1.81


def test_ohlc_hand_computed(spark):
    """Three ticks in one hour: open = earliest value, close = latest,
    high/low = extremes, regardless of row order."""
    import datetime as dt

    from pyspark.sql import functions as F

    rows = [
        (1, dt.datetime(2024, 1, 1, 9, 30), "trade", 10.0),
        (2, dt.datetime(2024, 1, 1, 9, 10), "trade", 12.0),
        (3, dt.datetime(2024, 1, 1, 9, 50), "trade", 8.0),
    ]
    e = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    bar = (
        e.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("bar"),
            "event_type", "value", F.unix_micros("ts").alias("k"),
        )
        .groupBy("event_type", "bar")
        .agg(
            F.min_by("value", "k").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "k").alias("close"),
        )
        .collect()[0]
    )
    assert (bar.open, bar.high, bar.low, bar.close) == (12.0, 12.0, 8.0, 8.0)


def test_twap_weights_by_duration(spark):
    """value 10 held 30 s then value 20 held 10 s → TWAP 12.5, not the
    unweighted mean 15."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import Window

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 7, 10.0),
        (2, t0 + dt.timedelta(seconds=30), 7, 20.0),
        (3, t0 + dt.timedelta(seconds=40), 7, 99.0),  # terminal: zero weight
    ]
    e = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    timed = e.select(
        "user_id", "value",
        ((F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")) / F.lit(1e6)).alias("d"),
    ).filter(F.col("d").isNotNull())
    got = (
        timed.groupBy("user_id")
        .agg((F.sum(F.col("value") * F.col("d")) / F.sum("d")).alias("twap"))
        .collect()[0]
        .twap
    )
    assert got == 12.5
