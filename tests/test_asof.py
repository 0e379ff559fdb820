"""As-of join semantics: backward/forward, inclusive ties, unmatched
rows, deterministic right-side tiebreak, partition invariance."""

from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.operators.asof import (
    asof_join,
)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, "a"),
            (1, 20, "b"),
            (1, 25, "c"),
            (2, 5, "d"),   # before any right row for key 2
            (3, 50, "e"),  # key with no right rows at all
        ],
        "k int, ts int, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, 10, 100),
            (1, 10, 101),  # tie on (k, ts): max rid must win
            (1, 22, 102),
            (2, 7, 200),
        ],
        "k int, ts int, rid int",
    )
    return left, right


def _collect(df):
    return {
        r.tag: (r.asof_rid, r.asof_ts)
        for r in df.select("tag", "asof_rid", "asof_ts").collect()
    }


def test_backward_semantics(spark):
    left, right = _frames(spark)
    out = _collect(
        asof_join(left, right, on="ts", by=("k",), right_cols=["rid"], right_id="rid")
    )
    assert out["a"] == (101, 10)   # inclusive ts tie + max-rid tiebreak
    assert out["b"] == (101, 10)   # 22 > 20, so latest at-or-before is 10
    assert out["c"] == (102, 22)
    assert out["d"] == (None, None)  # right row exists only later
    assert out["e"] == (None, None)  # no right rows for the key


def test_forward_semantics(spark):
    left, right = _frames(spark)
    out = _collect(
        asof_join(
            left, right, on="ts", by=("k",), right_cols=["rid"],
            right_id="rid", direction="forward",
        )
    )
    assert out["a"] == (101, 10)   # inclusive at equal ts
    assert out["b"] == (102, 22)   # earliest at-or-after
    assert out["c"] == (None, None)  # nothing follows 25
    assert out["d"] == (200, 7)
    assert out["e"] == (None, None)


def test_left_rows_all_survive(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by=("k",), right_cols=["rid"])
    assert out.count() == left.count()


def test_partition_invariance(spark):
    left, right = _frames(spark)
    a = sorted(map(tuple, asof_join(left, right, on="ts", by=("k",), right_cols=["rid"]).collect()))
    b = sorted(
        map(
            tuple,
            asof_join(
                left.repartition(7), right.repartition(3),
                on="ts", by=("k",), right_cols=["rid"],
            ).collect(),
        )
    )
    assert a == b


def test_matches_brute_force(spark, sf_dir):
    """Union-merge result ≡ the O(n·m) theta-join formulation on a
    slice of the events fixture."""
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

    ev = T(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    fast = asof_join(ev, purch, on="ts", by=("user_id",), right_cols=["purchase_id"])
    brute = (
        ev.alias("l")
        .join(
            purch.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("l.ts") >= F.col("r.ts")),
            "left",
        )
        .groupBy("l.event_id")
        .agg(F.max(F.struct("r.ts", "r.purchase_id")).alias("m"))
        .select("event_id", F.col("m.purchase_id").alias("purchase_id"))
    )
    a = {(r.event_id, r.asof_purchase_id) for r in fast.select("event_id", "asof_purchase_id").collect()}
    b = {(r.event_id, r.purchase_id) for r in brute.collect()}
    assert a == b


def test_range_join_matches_theta(spark, sf_dir):
    """Bucketed range join ≡ naive theta-join, and each pair appears
    exactly once (the 3-cell probe cannot double-count)."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.rangejoin import (
        within_tolerance_pairs,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

    ev = T(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    fast = within_tolerance_pairs(ev, tolerance_s=120.0).collect()
    assert len({(r.id_a, r.id_b) for r in fast}) == len(fast)  # no dups
    us = F.unix_micros("ts")
    a = ev.select(F.col("event_id").alias("ia"), F.col("user_id").alias("u"), us.alias("ta"))
    b = ev.select(F.col("event_id").alias("ib"), F.col("user_id").alias("u"), us.alias("tb"))
    theta = (
        a.join(b, "u")
        .filter((F.col("ia") < F.col("ib")) & (F.abs(F.col("ta") - F.col("tb")) <= 120_000_000))
        .select("ia", "ib")
        .collect()
    )
    assert {(r.id_a, r.id_b) for r in fast} == {(r.ia, r.ib) for r in theta}


def test_range_join_equi_join_plan(spark, sf_dir):
    """The bucketed formulation must plan as a hash equi-join — never
    a nested-loop over per-key cross products."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.rangejoin import (
        within_tolerance_pairs,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

    ev = T(spark, sf_dir, "events")
    plan = within_tolerance_pairs(ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
