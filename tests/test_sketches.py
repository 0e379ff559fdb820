"""Mergeable-sketch operators: accuracy vs exact, merge ≡ one-shot,
partition invariance (operators/sketches.py)."""

import pytest
from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.operators.sketches import (
    hll_distinct_rollup,
    kll_quantile_rollup,
    theta_overlap,
)
from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return T(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))


def test_hll_estimate_accuracy(events):
    est = {
        r.event_type: r.distinct_est
        for r in hll_distinct_rollup(events, ["event_type"], "user_id", partial_by="day").collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(2, 0.02 * e), (k, est[k], e)


def test_hll_partial_merge_equals_oneshot_and_partition_invariant(events):
    def run(df, partial_by):
        return {
            r.event_type: r.distinct_est
            for r in hll_distinct_rollup(
                df, ["event_type"], "user_id", partial_by=partial_by
            ).collect()
        }

    oneshot = run(events, None)
    merged = run(events, "day")
    # register-wise union of per-day partials loses nothing: identical
    # registers → identical estimate, not merely close.
    assert merged == oneshot
    assert run(events.repartition(17), "day") == merged


def test_kll_quantiles_rank_accuracy(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    row = kll_quantile_rollup(
        li, "l_extendedprice", [0.25, 0.5, 0.75], partial_by="l_returnflag"
    ).collect()[0]
    n = li.count()
    assert row.n == n
    # KLL guarantees rank error ≤ ~1.7% at k=1600; assert 2.5%.
    for prob, q in [(0.25, row.q25), (0.5, row.q50), (0.75, row.q75)]:
        rank = li.filter(F.col("l_extendedprice") <= q).count() / n
        assert abs(rank - prob) < 0.025, (prob, q, rank)


def test_theta_overlap_accuracy(events):
    row = theta_overlap(events, "event_type", "user_id", "click", "purchase").collect()[0]
    a = {r.user_id for r in events.filter("event_type = 'click'").select("user_id").distinct().collect()}
    b = {r.user_id for r in events.filter("event_type = 'purchase'").select("user_id").distinct().collect()}
    checks = [
        (row.n_a, len(a)),
        (row.n_b, len(b)),
        (row.n_union, len(a | b)),
        (row.n_intersect, len(a & b)),
        (row.n_a_only, len(a - b)),
    ]
    for got, exact in checks:
        assert abs(got - exact) <= max(2, 0.05 * exact), checks
