"""Operator-level invariants for the relational core (SURVEY.md §2)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.functions.scalar import (
    format_number_col,
    histogram,
    parse_reference_date,
)
from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
    dedup_keep_first,
    group_count,
    seeded_split,
    top_k,
    top_k_per_group,
)
from steel_energy_consumption_prediction_using_pyspark_spark.sources.readers import (
    normalize_column_name,
)
from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T


def test_group_count_totals(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    counts = group_count(li, "l_returnflag").collect()
    assert sum(r["count"] for r in counts) == li.count()


def test_top_k_deterministic(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    a = top_k(o, [F.desc("o_totalprice"), F.asc("o_orderkey")], 5).collect()
    b = top_k(o.repartition(7), [F.desc("o_totalprice"), F.asc("o_orderkey")], 5).collect()
    assert [r.o_orderkey for r in a] == [r.o_orderkey for r in b]


def test_dedup_keep_first_pins_survivor(spark):
    df = spark.createDataFrame(
        [Row(k="a", v=3), Row(k="a", v=1), Row(k="b", v=2)]
    )
    out = {r.k: r.v for r in dedup_keep_first(df, ["k"], [F.asc("v")]).collect()}
    assert out == {"a": 1, "b": 2}


def test_seeded_split_proportions(spark, sf_dir):
    """randomSplit (reference R1, SteelPred.py:155): sizes ≈ weights;
    disjoint and exhaustive."""
    o = T(spark, sf_dir, "orders")
    train, test = seeded_split(o, [0.75, 0.25], seed=64)
    n, nt, ns = o.count(), train.count(), test.count()
    assert nt + ns == n
    assert 0.70 < nt / n < 0.80


def test_histogram_counts_sum(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    h = histogram(o, "o_totalprice", nbins=10).collect()
    assert sum(r.cnt for r in h) == o.count()
    assert all(1 <= r.bin <= 10 for r in h)


def test_histogram_constant_column(spark):
    df = spark.createDataFrame([Row(x=5.0)] * 7)
    h = histogram(df, "x", nbins=10).collect()
    assert len(h) == 1 and h[0].bin == 1 and h[0].cnt == 7


def test_histogram_nulls_separate_bin(spark):
    df = spark.createDataFrame([Row(x=1.0), Row(x=2.0), Row(x=None)])
    h = {r.bin: r.cnt for r in histogram(df, "x", nbins=2).collect()}
    assert h.get(None) == 1
    assert sum(v for k, v in h.items() if k is not None) == 2


def test_normalize_column_name():
    assert (
        normalize_column_name("Lagging_Current_Reactive.Power_kVarh")
        == "Lagging_Current_Reactive_Power_kVarh"
    )
    assert normalize_column_name("CO2(tCO2)") == "CO2"
    assert normalize_column_name("plain") == "plain"


def test_format_number_is_string(spark):
    """Reference F1 (SteelPred.py:57): format_number returns a STRING
    with thousands separators, 2dp."""
    df = spark.range(1).select(format_number_col(F.lit(61810.401), 2).alias("s"))
    assert df.collect()[0].s == "61,810.40"


def test_parse_reference_date(spark):
    """F3: dd/MM/yyyy HH:mm parsing (the reference's date format)."""
    df = spark.createDataFrame([Row(d="01/02/2018 00:15")]).select(
        parse_reference_date("d").alias("ts")
    )
    ts = df.collect()[0].ts
    assert (ts.year, ts.month, ts.day, ts.hour, ts.minute) == (2018, 2, 1, 0, 15)


def test_salted_agg_matches_direct(spark, sf_dir):
    """Salted two-phase aggregation ≡ direct aggregation (the skew
    recipe must not change results)."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        salted_sum_count,
    )

    e = T(spark, sf_dir, "events")
    direct = {
        r.event_type: (round(r.s, 6), r.c)
        for r in e.groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        r.event_type: (round(r.sum_value, 6), r.cnt)
        for r in salted_sum_count(e, ["event_type"], "value", 16).collect()
    }
    assert direct == salted


def test_approx_within_tolerance(spark, sf_dir):
    """HLL++ count-distinct within its default 5% rsd; GK median within
    5% of exact (the accuracy contract behind q_approx_stats)."""
    li = T(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05
    assert abs(row.p50_approx - row.p50_exact) / row.p50_exact < 0.05


def test_top_k_per_group(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    latest = top_k_per_group(
        o, ["o_custkey"], [F.desc("o_orderdate"), F.asc("o_orderkey")], k=2
    )
    counts = latest.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0]
    assert counts <= 2


def test_unpivot_multiplies_rows(spark, sf_dir):
    """unpivot emits exactly one row per (input row, measure) — the
    Expand operator must not drop null-valued measures here (none of
    the four lineitem measures are nullable in the fixture)."""
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.core import (
        q_unpivot,
    )

    n_input = T(spark, sf_dir, "lineitem").count()
    out = {r.measure: r.n for r in q_unpivot(spark, sf_dir).collect()}
    assert set(out) == {"qty", "price", "disc", "tax"}
    assert all(v == n_input for v in out.values())


def test_argmax_matches_window_pick(spark, sf_dir):
    """max_by with the packed BIGINT key must agree with the reference
    semantics: row_number over (acctbal DESC, custkey DESC) = 1."""
    from pyspark.sql import Window

    from steel_energy_consumption_prediction_using_pyspark_spark.workload.core import (
        q_argmax,
    )

    c = T(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.desc("c_custkey")
    )
    expect = {
        r.c_nationkey: r.c_custkey
        for r in c.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    got = {r.c_nationkey: r.top_cust for r in q_argmax(spark, sf_dir).collect()}
    assert got == expect


def test_sample_hash_fraction_and_stability(spark, sf_dir):
    """The multiplicative-hash sample is a pure function of the key:
    identical row set under different partitioning, and the sampled
    fraction is near 10%."""
    o = T(spark, sf_dir, "orders")
    pred = ((F.col("o_orderkey") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(4294967296) < F.lit(
        429496729
    )
    a = sorted(r.o_orderkey for r in o.filter(pred).select("o_orderkey").collect())
    b = sorted(
        r.o_orderkey
        for r in o.repartition(7).filter(pred).select("o_orderkey").collect()
    )
    assert a == b
    frac = len(a) / o.count()
    assert 0.05 < frac < 0.15


def test_gapfill_dense_timeline(spark, sf_dir):
    """Gap-fill output is one row per hour, contiguous from min to max,
    and the filled counts sum to the ungapped total."""
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.core import (
        q_gapfill,
    )

    rows = q_gapfill(spark, sf_dir).collect()
    hours = [r.hour for r in rows]
    assert len(hours) == len(set(hours))
    n_expected = (
        T(spark, sf_dir, "events").filter("event_type = 'purchase'").count()
    )
    assert sum(r.cnt for r in rows) == n_expected
    from datetime import datetime, timedelta

    t0 = datetime.strptime(hours[0], "%Y-%m-%d %H:%M:%S")
    t1 = datetime.strptime(hours[-1], "%Y-%m-%d %H:%M:%S")
    assert len(hours) == int((t1 - t0) / timedelta(hours=1)) + 1


def test_observe_rules_and_gate(spark, sf_dir):
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.quality import (
        check_gate,
        observe_rules,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

    o = T(spark, sf_dir, "orders")
    observed, obs = observe_rules(
        o,
        {
            "price_positive": F.col("o_totalprice") > 0,
            "status_known": F.col("o_orderstatus").isin("P", "O", "F"),
            "priority_tagged": F.col("o_orderpriority").startswith("9"),
        },
    )
    n = observed.count()  # the action the metrics piggyback on
    got = obs.get
    assert got["n_rows"] == n
    assert got["bad_price_positive"] == 0
    assert got["bad_status_known"] == 0
    assert got["bad_priority_tagged"] == n  # no priority starts with '9'
    import pytest as _pytest

    with _pytest.raises(ValueError, match="priority_tagged"):
        check_gate(obs)


def test_salted_join_matches_direct(spark):
    """Skew-salted join ≡ plain join on a maximally skewed key (90% of
    big-side rows share one key), for inner and left; right/full are
    rejected."""
    import pytest
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        salted_join,
    )

    big = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(1)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    direct = big.join(small, "k").groupBy("k").agg(
        F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n")
    )
    salted = salted_join(big, small, on=["k"], salt_buckets=4).groupBy("k").agg(
        F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n")
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, salted.collect()))

    left = salted_join(big, small, on=["k"], salt_buckets=4, how="left")
    assert left.count() == 1000  # unmatched big rows survive exactly once
    assert left.filter(F.col("v").isNull()).count() == big.filter(F.col("k") >= 5).count()

    with pytest.raises(ValueError):
        salted_join(big, small, on=["k"], how="full")


def test_er_blocking_resolves_all_true_matches(spark, sf_dir):
    """The blocked ER pipeline (workload/linkage.py) must resolve every
    corrupted customer back to its true entity at sf0.001: the letter-
    region corruptions never touch the digit region, so the true match
    is always strictly closest in edit distance within its block."""
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.linkage import (
        q_er_quality,
    )

    row = q_er_quality(spark, sf_dir).collect()[0]
    assert row.n_dirty > 0
    assert row.n_correct == row.n_dirty


def test_skew_profile_hand_computed(spark):
    """Known distribution: a×6, b×3, c×1 → summary row and hot-key
    pack are exact."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.quality import (
        skew_profile,
    )

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)]
    df = spark.createDataFrame(rows, "k string")
    r = skew_profile(df, ["k"], top=2).collect()[0]
    assert (r.n_keys, r.n_rows, r.max_cnt) == (3, 10, 6)
    assert r.avg_cnt == pytest.approx(3.3333, abs=1e-4)
    assert r.skew_factor == pytest.approx(6 / 3.3333, abs=1e-3)
    assert [(h.key, h.cnt) for h in r.hot_keys] == [("a", 6), ("b", 3)]


def test_weighted_hash_sample_bounds_and_nesting(spark):
    """weight 0 keeps nothing, weight ≥ 1/base keeps everything, and
    the survivor set at base_rate r nests inside the one at 2r."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        weighted_hash_sample,
    )

    df = spark.range(1, 2000).withColumnRenamed("id", "k")
    assert weighted_hash_sample(df, "k", F.lit(0.0), 0.5).count() == 0
    assert weighted_hash_sample(df, "k", F.lit(2.0), 0.5).count() == 1999
    small = {r.k for r in weighted_hash_sample(df, "k", F.lit(0.4), 0.5).collect()}
    big = {r.k for r in weighted_hash_sample(df, "k", F.lit(0.8), 0.5).collect()}
    assert small and small < big


def test_exact_percentiles_match_builtin_on_ties(spark):
    """Weighted-order-statistics rewrite ≡ Spark's own percentile()
    aggregate on data dense with ties (the histogram-spine path must
    cover boundary ranks falling inside AND between value runs),
    including p=0/p=1 edges and a single-row group."""
    import random

    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        exact_percentiles_ranked,
    )

    rng = random.Random(7)
    rows = [("g%d" % rng.randint(0, 2), float(rng.randint(0, 9)) / 4.0)
            for _ in range(500)]
    rows.append(("lonely", 3.25))
    df = spark.createDataFrame(rows, "k string, v double")
    ps = {"p0": 0.0, "p17": 0.17, "p50": 0.5, "p83": 0.83, "p100": 1.0}
    got = {
        r["k"]: tuple(r[name] for name in ps)
        for r in exact_percentiles_ranked(df, ["k"], "v", ps).collect()
    }
    import pyspark.sql.functions as F

    want = {
        r["k"]: tuple(r[name] for name in ps)
        for r in df.groupBy("k")
        .agg(*[
            F.expr(f"percentile(v, {p})").alias(name)
            for name, p in ps.items()
        ])
        .collect()
    }
    assert got == want


def test_zorder_interleave_hand_computed(spark):
    """zorder_value(a, b) interleaves a into even and b into odd bit
    positions: hand-pinned values."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        zorder_value,
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 0), (0, 3), (255, 255)], "a long, b long"
    )
    got = [
        r.z
        for r in df.select(
            zorder_value(F.col("a"), F.col("b"), 8).alias("z")
        ).collect()
    ]
    #           a=1→1, b=1→2, a=3→0b0101=5, b=3→0b1010=10, both 255→65535
    assert got == [0, 1, 2, 5, 10, 65535]


def test_zorder_sql_matches_spark(spark):
    """The DuckDB-side arithmetic twin produces the identical z for
    every (a, b) in the 8-bit domain sample."""
    import duckdb
    import pyspark.sql.functions as F

    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        zorder_sql,
        zorder_value,
    )

    pairs = [(a, b) for a in range(0, 256, 17) for b in range(0, 256, 23)]
    df = spark.createDataFrame(pairs, "a long, b long")
    spark_z = [
        r.z
        for r in df.select(zorder_value(F.col("a"), F.col("b"), 8).alias("z"))
        .orderBy("a", "b")
        .collect()
    ]
    duck_z = [
        r[0]
        for r in duckdb.sql(
            "SELECT " + zorder_sql("a", "b", 8) + " AS z FROM ("
            "SELECT unnest($a) AS a, unnest($b) AS b) ORDER BY a, b",
            params={"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]},
        ).fetchall()
    ]
    assert spark_z == duck_z


def test_zorder_buckets_bound_both_dims(spark):
    """The pruning guarantee the layout rests on: with top-4-bit
    z-buckets, every bucket's span in EACH quantized dimension is at
    most 64 (¼ of the 256 domain) — a single-column sort bounds only
    its own column."""
    import pyspark.sql.functions as F

    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        zorder_value,
    )

    df = spark.range(0, 4096).select(
        (F.col("id") % 256).alias("a"), ((F.col("id") * 37) % 256).alias("b")
    )
    z = zorder_value(F.col("a"), F.col("b"), 8)
    stats = (
        df.select("a", "b", F.shiftright(z, 12).alias("zb"))
        .groupBy("zb")
        .agg(
            (F.max("a") - F.min("a")).alias("spana"),
            (F.max("b") - F.min("b")).alias("spanb"),
        )
        .collect()
    )
    assert len(stats) == 16
    for r in stats:
        assert r.spana <= 64 - 1 and r.spanb <= 64 - 1


def test_distributed_prefix_sum_matches_global_window(spark):
    """Range-partitioned prefix sum ≡ single-partition window cumsum
    for integral weights, on ties-included data and any input
    partitioning."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        distributed_prefix_sum,
    )

    rows = [(i, (i * 7) % 5, (i * 13) % 97 + 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, grp long, w long").repartition(17)
    order = [F.col("grp").asc(), F.col("id").asc()]
    got = {
        r.id: r.cum
        for r in distributed_prefix_sum(df, order, "w", out_col="cum").collect()
    }
    wspec = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r.id: r.cum
        for r in df.select("id", F.sum("w").over(wspec).alias("cum")).collect()
    }
    assert got == want


def test_distributed_prefix_agg_matches_window(spark):
    """distributed_prefix_agg ≡ the global-window running aggregates it
    replaces, for: multi-column sums in one pass, running max, and the
    EXCLUSIVE frame (unboundedPreceding..-1, NULL on the first global
    row) — across an input cardinality equal to the row count (the
    regime the old bounded-spine assumption could not survive)."""
    from pyspark.sql import Window

    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        distributed_prefix_agg,
    )

    df = spark.range(0, 2003).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 500 + 1).alias("w1"),
        ((F.col("id") * 11) % 97).alias("w2"),
    )
    got = {
        (r["k"], r["s1"], r["s2"], r["mx"])
        for r in distributed_prefix_agg(
            df,
            [F.col("k")],
            [("w1", "sum", "s1"), ("w2", "sum", "s2"), ("w2", "max", "mx")],
            num_partitions=8,
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r["k"], r["s1"], r["s2"], r["mx"])
        for r in df.select(
            "k",
            F.sum("w1").over(w).alias("s1"),
            F.sum("w2").over(w).alias("s2"),
            F.max("w2").over(w).alias("mx"),
        ).collect()
    }
    assert got == want

    wx = Window.orderBy(F.desc("k")).rowsBetween(Window.unboundedPreceding, -1)
    got_x = {
        (r["k"], r["prev"])
        for r in distributed_prefix_agg(
            df,
            [F.desc("k")],
            [("w2", "max", "prev")],
            exclusive=True,
            num_partitions=8,
        ).collect()
    }
    want_x = {
        (r["k"], r["prev"])
        for r in df.select("k", F.max("w2").over(wx).alias("prev")).collect()
    }
    assert got_x == want_x
    assert any(p is None for _, p in got_x)  # first global row → NULL


def test_compaction_bins_hand_computed(spark):
    """Bin = exclusive running total DIV target, per partition: files
    of sizes 60,60,60 with target 100 pack as [0,0,1] (the second 60
    starts at offset 60 < 100; the third at 120 >= 100), and a file
    larger than target still gets its own bin without absorbing the
    next partition's files."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        compaction_bins,
    )

    rows = [
        ("a", 1, 60), ("a", 2, 60), ("a", 3, 60),
        ("b", 1, 250), ("b", 2, 10),
    ]
    df = spark.createDataFrame(rows, ["part", "f", "bytes"])
    got = {
        (r.part, r.f, r.bin)
        for r in compaction_bins(df, "part", "f", "bytes", F.lit(100)).collect()
    }
    assert got == {
        ("a", 1, 0), ("a", 2, 0), ("a", 3, 1),
        ("b", 1, 0), ("b", 2, 2),
    }


def test_join_size_estimate_matches_actual_join(spark):
    """est_rows is EXACT: equal to the materialized equi-join count,
    and max_key_rows/top_key name the worst key (struct-max ties →
    largest key)."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.quality import (
        join_size_estimate,
    )

    a = spark.createDataFrame([(1,), (1,), (2,), (3,), (3,), (3,)], ["k"])
    b = spark.createDataFrame([(1,), (2,), (2,), (3,), (9,)], ["k"])
    prof = join_size_estimate(a, "k", b, "k", "t").collect()[0]
    actual = a.join(b, "k").count()
    assert prof.est_rows == actual == 1 * 2 + 2 * 1 + 3 * 1
    assert prof.n_shared_keys == 3
    # contributions: k1=2, k2=2, k3=3 -> max 3 at key 3
    assert prof.max_key_rows == 3 and prof.top_key == 3
    assert prof.join_name == "t"
