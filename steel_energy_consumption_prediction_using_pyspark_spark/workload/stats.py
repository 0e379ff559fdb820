"""Statistical aggregates and distribution window functions.

The reference's statistics surface is a single Pearson corr
(SteelPred.py:125, SURVEY.md A3); this module widens it to the full
declarative statistics family a 100 TB EDA workload needs — all
single-pass JVM-side aggregates (HashAggregate partial+final, no
Python):

- covariance (pop/samp), higher moments (skewness, kurtosis),
  linear-regression aggregates (regr_slope/intercept/r2/count),
  exact interpolated median, boolean aggregates;
- distribution window functions (ntile, percent_rank, cume_dist,
  first_value/last_value over explicit frames) with unique-key total
  orders so results are deterministic across engines and partitionings;
- string-distance functions (levenshtein) and the padding/search
  function family.

Oracle notes: Spark's skewness/kurtosis are the POPULATION moments
(g1 = m3/m2^1.5, excess g2 = m4/m2² − 3) while DuckDB's built-ins are
sample-corrected — the oracles therefore spell the population formulas
out from avg() powers instead of calling DuckDB's skewness()/kurtosis().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import (
    T,
    exact_pct_sql,
)


# --- covariance / moments / median per group --------------------------------

def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag second/third/fourth-moment statistics over
    lineitem price — one hash-agg pass computes every moment column.
    The exact median rides the rank-based operator
    (operators/relational.py::exact_percentiles_ranked) instead of
    F.median: the median/percentile AGGREGATE buffers every group
    value in one executor's agg buffer (per-group OOM at 100 TB — the
    repo's own standard, see `percentiles`), while the rank-based form
    is a spill-safe window sort. Results are identical; the join back
    is a ≤|groups|-row broadcast."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        exact_percentiles_ranked,
    )

    li = T(spark, sf_dir, "lineitem")
    moments = (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.covar_pop("l_extendedprice", "l_quantity"), 2).alias("cov_pop"),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("cov_samp"),
            F.round(F.stddev_pop("l_extendedprice"), 2).alias("sd_pop"),
            F.round(F.skewness("l_extendedprice"), 4).alias("skew"),
            F.round(F.kurtosis("l_extendedprice"), 4).alias("kurt"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_pos_qty"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_big_disc"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    med = exact_percentiles_ranked(
        li, ["l_returnflag"], "l_extendedprice", {"_med_raw": 0.5}
    )
    # floor-recipe, not round(): the exact median of cent-valued
    # prices is x.xx5 whenever the two middle values differ by an
    # odd cent count, and Spark/DuckDB round halfway cases
    # differently (NOTES.md rule 5) — surfaced at sf0.001.
    med = med.select(
        "l_returnflag",
        (F.floor(F.col("_med_raw") * 100 + F.lit(0.5)) / 100).alias("med_price"),
    )
    return (
        moments.join(F.broadcast(med), "l_returnflag")
        .select(
            "l_returnflag",
            "cov_pop",
            "cov_samp",
            "sd_pop",
            "skew",
            "kurt",
            "med_price",
            "all_pos_qty",
            "any_big_disc",
            "n",
        )
        .orderBy("l_returnflag")
    )


# --- linear-regression aggregates -------------------------------------------

def q_regr_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS-by-aggregation: slope/intercept/R² of extendedprice on
    quantity per linestatus — the declarative (single-pass, no MLlib
    iteration) regression surface. At 100 TB this is the right tool
    for per-group trend lines: one shuffle, no driver round-trips."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias("intercept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
            F.round(F.regr_avgx("l_extendedprice", "l_quantity"), 4).alias("avg_x"),
            F.round(F.regr_avgy("l_extendedprice", "l_quantity"), 2).alias("avg_y"),
        )
        .orderBy("l_linestatus")
    )


# --- distribution window functions ------------------------------------------

def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist/first_value/last_value over a
    unique total order (acctbal, custkey) per nation, folded to one row
    per (nation, quartile). The unique tiebreak makes every rank —
    hence the whole result — identical across engines and shuffle
    layouts (partition-invariance rule, workload/__init__ docstring)."""
    c = T(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    enriched = c.select(
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.first_value("c_custkey").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("poorest"),
        F.last_value("c_custkey").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("richest"),
    )
    return (
        enriched.groupBy("c_nationkey", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("pr"), 6).alias("max_pr"),
            F.round(F.max("cd"), 6).alias("max_cd"),
            # sum, not avg: cent-valued balances make avg land exactly
            # on .xx5 halfway points where the engines' round() differs;
            # the sum is a multiple of 0.01, never halfway at 2 dp.
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
            F.min("poorest").alias("poorest_cust"),
            F.max("richest").alias("richest_cust"),
        )
        .orderBy("c_nationkey", "quartile")
    )


# --- string distance + padding/search family --------------------------------

def q_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein distance between part-name tokens plus the
    pad/search scalar family — all JVM built-ins (no UDF)."""
    p = T(spark, sf_dir, "part")
    first_word = F.split(F.col("p_name"), " ").getItem(0)
    second_word = F.split(F.col("p_name"), " ").getItem(1)
    return (
        p.select(
            "p_partkey",
            first_word.alias("w1"),
            second_word.alias("w2"),
            F.levenshtein(first_word, second_word).alias("lev"),
            F.instr(F.col("p_name"), "e").alias("first_e"),
            F.length(F.rpad(first_word, 10, ".")).alias("pad_len"),
            F.reverse(first_word).alias("w1_rev"),
            F.translate(first_word, "aeiou", "AEIOU").alias("w1_caps_vowels"),
        )
        .groupBy("w1")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("lev"), 4).alias("avg_lev"),
            F.max("lev").alias("max_lev"),
            F.round(F.avg("first_e"), 4).alias("avg_first_e"),
            F.max("w1_rev").alias("max_rev"),
            F.max("w1_caps_vowels").alias("max_caps"),
            F.max("pad_len").alias("pad_len"),
        )
        .orderBy("w1")
    )


# --- mergeable sketches (rows-only: estimates have no SQL oracle) -----------

def _tol_ok(est, exact, tol: float):
    """1 when |est − exact| ≤ tol·|exact| — the Spark-side sketch
    assertion column whose oracle twin is the literal 1 (the
    approx_stats certification pattern: hash exact values, prove the
    estimate in-band in the same plan)."""
    return F.when(
        F.abs(est.cast("double") - exact.cast("double"))
        <= F.abs(exact.cast("double")) * tol,
        F.lit(1),
    ).otherwise(F.lit(0))


def q_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via per-day HLL partials merged
    with hll_union_agg (operators/sketches.py) — certified the
    approx_stats way: the hashed column is the EXACT distinct count
    (own aggregation, joined on the tiny key — never mixed into the
    sketch agg, see approx_stats' Expand note), and the datasketches
    estimate (lg_k=14 → rsd ≈0.8%) is asserted within 5% in-plan via
    est_ok = 1. Tighter accuracy + partition invariance pinned in
    tests/test_sketches.py."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.sketches import (
        hll_distinct_rollup,
    )

    e = T(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    est = hll_distinct_rollup(e, ["event_type"], "user_id", partial_by="day")
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            _tol_ok(F.col("distinct_est"), F.col("exact_distinct"), 0.05).alias(
                "est_ok"
            ),
        )
        .orderBy("event_type")
    )


def q_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketch of lineitem price, built per-returnflag and
    merged (operators/sketches.py), certified with exact twins: hashed
    columns are the exact interpolated quartiles (spill-safe spine)
    and exact row count; each KLL estimate is asserted within 5% of
    its exact value in-plan (k=1600 → rank error ≈1%, and the price
    distribution is dense, so rank error ≈ value error). Rank-level
    accuracy pinned in tests/test_sketches.py."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        exact_percentiles_ranked,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.sketches import (
        kll_quantile_rollup,
    )

    li = T(spark, sf_dir, "lineitem")
    est = kll_quantile_rollup(
        li, "l_extendedprice", [0.25, 0.5, 0.75, 0.95], partial_by="l_returnflag"
    )
    names = {"e25": 0.25, "e50": 0.5, "e75": 0.75, "e95": 0.95}
    exact = exact_percentiles_ranked(
        li.select(F.lit(1).alias("_g"), "l_extendedprice"),
        ["_g"],
        "l_extendedprice",
        names,
    ).drop("_g")
    return est.crossJoin(F.broadcast(exact)).select(
        F.round("e25", 4).alias("p25"),
        F.round("e50", 4).alias("p50"),
        F.round("e75", 4).alias("p75"),
        F.round("e95", 4).alias("p95"),
        "n",
        *[
            _tol_ok(F.col(f"q{int(p * 100):02d}"), F.col(e), 0.05).alias(
                f"ok{int(p * 100):02d}"
            )
            for e, p in names.items()
        ],
    )


def q_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra: users who click vs purchase —
    |A|, |B|, |A∪B|, |A∩B|, |A\\B| without a raw self-join
    (operators/sketches.py), certified with exact twins: hashed
    columns are the exact cardinalities (one conditional-count pass
    over distinct (user, flags)), each theta estimate asserted within
    5% in-plan. Exact-set accuracy pinned in tests/test_sketches.py."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.sketches import (
        theta_overlap,
    )

    e = T(spark, sf_dir, "events")
    est = theta_overlap(e, "event_type", "user_id", "click", "purchase")
    flags = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias("a"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("b"),
        )
    )
    exact = flags.agg(
        F.sum("a").cast("bigint").alias("x_a"),
        F.sum("b").cast("bigint").alias("x_b"),
        F.count(F.lit(1)).alias("x_union"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("x_inter"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("x_diff"),
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "x_a",
        "x_b",
        "x_union",
        "x_inter",
        "x_diff",
        _tol_ok(F.col("n_a"), F.col("x_a"), 0.05).alias("ok_a"),
        _tol_ok(F.col("n_b"), F.col("x_b"), 0.05).alias("ok_b"),
        _tol_ok(F.col("n_union"), F.col("x_union"), 0.05).alias("ok_union"),
        _tol_ok(F.col("n_intersect"), F.col("x_inter"), 0.05).alias("ok_inter"),
        _tol_ok(F.col("n_a_only"), F.col("x_diff"), 0.05).alias("ok_diff"),
    )


def q_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch (approx_top_k, Spark ≥4.1): top-3 event
    types with counts, flattened via explode. The sketch tracks up to
    maxItemsTracked items, so on a column whose cardinality is below
    that bound the 'approximation' is EXACT — which is what licenses
    the DuckDB count/sort oracle here. At true 100 TB cardinalities
    (urls, user ids) the same call degrades gracefully to an estimate
    with bounded-memory mergeable state — the property the exact
    GROUP BY in the oracle does not have."""
    e = T(spark, sf_dir, "events")
    return (
        e.agg(F.expr("approx_top_k(event_type, 3)").alias("tk"))
        .select(F.explode("tk").alias("x"))
        .select(
            F.col("x.item").alias("event_type"),
            F.col("x.count").cast("long").alias("cnt"),
        )
        .orderBy(F.desc("cnt"), F.asc("event_type"))
    )


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization (the batch-effect correction of
    bioinformatics / feature alignment of ML pipelines): each event's
    value is replaced by the GLOBAL distribution's value at the same
    within-type percentile, so every event_type ends up with an
    identical value distribution. Implementation: a 1001-point global
    quantile grid computed from the distinct-VALUE spine (weighted
    order statistics, same interpolation the `percentiles` operator
    proves against DuckDB quantile_cont) — NOT the percentile()
    aggregate, whose single buffer materializes every value of the
    table in one executor (the 100 TB OOM; it also caused a 16 s GC
    outlier in bench under cache pressure). The spine is a parallel
    two-phase hash agg to (value, cnt); a DISTRIBUTED prefix sum
    (operators/relational.py::distributed_prefix_agg — range
    repartition + bounded per-partition-offset collect, integral
    counts so exact) assigns rank ranges with NO single-partition
    window anywhere, so the spine is scale-safe even when |distinct
    values| ≈ |rows| (arbitrary continuous doubles); each spine row then
    GENERATES (sequence+explode) the grid indices whose boundary
    order statistic it holds — pruning bounds are conservative, the
    exact floor/ceil rank condition filters — and the 1001-row lo/hi
    tables join into the interpolated grid. Then one percent_rank
    window per type and a BROADCAST equi-join of the grid on the
    floored grid index — no global window over fact rows anywhere.
    Output: per-type distribution summary of the normalized values;
    sums not avgs (cent-valued halfway rule)."""
    e = T(spark, sf_dir, "events")
    vals = e.filter(F.col("value").isNotNull())
    n_df = vals.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    spine = (
        vals.groupBy("value")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .crossJoin(F.broadcast(n_df))
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        distributed_prefix_agg,
    )

    # Distributed prefix sum over the spine: exact at ANY distinct-value
    # cardinality (no single-partition window, no precision assumption).
    spine = distributed_prefix_agg(
        spine, [F.col("value")], [("_cnt", "sum", "_cum")]
    ).select("value", "_cnt", "_n", "_cum")
    nm1 = F.greatest(F.col("_n") - 1, F.lit(1.0))
    # Conservative gi candidate range per spine row (exact conditions
    # filter below; bounds only prune the explode).
    gmin = F.greatest(
        F.lit(0),
        (F.floor((F.col("_cum") - F.col("_cnt") - 1) * 1000.0 / nm1) - 2).cast("int"),
    )
    gmax = F.least(
        F.lit(1000),
        (F.ceil((F.col("_cum") + 1) * 1000.0 / nm1) + 2).cast("int"),
    )
    cand = spine.select(
        "value", "_cnt", "_n", "_cum",
        F.explode(F.sequence(gmin, gmax)).alias("gi"),
    )
    # 1-indexed target position t = 1 + (n-1)p, p = gi/1000 — the same
    # doubles DuckDB's quantile_cont evaluates.
    t = F.lit(1.0) + (F.col("_n") - 1) * (F.col("gi") / F.lit(1000.0))
    r_lo, r_hi = F.floor(t).cast("long"), F.ceil(t).cast("long")
    covered = lambda r: (r > F.col("_cum") - F.col("_cnt")) & (r <= F.col("_cum"))  # noqa: E731
    lo = cand.filter(covered(r_lo)).select(
        "gi", F.col("value").alias("_v_lo"), (t - F.floor(t)).alias("_frac")
    )
    hi = cand.filter(covered(r_hi)).select("gi", F.col("value").alias("_v_hi"))
    grid = lo.join(hi, "gi").select(
        "gi",
        (F.col("_v_lo") + (F.col("_v_hi") - F.col("_v_lo")) * F.col("_frac")).alias("qv"),
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = e.select(
        "event_type",
        F.least(
            F.floor(F.percent_rank().over(w) * 1000).cast("int"), F.lit(1000)
        ).alias("gi"),
    )
    return (
        ranked.join(F.broadcast(grid), "gi")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("qv"), 2).alias("sum_norm"),
            F.round(F.min("qv"), 2).alias("min_norm"),
            F.round(F.max("qv"), 2).alias("max_norm"),
        )
        .orderBy("event_type")
    )


def q_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly flags via Median Absolute Deviation: days where
    an event type's daily total deviates > 2 robust-σ (MAD·1.4826)
    from that type's MEDIAN — the outlier-resistant twin of
    `zscore_anomaly` (mean/σ are themselves dragged by the outliers
    they're meant to flag; median/MAD are 50%-breakdown robust). Both
    medians ride exact_percentiles_ranked (the weighted-order-
    statistics spine — parallel two-phase agg + distinct-value
    window), so the whole query is exact and oracle-checked against
    quantile_cont. Modified z uses the floor recipe on both sides.

    MAD=0 guard (a type with ≥50% of days exactly at the median):
    robust_z is undefined there, so any day with adev > 0 is flagged
    directly with a NULL robust_z — without the guard, genuinely
    anomalous days in a constant-valued group would silently pass."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        exact_percentiles_ranked,
    )

    e = T(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum("value").alias("v")
    )
    med = exact_percentiles_ranked(daily, ["event_type"], "v", {"med": 0.5})
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("v") - F.col("med"))
    )
    mad = exact_percentiles_ranked(dev, ["event_type"], "adev", {"mad": 0.5})
    flr3 = lambda c: F.floor(c * F.lit(1e3) + F.lit(0.5)) / F.lit(1e3)  # noqa: E731
    rz = F.when(
        F.col("mad") > 0,
        (F.col("v") - F.col("med")) / (F.col("mad") * F.lit(1.4826)),
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .withColumn("robust_z", rz)
        .filter(
            (F.abs(F.col("robust_z")) > 2)
            | ((F.col("mad") == 0) & (F.col("adev") > 0))
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round("v", 2).alias("day_value"),
            flr3(F.col("robust_z")).alias("robust_z"),
        )
        .orderBy("event_type", "day")
    )


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the
    click and purchase value distributions: D = max |F₁(x) − F₂(x)|
    over the pooled support — the standard no-assumptions
    batch-drift detector. Both running ECDFs ride ONE distributed
    prefix-sum pass over the distinct-value support
    (operators/relational.py::distributed_prefix_agg — two integral
    cumulative counts in the same range-partitioned scan, no
    single-partition window at any cardinality); all ECDF values are
    integer-count ratios, so D is engine-exact. Output: D, the value
    attaining it (earliest, deterministic), and sample sizes."""
    e = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        distributed_prefix_agg,
    )

    # Aggregate to the distinct-value support FIRST (distributed
    # hash agg), then compute BOTH running ECDF numerators in one
    # distributed prefix-sum pass — exact integral counts, no
    # single-partition window even when |distinct values| ≈ |rows|.
    per_val = e.groupBy("value").agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("c1"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("c2"),
    )
    tot = per_val.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c2").cast("double").alias("n2"),
    )
    cum = distributed_prefix_agg(
        per_val,
        [F.col("value")],
        [("c1", "sum", "_cum1"), ("c2", "sum", "_cum2")],
    )
    ecdf = cum.crossJoin(F.broadcast(tot)).select(
        "value",
        "n1",
        "n2",
        (F.col("_cum1") / F.col("n1")).alias("f1"),
        (F.col("_cum2") / F.col("n2")).alias("f2"),
    )
    diff = F.abs(F.col("f1") - F.col("f2"))
    return (
        ecdf.select("value", "n1", "n2", diff.alias("d"))
        .orderBy(F.desc("d"), F.asc("value"))
        .limit(1)
        .select(
            F.round("d", 6).alias("ks_d"),
            F.round("value", 2).alias("at_value"),
            F.col("n1").cast("long").alias("n_click"),
            F.col("n2").cast("long").alias("n_purchase"),
        )
    )


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (moving-average STL
    shape) of the daily event-value series: trend = centered 7-day
    moving average, seasonal = mean detrended value per weekday,
    residual = the rest. Output: per-weekday seasonal index + residual
    envelope — the drift/seasonality split every metrics pipeline
    needs before anomaly thresholds mean anything.

    BOUNDED global window: input is one row per DAY (the daily grid,
    already aggregated) — the same day-grid argument as gapfill; the
    sliding frame avg is sequential within the frame, so float
    summation order is identical in both engines."""
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum("value").alias("v")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    dt = daily.select(
        "day",
        "v",
        (F.col("v") - F.avg("v").over(w)).alias("detrended"),
        F.dayofweek("day").alias("dow"),
    )
    seas = dt.groupBy("dow").agg(F.avg("detrended").alias("seasonal"))
    resid = dt.join(F.broadcast(seas), "dow").select(
        "dow", (F.col("detrended") - F.col("seasonal")).alias("r")
    )
    return (
        resid.groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.avg(F.abs(F.col("r"))), 4).alias("avg_abs_resid"),
        )
        .join(
            F.broadcast(seas.select("dow", F.round("seasonal", 4).alias("seasonal"))),
            "dow",
        )
        .select("dow", "seasonal", "n_days", "avg_abs_resid")
        .orderBy("dow")
    )


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clamp each event's value into its type's exact
    [p05, p95] band — the robust-preprocessing step before
    mean-based features (outliers capped, not dropped). Percentile
    edges ride exact_percentiles_ranked (spill-safe spine); output
    per type: raw vs winsorized mean and the clipped-row count."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        exact_percentiles_ranked,
    )

    e = T(spark, sf_dir, "events")
    edges = exact_percentiles_ranked(
        e, ["event_type"], "value", {"p05": 0.05, "p95": 0.95}
    )
    j = e.join(F.broadcast(edges), "event_type")
    wv = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("mean_raw"),
            F.round(F.avg(wv), 4).alias("mean_winsorized"),
            F.sum(
                ((F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95"))).cast("long")
            ).alias("n_clipped"),
        )
        .orderBy("event_type")
    )


def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² test of independence on the event_type × weekday
    contingency table — 'does behavior depend on the day?', the
    categorical-drift screen. All inputs are integer counts, expected
    counts are exact ratios, so χ² is engine-identical to the last
    ulp (rounded to 4). One count pass + broadcast marginals."""
    e = T(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    row_t = obs.groupBy("event_type").agg(F.sum("o").alias("rt"))
    col_t = obs.groupBy("dow").agg(F.sum("o").alias("ct"))
    tot = obs.agg(F.sum("o").cast("double").alias("n"))
    expected = (
        obs.join(F.broadcast(row_t), "event_type")
        .join(F.broadcast(col_t), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow",
            "o",
            (F.col("rt") * F.col("ct") / F.col("n")).alias("ex"),
        )
    )
    cells = expected.agg(
        F.sum(
            (F.col("o") - F.col("ex")) * (F.col("o") - F.col("ex")) / F.col("ex")
        ).alias("chi2"),
        F.count(F.lit(1)).alias("n_cells"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("dow").alias("c"),
    )
    return cells.select(
        F.round("chi2", 4).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        "n_cells",
    )


QUERIES = {
    "seasonal_decompose": q_seasonal_decompose,
    "winsorize": q_winsorize,
    "chi_square": q_chi_square,
    "ks_drift": q_ks_drift,
    "mad_anomaly": q_mad_anomaly,
    "quantile_normalize": q_quantile_normalize,
    "approx_topk": q_approx_topk,
    "stats_moments": q_stats_moments,
    "regr_agg": q_regr_agg,
    "window_distribution": q_window_distribution,
    "string_distance": q_string_distance,
    "sketch_distinct": q_sketch_distinct,
    "sketch_quantiles": q_sketch_quantiles,
    "sketch_overlap": q_sketch_overlap,
}

ORACLES = {
    # sketch trio: exact twins hashed, in-plan tolerance flags pinned
    # to 1 (the approx_stats certification pattern)
    "sketch_distinct": """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
               CAST(1 AS INTEGER) AS est_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "sketch_quantiles": """
        SELECT round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
               round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
               CAST(count(l_extendedprice) AS BIGINT) AS n,
               CAST(1 AS INTEGER) AS ok25,
               CAST(1 AS INTEGER) AS ok50,
               CAST(1 AS INTEGER) AS ok75,
               CAST(1 AS INTEGER) AS ok95
        FROM lineitem
    """,
    "sketch_overlap": """
        WITH flags AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
            FROM events WHERE event_type IN ('click', 'purchase')
            GROUP BY user_id
        )
        SELECT CAST(sum(a) AS BIGINT) AS x_a,
               CAST(sum(b) AS BIGINT) AS x_b,
               CAST(count(*) AS BIGINT) AS x_union,
               CAST(sum(a * b) AS BIGINT) AS x_inter,
               CAST(sum(a * (1 - b)) AS BIGINT) AS x_diff,
               CAST(1 AS INTEGER) AS ok_a,
               CAST(1 AS INTEGER) AS ok_b,
               CAST(1 AS INTEGER) AS ok_union,
               CAST(1 AS INTEGER) AS ok_inter,
               CAST(1 AS INTEGER) AS ok_diff
        FROM flags
    """,
    "seasonal_decompose": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, sum(value) AS v
            FROM events GROUP BY 1
        ),
        dt AS (
            SELECT day, v,
                   v - avg(v) OVER (ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS detrended,
                   CAST(isodow(day) % 7 + 1 AS INTEGER) AS dow
            FROM daily
        ),
        seas AS (SELECT dow, avg(detrended) AS seasonal FROM dt GROUP BY dow)
        SELECT d.dow, round(s.seasonal, 4) AS seasonal,
               CAST(count(*) AS BIGINT) AS n_days,
               round(avg(abs(d.detrended - s.seasonal)), 4) AS avg_abs_resid
        FROM dt d JOIN seas s USING (dow)
        GROUP BY d.dow, s.seasonal ORDER BY d.dow
    """,
    # edges via exact_pct_sql, NOT quantile_cont: the strict clip
    # comparison amplifies quantile_cont's ulp drift at tied order
    # statistics into whole tied groups flipping (sf1 stress finding).
    "winsorize": f"""
        WITH edges AS (
            {exact_pct_sql("events", ["event_type"], "value",
                           {"p05": 0.05, "p95": 0.95})}
        )
        SELECT e.event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(value), 4) AS mean_raw,
               round(avg(least(greatest(value, p05), p95)), 4)
                   AS mean_winsorized,
               CAST(sum(CASE WHEN value < p05 OR value > p95
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
        FROM events e JOIN edges USING (event_type)
        GROUP BY e.event_type ORDER BY e.event_type
    """,
    "chi_square": """
        WITH obs AS (
            SELECT event_type, CAST(isodow(ts) % 7 + 1 AS INTEGER) AS dow,
                   CAST(count(*) AS BIGINT) AS o
            FROM events GROUP BY 1, 2
        ),
        rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
               FROM obs GROUP BY 1),
        ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
        tot AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM obs)
        SELECT round(sum((o - rt * ct / n) * (o - rt * ct / n)
                         / (rt * ct / n)), 4) AS chi2,
               CAST((count(DISTINCT obs.event_type) - 1)
                    * (count(DISTINCT obs.dow) - 1) AS BIGINT) AS dof,
               CAST(count(*) AS BIGINT) AS n_cells
        FROM obs JOIN rt USING (event_type) JOIN ct USING (dow)
        CROSS JOIN tot
    """,
    # medians via exact_pct_sql (see winsorize): the >2 threshold and
    # mad=0 guard are strict comparisons against the interpolated
    # medians — quantile_cont's tie-ulp would flip flag membership.
    "mad_anomaly": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, sum(value) AS v
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        med AS (
            {exact_pct_sql("daily", ["event_type"], "v", {"med": 0.5})}
        ),
        dev AS (
            SELECT d.event_type, d.day, d.v, m.med, abs(d.v - m.med) AS adev
            FROM daily d JOIN med m USING (event_type)
        ),
        mad AS (
            {exact_pct_sql("dev", ["event_type"], "adev", {"mad": 0.5})}
        )
        SELECT d.event_type,
               strftime(d.day, '%Y-%m-%d') AS day,
               round(d.v, 2) AS day_value,
               CASE WHEN m.mad > 0 THEN
                   floor((d.v - d.med) / (m.mad * 1.4826) * 1000 + 0.5e0)
                       / 1000
               END AS robust_z
        FROM dev d JOIN mad m USING (event_type)
        WHERE (m.mad > 0 AND abs((d.v - d.med) / (m.mad * 1.4826)) > 2)
           OR (m.mad = 0 AND d.adev > 0)
        ORDER BY d.event_type, d.day
    """,
    "ks_drift": """
        WITH per_val AS (
            SELECT value,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c2
            FROM events WHERE event_type IN ('click', 'purchase')
            GROUP BY value
        ),
        tot AS (
            SELECT CAST(sum(c1) AS DOUBLE) AS n1, CAST(sum(c2) AS DOUBLE) AS n2
            FROM per_val
        ),
        ecdf AS (
            SELECT value, n1, n2,
                   sum(c1) OVER (ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / n1 AS f1,
                   sum(c2) OVER (ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / n2 AS f2
            FROM per_val CROSS JOIN tot
        )
        SELECT round(abs(f1 - f2), 6) AS ks_d,
               round(value, 2) AS at_value,
               CAST(n1 AS BIGINT) AS n_click,
               CAST(n2 AS BIGINT) AS n_purchase
        FROM ecdf ORDER BY abs(f1 - f2) DESC, value ASC LIMIT 1
    """,
    "quantile_normalize": """
        WITH grid AS (
            SELECT CAST(gi - 1 AS INT) AS gi, qv
            FROM (
                SELECT unnest(quantile_cont(value,
                           list_transform(range(0, 1001), i -> i / 1000.0))) AS qv,
                       generate_subscripts(quantile_cont(value,
                           list_transform(range(0, 1001), i -> i / 1000.0)), 1) AS gi
                FROM events
            )
        ),
        ranked AS (
            SELECT event_type,
                   least(CAST(floor(percent_rank() OVER (
                       PARTITION BY event_type ORDER BY value, event_id
                   ) * 1000) AS INT), 1000) AS gi
            FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(qv), 2) AS sum_norm,
               round(min(qv), 2) AS min_norm,
               round(max(qv), 2) AS max_norm
        FROM ranked JOIN grid USING (gi)
        GROUP BY event_type ORDER BY event_type
    """,
    "approx_topk": """
        SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY event_type
        ORDER BY cnt DESC, event_type ASC LIMIT 3
    """,
    "stats_moments": """
        WITH m AS (
            SELECT l_returnflag, avg(l_extendedprice) AS mean_p
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l.l_returnflag,
               round(covar_pop(l_extendedprice, l_quantity), 2) AS cov_pop,
               round(covar_samp(l_extendedprice, l_quantity), 2) AS cov_samp,
               round(stddev_pop(l_extendedprice), 2) AS sd_pop,
               round(avg(power(l_extendedprice - mean_p, 3))
                     / power(avg(power(l_extendedprice - mean_p, 2)), 1.5e0),
                     4) AS skew,
               round(avg(power(l_extendedprice - mean_p, 4))
                     / power(avg(power(l_extendedprice - mean_p, 2)), 2e0) - 3,
                     4) AS kurt,
               floor(median(l_extendedprice) * 100 + 0.5e0) / 100 AS med_price,
               bool_and(l_quantity > 0) AS all_pos_qty,
               bool_or(l_discount > 0.09e0) AS any_big_disc,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
        GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
    "regr_agg": """
        SELECT l_linestatus,
               round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
               round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
               round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_x,
               round(regr_avgy(l_extendedprice, l_quantity), 2) AS avg_y
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    "window_distribution": """
        WITH e AS (
            SELECT c_nationkey, c_acctbal,
                   ntile(4) OVER w AS quartile,
                   percent_rank() OVER w AS pr,
                   cume_dist() OVER w AS cd,
                   first_value(c_custkey) OVER (
                       w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS poorest,
                   last_value(c_custkey) OVER (
                       w ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING
                   ) AS richest
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey
                         ORDER BY c_acctbal, c_custkey)
        )
        SELECT c_nationkey, quartile,
               CAST(count(*) AS BIGINT) AS n,
               round(max(pr), 6) AS max_pr,
               round(max(cd), 6) AS max_cd,
               round(sum(c_acctbal), 2) AS sum_bal,
               min(poorest) AS poorest_cust,
               max(richest) AS richest_cust
        FROM e GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "string_distance": """
        WITH s AS (
            SELECT p_partkey,
                   split_part(p_name, ' ', 1) AS w1,
                   split_part(p_name, ' ', 2) AS w2,
                   instr(p_name, 'e') AS first_e
            FROM part
        )
        SELECT w1,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(levenshtein(w1, w2)), 4) AS avg_lev,
               CAST(max(levenshtein(w1, w2)) AS INTEGER) AS max_lev,
               round(avg(first_e), 4) AS avg_first_e,
               max(reverse(w1)) AS max_rev,
               max(translate(w1, 'aeiou', 'AEIOU')) AS max_caps,
               CAST(max(length(rpad(w1, 10, '.'))) AS INTEGER) AS pad_len
        FROM s GROUP BY w1 ORDER BY w1
    """,
}
