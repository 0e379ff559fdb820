"""Behavioral / event-stream analytics over the ``events`` fixture.

The reference has no event surface at all (its time axis is a
pre-materialized string column, SURVEY.md §1.1); this family is the
engine's product-analytics tier — the query shapes every large event
warehouse runs daily: cohort retention, anomaly flagging, value-decile
segmentation, SCD2 dimension history, ordered funnels.

Scale notes (100 TB design):
- every query aggregates the fact table FIRST and runs windows /
  scalar math on the reduced relation (users, days, or customers —
  orders of magnitude smaller than events/orders);
- the one global window in ``customer_deciles`` runs on the per-
  customer aggregate, never the raw facts — single-partition windows
  over fact tables are the canonical 100 TB anti-pattern;
- per-user windows (SCD2) shuffle once on user_id and reuse that
  partitioning for both window passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
    distributed_ntile,
)
from steel_energy_consumption_prediction_using_pyspark_spark.operators.scd import (
    scd2_compress,
)
from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import (
    T,
    exact_pct_sql,
    ts_str,
)

EPOCH = "2024-01-01"  # fixture events all fall in 2024-01 (TESTDATA.md)


# --- cohort retention ---------------------------------------------------------

def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their
    first event, activity counted per week offset since that first
    event. Week indexes are plain day-arithmetic (floor(days/7)) — not
    date_trunc('week') — so the bucketing is identical in any engine
    regardless of week-start convention.

    Plan: one groupBy(user_id) for first-touch, joined back on the
    same key (partitioning reused, no second fact shuffle), then a
    small (cohort × offset) aggregate."""
    e = T(spark, sf_dir, "events").select("user_id", "ts")
    first = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    j = e.join(first, "user_id")
    cohort_week = F.floor(
        F.datediff(F.to_date("first_ts"), F.lit(EPOCH).cast("date")) / 7
    ).cast("int")
    week_offset = F.floor(
        F.datediff(F.to_date("ts"), F.to_date("first_ts")) / 7
    ).cast("int")
    return (
        j.groupBy(cohort_week.alias("cohort_week"), week_offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# --- z-score daily anomaly flags ---------------------------------------------

def q_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days where an event type's daily value total deviates >2σ from
    that type's mean — the standard ops-dashboard anomaly rule. The
    mean/σ come from a per-type aggregate over the (tiny) daily
    relation, broadcast back; the raw fact table is touched once."""
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum("value").alias("v"))
    stats = daily.groupBy("event_type").agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sd")
    )
    z = (F.col("v") - F.col("mu")) / F.col("sd")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round("v", 2).alias("day_value"),
            F.round("z", 3).alias("zscore"),
        )
        .orderBy("event_type", "day")
    )


# --- customer value deciles ---------------------------------------------------

def q_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value deciles: total spend per customer, then
    an exact ntile(10) over the aggregate — computed by
    `distributed_ntile` (range-repartition + partition-offset rank),
    NOT a global unpartitioned window: the per-customer aggregate is
    ~10⁹ rows at 100 TB and a single-partition ntile window would push
    all of them through one task. Ties broken by custkey so decile
    assignment is total-ordered and cross-engine deterministic
    (bit-identical to DuckDB's ntile(10) oracle)."""
    spend = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    tiled = distributed_ntile(
        spend, 10, [F.col("spend").desc(), F.col("o_custkey")], tile_col="decile"
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("spend"), 2).alias("decile_spend"),
        )
        .orderBy("decile")
    )


# --- SCD2 dimension history ---------------------------------------------------

def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history of each user's event-type "state": runs of
    equal consecutive states compress to one row with
    [valid_from, valid_to) bounds; the open run is flagged current.
    Exercises operators/scd.py::scd2_compress (lag change-detection +
    lead interval-close, one shuffle)."""
    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    out = scd2_compress(e, key="user_id", state="event_type", ts="ts", tiebreak="event_id")
    return out.select(
        "user_id",
        "state",
        ts_str(F.col("valid_from")).alias("valid_from"),
        ts_str(F.col("valid_to")).alias("valid_to"),
        "is_current",
    ).orderBy("user_id", "valid_from")


# --- strict ordered funnel ----------------------------------------------------

def q_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel view → click → purchase:
    a user converts a stage only with an event strictly after their
    earliest previous-stage event. Three cascaded per-user min
    aggregates, each joined on user_id (partitioning reused; each
    stage's survivor set only shrinks). Unlike stream_join's
    time-bounded pair attribution, this is the whole-journey funnel."""
    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(name).alias("stage"), "users"
        )

    return (
        stage(v, "1_view")
        .unionByName(stage(c, "2_click"))
        .unionByName(stage(p, "3_purchase"))
        .orderBy("stage")
    )


EWMA_ALPHA = 0.3


def q_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event values
    (y_t = αx_t + (1−α)y_{t−1}, y_0 = x_0 — pandas ewm(adjust=False)
    semantics) computed ENTIRELY JVM-side: sort_array(collect_list)
    per user, then a fold (F.aggregate) over the ordered values. The
    recursion is inherently sequential per key, so the per-key series
    is the minimal unit of serial work — state is one double, work is
    one pass, parallelism is across users. DuckDB's list_reduce is the
    identical left fold, so the same float op sequence runs on both
    engines and the values match exactly.

    Memory note: collect_list buffers one user's series (like the
    percentile() aggregate, spill-less); at 100 TB cap the window
    (e.g. last 10k events per user via a pre-filter window) or feed
    day-partials — the recursion composes: y over day N seeds day N+1.
    """
    e = T(spark, sf_dir, "events")
    seq = (
        e.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("seq")
        )
        .withColumn("vals", F.expr("transform(seq, s -> s.value)"))
    )
    a = float(EWMA_ALPHA)
    ewma = F.aggregate(
        F.slice(F.col("vals"), 2, F.size("vals") - 1),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: F.lit(a) * x + F.lit(1.0 - a) * acc,
    )
    return seq.select(
        "user_id",
        F.size("vals").alias("n_events"),
        F.round(ewma, 6).alias("ewma_value"),
    ).orderBy("user_id")


def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (the TWAP of an irregular
    series): each observation is weighted by its holding duration
    (seconds until the user's next event), so bursts of readings don't
    dominate the mean the way a plain avg lets them. One window pass
    for lead(ts), one aggregation; the last observation (no successor)
    carries zero weight by construction. Sums (not avgs) of the
    weighted terms are rounded, keeping the halfway-rounding rule."""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    timed = e.select(
        "user_id",
        "value",
        (
            (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts"))
            / F.lit(1e6)
        ).alias("dur_s"),
    ).filter(F.col("dur_s").isNotNull())
    flr = lambda c, n: F.floor(c * F.lit(10.0**n) + F.lit(0.5)) / F.lit(10.0**n)  # noqa: E731
    return (
        timed.groupBy("user_id")
        .agg(
            # floor-recipe: value·duration products are decimal multiples
            # of 1e-8, whose shortest reprs DO land on .xx5 (NOTES rule 5
            # applies to these sums, unlike cent-multiple sums).
            flr(F.sum(F.col("value") * F.col("dur_s")), 2).alias("vs"),
            flr(F.sum("dur_s"), 2).alias("span_s"),
            F.count(F.lit(1)).alias("n_holds"),
        )
        .withColumn("twap", flr(F.col("vs") / F.col("span_s"), 6))
        .orderBy("user_id")
    )


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling (candlestick bars): per event_type and hour,
    open = first value in time order, close = last, high/low = extremes.
    open/close are min_by/max_by on a (ts, event_id) packed key —
    arg-ordering aggregates in one hash-agg pass, NO window over the
    raw facts (the 100 TB-safe shape: state per group is one row)."""
    e = T(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
    # event timestamps are globally unique in the fixture (pinned by
    # the oracle agreeing), so µs-since-epoch alone is a total order.
    okey = F.unix_micros("ts")
    return (
        e.select(hour.alias("bar"), F.col("event_type"), "value", okey.alias("k"))
        .groupBy("event_type", "bar")
        .agg(
            F.min_by("value", "k").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "k").alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .orderBy("event_type", "bar")
    )


def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median (robust smoother) of each user's last 5
    values: Spark's median() cannot take a window frame, so the frame
    is materialized per row (collect_list over ROWS BETWEEN 4
    PRECEDING), sorted in place, and interpolated — bounded state (5
    doubles/row) regardless of series length, one shuffle on user_id.
    DuckDB's framed median() computes the identical interpolation;
    floor-recipe rounding (cent-valued inputs make even-count medians
    land on .xx5)."""
    e = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    frame = e.select(
        "event_id",
        "user_id",
        F.array_sort(F.collect_list("value").over(w)).alias("arr"),
    )
    n = F.size("arr")
    lo = F.element_at(F.col("arr"), F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(F.col("arr"), (F.floor(n / 2) + 1).cast("int"))
    med = (lo + hi) / 2
    return frame.select(
        "event_id",
        "user_id",
        (F.floor(med * 100 + F.lit(0.5)) / 100).alias("med5"),
    ).orderBy("event_id")


def q_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per overlapping window (2 h window, 1 h
    slide): each event lands in 2 windows, and COUNT(DISTINCT) must
    dedup within each independently — the overlap makes this
    non-mergeable from tumbling partials (the sketch path for the same
    question at 100 TB is sketch_distinct's HLL partials; this is the
    exact twin)."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count_distinct("user_id").alias("users"))
        .select(ts_str(F.col("w.start")).alias("wstart"), "users")
        .orderBy("wstart")
    )


def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-lifespan survival curve S(t): the fraction of users still
    active ≥ t days after their first event (lifespan = last−first
    event day). Per-user reduction first (the cardinality drop every
    behavior query leads with), then the day grid 0..max joins the
    lifespan histogram by a suffix cumulative sum — generated
    dimension + tiny global window, never a window over facts.
    Survival fractions are integer-count ratios: engine-exact."""
    e = T(spark, sf_dir, "events")
    spans = e.groupBy("user_id").agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))).alias("life_d")
    )
    hist = spans.groupBy("life_d").agg(F.count(F.lit(1)).alias("cnt"))
    bounds = hist.agg(
        F.max("life_d").alias("mx"), F.sum("cnt").cast("double").alias("n")
    )
    grid = bounds.select(
        F.explode(F.sequence(F.lit(0), F.col("mx"))).alias("t"), "n"
    )
    joined = grid.join(hist, grid.t == hist.life_d, "left").select(
        "t", "n", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    # BOUNDED global window: input is the day grid 0..max-lifetime —
    # a few thousand rows regardless of data scale (days, not users) —
    # so the single-partition sort is metadata-sized by construction.
    w = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        joined.select(
            "t",
            (F.sum("cnt").over(w) / F.col("n")).alias("s_raw"),
        )
        .select("t", F.round("s_raw", 6).alias("surviving_frac"))
        .orderBy("t")
    )


def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive same-event-type runs per user via
    the row_number-difference trick (global seq − per-type seq is
    constant within an island, both over ONE user_id shuffle that the
    grouping then reuses). Output: per event_type, number of runs, the
    longest run, and mean run length — the repetition texture of a
    behavioral stream. Mean = sum/count-derived, floor-recipe rounded
    (integer ratios can land on exact halves)."""
    e = T(spark, sf_dir, "events")
    worder = [F.col("ts").asc(), F.col("event_id").asc()]
    w_all = Window.partitionBy("user_id").orderBy(*worder)
    w_type = Window.partitionBy("user_id", "event_type").orderBy(*worder)
    islands = e.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("isl"),
    )
    runs = islands.groupBy("user_id", "event_type", "isl").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.max("run_len").alias("longest"),
            (
                F.floor(
                    (F.sum("run_len") / F.count(F.lit(1))) * 10000 + F.lit(0.5)
                )
                / 10000
            ).alias("mean_len"),
        )
        .orderBy("event_type")
    )


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over user behavior baskets: support,
    confidence, and lift for every ordered event-type pair (a→b) —
    does doing a make doing b more likely than chance. Baskets reduce
    to one distinct (user, type) table; the pair join is
    vocabulary-sized (25 cells for 5 types), so the only fact-sized
    work is the distinct. All ratios are integer-count quotients:
    engine-exact."""
    e = T(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    n_df = ut.agg(F.count_distinct("user_id").cast("double").alias("n"))
    singles = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    a = ut.select("user_id", F.col("event_type").alias("ta"))
    b = ut.select("user_id", F.col("event_type").alias("tb"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("ta") != F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = singles.select(F.col("event_type").alias("ta"), F.col("cnt").alias("ca"))
    sb = singles.select(F.col("event_type").alias("tb"), F.col("cnt").alias("cb"))
    n = F.col("n")
    # floor(x*10^6 + 0.5) recipe, not round(): integer-count quotients
    # can land exactly on a halfway digit, where HALF_UP vs banker's
    # rounding diverges across engines (NOTES.md rule 5 / ADVICE r1).
    flr6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return (
        pairs.join(F.broadcast(sa), "ta")
        .join(F.broadcast(sb), "tb")
        .crossJoin(F.broadcast(n_df))
        .select(
            "ta",
            "tb",
            "n_both",
            flr6(F.col("n_both") / n).alias("support"),
            flr6(F.col("n_both") / F.col("ca").cast("double")).alias("confidence"),
            flr6(
                (F.col("n_both") * n)
                / (F.col("ca").cast("double") * F.col("cb").cast("double"))
            ).alias("lift"),
        )
        .orderBy("ta", "tb")
    )


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level quality stats: sessionize (30-min gap, same
    construction as q_sessionize), assign session ids by a running sum
    of the start flags, reduce each session to (events, duration),
    then the product-analytics headline numbers: session count, bounce
    rate (single-event sessions), mean events/session, total engaged
    seconds. Two window passes and both aggregations reuse the one
    user_id shuffle. Counts and µs-integer durations keep every ratio
    engine-exact (floor-recipe on the two means)."""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    wrun = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = e.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.sum(new_sess).over(wrun).alias("sid"),
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_ev"),
        ((F.max("us") - F.min("us")) / F.lit(1e6)).alias("dur_s"),
    )
    flr = lambda c, n: F.floor(c * F.lit(10.0**n) + F.lit(0.5)) / F.lit(10.0**n)  # noqa: E731
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n_ev") == 1).cast("long")).alias("bounces"),
        flr(F.sum((F.col("n_ev") == 1).cast("long")) / F.count(F.lit(1)), 6).alias("bounce_rate"),
        flr(F.sum("n_ev") / F.count(F.lit(1)), 4).alias("mean_events"),
        flr(F.sum("dur_s"), 2).alias("engaged_s"),
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary), the classic
    customer-value grid: per customer, days since last order (vs the
    dataset's max date), order count, and total spend — each cut into
    quartiles by `distributed_ntile` (three range-repartition rank
    passes over the per-customer aggregate, never a single-partition
    window), then reduced to the segment grid. Quartile edges are
    total-ordered with custkey tiebreaks, so the 64-cell grid is
    bit-identical to DuckDB's ntile(4) oracle."""
    o = T(spark, sf_dir, "orders")
    maxd = o.agg(F.max(F.to_date("o_orderdate")).alias("_maxd"))
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count(F.lit(1)).alias("freq"),
            F.sum("o_totalprice").alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "o_custkey",
            F.datediff("_maxd", "last_order").alias("recency"),
            "freq",
            "monetary",
        )
    )
    r = distributed_ntile(
        per, 4, [F.col("recency").asc(), F.col("o_custkey")], tile_col="r_q"
    )
    f = distributed_ntile(
        r, 4, [F.col("freq").desc(), F.col("o_custkey")], tile_col="f_q"
    )
    m = distributed_ntile(
        f, 4, [F.col("monetary").desc(), F.col("o_custkey")], tile_col="m_q"
    )
    # floor(x*100+0.5) halfway-rounding recipe on both sides (NOTES
    # rule 5): round() halfway semantics differ between engines.
    flr = lambda c, n: F.floor(c * F.lit(10.0**n) + F.lit(0.5)) / F.lit(10.0**n)  # noqa: E731
    return (
        m.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            flr(F.sum("monetary"), 2).alias("segment_value"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


def q_trajectory_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k behaviorally-similar users by EDIT DISTANCE over their
    full event-type trajectories (the sequence-similarity shape of
    REPOSE/trajectory top-k search, collapsed to 1-D event symbols):
    each user's history becomes a symbol string (first letter of the
    event type — distinct across the fixture's five types, and any
    collision would only merge symbols identically in both engines),
    query users broadcast against the corpus, JVM-side levenshtein,
    window top-5 with (distance, user) tiebreak.

    Scale shape: the per-user sequence is a bounded collect_list (same
    contract as ewma_value — cap the window upstream for power users);
    the pair generation broadcasts the QUERY side only, so the corpus
    never shuffles; at web scale the pre-filter is shingle-LSH over
    the same strings (operators/dedup.py machinery)."""
    e = T(spark, sf_dir, "events")
    seqs = e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: F.substring(s["event_type"], 1, 1),
            ),
            "",
        ).alias("seq")
    )
    q = seqs.filter(F.col("user_id") < 5).select(
        F.col("user_id").alias("query_user"), F.col("seq").alias("qseq")
    )
    c = seqs.filter(F.col("user_id") >= 5).select(
        F.col("user_id").alias("neighbor_user"), F.col("seq").alias("cseq")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_user",
        "neighbor_user",
        F.levenshtein("qseq", "cseq").alias("dist"),
    )
    w = Window.partitionBy("query_user").orderBy(
        F.asc("dist"), F.asc("neighbor_user")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_user", "neighbor_user", "dist", "rank")
    )


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution with time decay: every
    view/click in the 7 days BEFORE a purchase shares that purchase's
    credit, weighted 2^-age_days and normalized per purchase — the
    marketing staple between last-touch (asof_join) and algorithmic
    attribution. Weights are exact binary fractions (powers of two
    with small exponents), so the per-purchase weight total and each
    share are bit-identical across engines; only the final per-type
    credit sum is rounded. Join is per-user purchases×touches —
    bounded by the per-user event count; the range-join operator is
    the scale path when touch windows explode."""
    e = T(spark, sf_dir, "events")
    pur = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    tou = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("ts").alias("tts"), F.col("event_type").alias("touch_type")
    )
    j = tou.join(pur, "user_id").filter(
        (F.col("tts") < F.col("pts"))
        & (F.datediff(F.to_date("pts"), F.to_date("tts")) <= 7)
    )
    w = F.pow(F.lit(2.0), -F.datediff(F.to_date("pts"), F.to_date("tts")))
    wsum = Window.partitionBy("pid")
    shared = j.select(
        "touch_type", "pid", (w / F.sum(w).over(wsum)).alias("share")
    )
    flr4 = lambda c: F.floor(c * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)  # noqa: E731
    return (
        shared.groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            flr4(F.sum("share")).alias("credited_conversions"),
        )
        .orderBy("touch_type")
    )


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: P(next = b | current = a) from lead() pairs — the
    behavioral-model fit (and the next-event-prediction baseline every
    fancier sequence model must beat). One lead window on the user_id
    shuffle, one pair aggregation; probabilities are integer-count
    ratios (engine-exact), floor-recipe rounded."""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wtot = Window.partitionBy("cur")
    flr = lambda c, n: F.floor(c * F.lit(10.0**n) + F.lit(0.5)) / F.lit(10.0**n)  # noqa: E731
    return (
        pairs.withColumn("row_total", F.sum("cnt").over(wtot))
        .select(
            "cur",
            "nxt",
            "cnt",
            flr(F.col("cnt") / F.col("row_total").cast("double"), 6).alias("p"),
        )
        .orderBy("cur", "nxt")
    )


def q_abandoned_carts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks NOT followed by a purchase within 30 minutes — the
    temporal NOT-EXISTS complement of the stream_join funnel: a
    left-anti join whose condition is an equi-key PLUS a time-range
    conjunct. Catalyst keeps the user_id equi-part as the shuffle key
    and evaluates the range residually, so abandonment detection costs
    one co-partitioned join, no per-event window scan. Per-user
    abandonment summary of the top-15 most-abandoning users."""
    e = T(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    cond = (
        (clicks.user_id == buys.b_user)
        & (buys.b_ts > clicks.c_ts)
        & (buys.b_ts <= clicks.c_ts + F.expr("INTERVAL 30 MINUTES"))
    )
    abandoned = clicks.join(buys, cond, "left_anti")
    per_user = abandoned.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_abandoned")
    )
    return per_user.orderBy(F.desc("n_abandoned"), F.asc("user_id")).limit(15)


def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence: the distribution of day gaps between a
    customer's consecutive orders — lag over (customer, date) then a
    bounded gap histogram (7-day buckets, capped at 10). The
    repeat-purchase rhythm metric behind replenishment and churn
    models; one shuffle on the customer key, everything else
    map-side."""
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.to_date("o_orderdate"), "o_orderkey"
    )
    gaps = (
        o.select(
            "o_custkey",
            F.datediff(
                F.to_date("o_orderdate"),
                F.lag(F.to_date("o_orderdate"), 1).over(w),
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    bucket = F.least(F.floor(F.col("gap_days") / 7), F.lit(10)).cast("int")
    return (
        gaps.select(bucket.alias("gap_weeks"), "gap_days")
        .groupBy("gap_weeks")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_days").alias("min_days"),
            F.max("gap_days").alias("max_days"),
        )
        .orderBy("gap_weeks")
    )


def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per purchase, the latency from
    the NEAREST preceding click of the same user inside the 30-min
    attribution window (max(c_ts) per purchase — last-touch), then
    exact interpolated p50/p90 of the latency per purchase hour-of-day
    — the funnel-latency report product teams act on.

    Scale shape: one user-keyed shuffle for the pair join (same as
    stream_join), one hash agg per purchase, and the percentile pass
    rides exact_percentiles_ranked — weighted order statistics over
    the per-hour distinct-latency histogram, no buffer-the-group
    percentile() aggregate. Latencies are integer-µs differences, so
    every double is engine-exact; the floor recipe guards the µs-grid
    interpolation midpoints round() would split on."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        exact_percentiles_ranked,
    )

    e = T(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    pairs = purch.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 minutes")),
    )
    last_click = pairs.groupBy("event_id", "p_ts").agg(
        F.max("c_ts").alias("c_last")
    )
    lat = last_click.select(
        F.hour("p_ts").alias("hr"),
        (
            (F.unix_micros("p_ts") - F.unix_micros("c_last"))
            / F.lit(1000000.0)
        ).alias("latency_s"),
    )
    pct = exact_percentiles_ranked(
        lat, ["hr"], "latency_s", {"p50": 0.5, "p90": 0.9}
    )
    cnt = lat.groupBy("hr").agg(F.count(F.lit(1)).alias("n_conversions"))
    flr6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return (
        cnt.join(pct, "hr")
        .select(
            F.col("hr").cast("int").alias("hr"),
            "n_conversions",
            flr6(F.col("p50")).alias("p50_s"),
            flr6(F.col("p90")).alias("p90_s"),
        )
        .orderBy("hr")
    )


QUERIES = {
    "conversion_latency": q_conversion_latency,
    "abandoned_carts": q_abandoned_carts,
    "order_gaps": q_order_gaps,
    "markov_transitions": q_markov_transitions,
    "trajectory_similarity": q_trajectory_similarity,
    "rfm_segments": q_rfm_segments,
    "attribution": q_attribution,
    "session_stats": q_session_stats,
    "basket_lift": q_basket_lift,
    "streaks": q_streaks,
    "survival_curve": q_survival_curve,
    "ewma_value": q_ewma_value,
    "twap": q_twap,
    "ohlc_bars": q_ohlc_bars,
    "rolling_median": q_rolling_median,
    "sliding_distinct": q_sliding_distinct,
    "cohort_retention": q_cohort_retention,
    "zscore_anomaly": q_zscore_anomaly,
    "customer_deciles": q_customer_deciles,
    "scd2_history": q_scd2_history,
    "funnel_strict": q_funnel_strict,
}

_LAT_PCT = exact_pct_sql(
    "lat", ["hr"], "latency_s", {"p50": 0.5, "p90": 0.9}
)

ORACLES = {
    "conversion_latency": f"""
        WITH clicks AS (
            SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'
        ),
        purch AS (
            SELECT event_id, user_id, ts AS p_ts FROM events
            WHERE event_type = 'purchase'
        ),
        last_click AS (
            SELECT p.event_id, p.p_ts, max(c.c_ts) AS c_last
            FROM purch p JOIN clicks c
              ON c.user_id = p.user_id
             AND c.c_ts < p.p_ts
             AND p.p_ts <= c.c_ts + INTERVAL 30 MINUTE
            GROUP BY p.event_id, p.p_ts
        ),
        lat AS (
            SELECT hour(p_ts) AS hr,
                   (epoch_us(p_ts) - epoch_us(c_last)) / 1000000.0e0
                       AS latency_s
            FROM last_click
        ),
        pct AS ({_LAT_PCT}),
        cnt AS (SELECT hr, CAST(count(*) AS BIGINT) AS n_conversions
                FROM lat GROUP BY hr)
        SELECT CAST(cnt.hr AS INTEGER) AS hr, n_conversions,
               floor(p50 * 1000000 + 0.5e0) / 1000000 AS p50_s,
               floor(p90 * 1000000 + 0.5e0) / 1000000 AS p90_s
        FROM cnt JOIN pct USING (hr) ORDER BY hr
    """,

    "abandoned_carts": """
        WITH clicks AS (
            SELECT user_id, ts AS c_ts, event_id AS c_id
            FROM events WHERE event_type = 'click'
        ),
        abandoned AS (
            SELECT c.user_id FROM clicks c
            WHERE NOT EXISTS (
                SELECT 1 FROM events b
                WHERE b.event_type = 'purchase'
                  AND b.user_id = c.user_id
                  AND b.ts > c.c_ts
                  AND b.ts <= c.c_ts + INTERVAL 30 MINUTE
            )
        )
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_abandoned
        FROM abandoned GROUP BY user_id
        ORDER BY n_abandoned DESC, user_id ASC LIMIT 15
    """,
    "order_gaps": """
        WITH g AS (
            SELECT o_custkey,
                   datediff('day',
                            lag(CAST(o_orderdate AS DATE), 1) OVER (
                                PARTITION BY o_custkey
                                ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
                            CAST(o_orderdate AS DATE)) AS gap_days
            FROM orders
        )
        SELECT CAST(least(gap_days // 7, 10) AS INTEGER) AS gap_weeks,
               CAST(count(*) AS BIGINT) AS n_gaps,
               CAST(min(gap_days) AS INTEGER) AS min_days,
               CAST(max(gap_days) AS INTEGER) AS max_days
        FROM g WHERE gap_days IS NOT NULL
        GROUP BY gap_weeks ORDER BY gap_weeks
    """,
    "attribution": """
        WITH pur AS (
            SELECT user_id, ts AS pts, event_id AS pid
            FROM events WHERE event_type = 'purchase'
        ),
        tou AS (
            SELECT user_id, ts AS tts, event_type AS touch_type
            FROM events WHERE event_type IN ('view', 'click')
        ),
        j AS (
            SELECT t.touch_type, p.pid,
                   pow(2.0, -datediff('day', CAST(t.tts AS DATE),
                                      CAST(p.pts AS DATE))) AS w
            FROM tou t JOIN pur p USING (user_id)
            WHERE t.tts < p.pts
              AND datediff('day', CAST(t.tts AS DATE), CAST(p.pts AS DATE)) <= 7
        ),
        shared AS (
            SELECT touch_type, pid,
                   w / sum(w) OVER (PARTITION BY pid) AS share
            FROM j
        )
        SELECT touch_type,
               CAST(count(*) AS BIGINT) AS n_touches,
               floor(sum(share) * 10000 + 0.5e0) / 10000 AS credited_conversions
        FROM shared GROUP BY touch_type ORDER BY touch_type
    """,
    "rfm_segments": """
        WITH maxd AS (SELECT max(CAST(o_orderdate AS DATE)) AS md FROM orders),
        per AS (
            SELECT o_custkey,
                   datediff('day', max(CAST(o_orderdate AS DATE)),
                            (SELECT md FROM maxd)) AS recency,
                   CAST(count(*) AS BIGINT) AS freq,
                   sum(o_totalprice) AS monetary
            FROM orders GROUP BY o_custkey
        ),
        tiled AS (
            SELECT o_custkey, monetary,
                   ntile(4) OVER (ORDER BY recency ASC, o_custkey) AS r_q,
                   ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS f_q,
                   ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_q
            FROM per
        )
        SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
               CAST(m_q AS BIGINT) AS m_q,
               CAST(count(*) AS BIGINT) AS n_customers,
               floor(sum(monetary) * 100 + 0.5e0) / 100 AS segment_value
        FROM tiled GROUP BY r_q, f_q, m_q ORDER BY r_q, f_q, m_q
    """,
    "trajectory_similarity": """
        WITH seqs AS (
            SELECT user_id,
                   string_agg(substring(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS seq
            FROM events GROUP BY user_id
        ),
        scored AS (
            SELECT q.user_id AS query_user, c.user_id AS neighbor_user,
                   CAST(levenshtein(q.seq, c.seq) AS INTEGER) AS dist
            FROM seqs q JOIN seqs c
              ON q.user_id < 5 AND c.user_id >= 5
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY query_user
                       ORDER BY dist, neighbor_user) AS rank
            FROM scored
        )
        SELECT query_user, neighbor_user, dist, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5
    """,
    "markov_transitions": """
        WITH pairs AS (
            SELECT event_type AS cur,
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS nxt
            FROM events
        ),
        counts AS (
            SELECT cur, nxt, CAST(count(*) AS BIGINT) AS cnt
            FROM pairs WHERE nxt IS NOT NULL GROUP BY cur, nxt
        )
        SELECT cur, nxt, cnt,
               floor(cnt / CAST(sum(cnt) OVER (PARTITION BY cur) AS DOUBLE)
                     * 1000000 + 0.5e0) / 1000000 AS p
        FROM counts ORDER BY cur, nxt
    """,
    "session_stats": """
        WITH flags AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            -- ORDER BY (us, event_id) mirrors the Spark side's
            -- (ts, event_id) ordering: with `us` alone, two events on
            -- the same microsecond would make session assignment
            -- nondeterministic across engines (ADVICE r1).
            SELECT user_id, us,
                   sum(new_sess) OVER (PARTITION BY user_id
                       ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM flags
        ),
        per_session AS (
            SELECT user_id, sid,
                   CAST(count(*) AS BIGINT) AS n_ev,
                   (max(us) - min(us)) / 1e6 AS dur_s
            FROM sess GROUP BY user_id, sid
        )
        SELECT CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounces,
               floor(CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*) * 1000000 + 0.5e0) / 1000000 AS bounce_rate,
               floor(CAST(sum(n_ev) AS DOUBLE) / count(*) * 10000 + 0.5e0) / 10000 AS mean_events,
               floor(sum(dur_s) * 100 + 0.5e0) / 100 AS engaged_s
        FROM per_session
    """,
    "basket_lift": """
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        n AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS n FROM ut),
        singles AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
                    FROM ut GROUP BY event_type),
        pairs AS (
            SELECT a.event_type AS ta, b.event_type AS tb,
                   CAST(count(*) AS BIGINT) AS n_both
            FROM ut a JOIN ut b USING (user_id)
            WHERE a.event_type <> b.event_type
            GROUP BY ta, tb
        )
        SELECT ta, tb, n_both,
               floor(n_both / n.n * 1000000 + 0.5e0) / 1000000 AS support,
               floor(n_both / CAST(sa.cnt AS DOUBLE) * 1000000 + 0.5e0) / 1000000 AS confidence,
               floor((n_both * n.n) / (CAST(sa.cnt AS DOUBLE) * CAST(sb.cnt AS DOUBLE))
                     * 1000000 + 0.5e0) / 1000000 AS lift
        FROM pairs
        JOIN singles sa ON sa.event_type = ta
        JOIN singles sb ON sb.event_type = tb
        CROSS JOIN n
        ORDER BY ta, tb
    """,
    "streaks": """
        WITH islands AS (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   - row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id) AS isl
            FROM events
        ),
        runs AS (
            SELECT user_id, event_type, isl,
                   CAST(count(*) AS BIGINT) AS run_len
            FROM islands GROUP BY user_id, event_type, isl
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_runs,
               max(run_len) AS longest,
               floor((CAST(sum(run_len) AS DOUBLE) / count(*)) * 10000 + 0.5e0)
                   / 10000 AS mean_len
        FROM runs GROUP BY event_type ORDER BY event_type
    """,
    "survival_curve": """
        WITH spans AS (
            SELECT user_id,
                   date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) AS life_d
            FROM events GROUP BY user_id
        ),
        hist AS (SELECT life_d, CAST(count(*) AS BIGINT) AS cnt
                 FROM spans GROUP BY life_d),
        bounds AS (SELECT max(life_d) AS mx, CAST(sum(cnt) AS DOUBLE) AS n FROM hist),
        grid AS (SELECT unnest(range(0, mx + 1)) AS t, n FROM bounds),
        joined AS (
            SELECT t, n, coalesce(cnt, 0) AS cnt
            FROM grid LEFT JOIN hist ON grid.t = hist.life_d
        )
        SELECT CAST(t AS BIGINT) AS t,
               round(sum(cnt) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / n, 6)
                   AS surviving_frac
        FROM joined ORDER BY t
    """,
    "rolling_median": """
        SELECT event_id, user_id,
               floor(median(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
               ) * 100 + 0.5e0) / 100 AS med5
        FROM events ORDER BY event_id
    """,
    "sliding_distinct": """
        WITH ev AS (SELECT date_trunc('hour', ts) AS h, user_id FROM events),
        assign AS (
            SELECT h AS ws, user_id FROM ev
            UNION ALL
            SELECT h - INTERVAL 1 HOUR, user_id FROM ev
        )
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS wstart,
               CAST(count(DISTINCT user_id) AS BIGINT) AS users
        FROM assign GROUP BY ws ORDER BY wstart
    """,
    "twap": """
        WITH timed AS (
            SELECT user_id, value,
                   (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id))
                    - epoch_us(ts)) / 1e6 AS dur_s
            FROM events
        ),
        agg AS (
            SELECT user_id,
                   floor(sum(value * dur_s) * 100 + 0.5e0) / 100 AS vs,
                   floor(sum(dur_s) * 100 + 0.5e0) / 100 AS span_s,
                   CAST(count(*) AS BIGINT) AS n_holds
            FROM timed WHERE dur_s IS NOT NULL
            GROUP BY user_id
        )
        SELECT user_id, vs, span_s, n_holds,
               floor(vs / span_s * 1000000 + 0.5e0) / 1000000 AS twap
        FROM agg ORDER BY user_id
    """,
    "ohlc_bars": """
        SELECT event_type,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bar,
               arg_min(value, epoch_us(ts)) AS "open",
               max(value) AS high,
               min(value) AS low,
               arg_max(value, epoch_us(ts)) AS "close",
               CAST(count(*) AS BIGINT) AS n_ticks
        FROM events
        GROUP BY event_type, bar
        ORDER BY event_type, bar
    """,
    "ewma_value": """
        SELECT user_id,
               CAST(len(list(value ORDER BY ts, event_id)) AS BIGINT) AS n_events,
               round(list_reduce(list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
                     (acc, x) -> 0.3e0 * x + 0.7e0 * acc), 6) AS ewma_value
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "cohort_retention": """
        WITH first AS (
            SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
        )
        SELECT CAST(floor(date_diff('day', DATE '2024-01-01',
                                    CAST(first_ts AS DATE)) / 7e0) AS INTEGER)
                   AS cohort_week,
               CAST(floor(date_diff('day', CAST(first_ts AS DATE),
                                    CAST(ts AS DATE)) / 7e0) AS INTEGER)
                   AS week_offset,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
        FROM events e JOIN first f ON e.user_id = f.user_id
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "zscore_anomaly": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, sum(value) AS v
            FROM events GROUP BY 1, 2
        ),
        stats AS (
            SELECT event_type, avg(v) AS mu, stddev_samp(v) AS sd
            FROM daily GROUP BY 1
        )
        SELECT d.event_type,
               strftime(day, '%Y-%m-%d') AS day,
               round(v, 2) AS day_value,
               round((v - mu) / sd, 3) AS zscore
        FROM daily d JOIN stats s ON d.event_type = s.event_type
        WHERE abs((v - mu) / sd) > 2
        ORDER BY 1, 2
    """,
    "customer_deciles": """
        WITH spend AS (
            SELECT o_custkey, sum(o_totalprice) AS spend
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT spend,
                   ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
            FROM spend
        )
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_customers,
               round(sum(spend), 2) AS decile_spend
        FROM ranked GROUP BY decile ORDER BY decile
    """,
    "scd2_history": """
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        ),
        runs AS (
            SELECT user_id, event_type, ts, event_id
            FROM ordered WHERE prev IS NULL OR prev <> event_type
        ),
        v AS (
            SELECT user_id, event_type AS state, ts AS vf,
                   lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS vt
            FROM runs
        )
        SELECT user_id, state,
               strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
               strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
               CASE WHEN vt IS NULL THEN 1 ELSE 0 END AS is_current
        FROM v ORDER BY user_id, valid_from
    """,
    "funnel_strict": """
        WITH v AS (
            SELECT user_id, min(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE event_type = 'click' AND ts > t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(ts) AS t_buy
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE event_type = 'purchase' AND ts > t_click
            GROUP BY e.user_id
        )
        SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS users FROM v
        UNION ALL
        SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
        UNION ALL
        SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p
        ORDER BY stage
    """,
}
