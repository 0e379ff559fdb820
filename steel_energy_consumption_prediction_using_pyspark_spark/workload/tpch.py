"""TPC-H-shape analytical queries over the driver fixtures.

The reference itself performs zero joins (SURVEY.md §2.3) — this module
is the engine's required join/aggregation surface, exercised through
the classic TPC-H query *shapes* (Q2, Q4, Q6, Q7, Q8, Q9, Q11, Q12,
Q13, Q14, Q15, Q16, Q19, Q20, Q21, Q22 — with Q1/Q3/Q5/Q10 in
workload/core.py and the Q17/Q18 correlated shapes in the
correlated-subquery family, this completes all 22 classic shapes),
adapted to the fixture schema (no partsupp / shipmode / commitdate
columns — each adaptation keeps the query's structural challenge:
join ordering, conditional aggregation, disjunctive pushdown,
correlated multi-EXISTS, anti-join + scalar subquery).

Scale notes (100 TB design):
- dimension tables (region, nation, supplier, part at fixture ratios)
  are broadcast — no shuffle of the fact side for star joins;
- fact-fact joins (lineitem ⋈ orders) shuffle on the join key once and
  AQE picks shuffled-hash vs sort-merge at runtime;
- every filter is expressed on base columns before the join so
  Catalyst pushes it into the parquet scan (PushedFilters);
- correlated EXISTS / NOT EXISTS rewrite to left-semi / left-anti
  joins (Catalyst RewritePredicateSubquery) — never a per-row probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T


def _bc(df: DataFrame) -> DataFrame:
    return F.broadcast(df)


# --- Q2 shape: min-cost supplier via correlated scalar min ------------------

def q_tpch_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp fixture: lineitem is the
    part↔supplier link). For every size-10 part, the supplier offering
    the minimum unit price, ties broken by smallest suppkey.

    Spark plan: filter part (pushed to scan) → broadcast join onto
    lineitem → one hash agg per (part, supp) → row_number argmin per
    part. The correlated `= (SELECT min ...)` of textbook Q2 is
    expressed as a single window pass — same result, one shuffle
    instead of a decorrelated self-join. The tiebreak orders by the
    UNROUNDED unit price (IEEE double division is bit-identical across
    engines; rounding first could flip halfway cases) then suppkey."""
    from pyspark.sql import Window

    part = _bc(T(spark, sf_dir, "part").filter(F.col("p_size") == 10))
    li = T(spark, sf_dir, "lineitem")
    unit = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("up_exact"))
    )
    w = Window.partitionBy("p_partkey").orderBy("up_exact", "l_suppkey")
    return (
        unit.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            F.col("l_suppkey").alias("best_supp"),
            # explicit floor(x*1e4 + 0.5)/1e4 instead of round(): the
            # raw unit-price doubles hit exact halfway points (price
            # cents / integer qty) where Spark's BigDecimal HALF_UP and
            # DuckDB's scaled-binary round disagree; this formula is
            # identical IEEE arithmetic on both engines.
            (F.floor(F.col("up_exact") * 10000 + 0.5) / 10000.0).alias("min_unit_price"),
        )
        .orderBy("p_partkey")
    )


# --- Q7 shape: nation-pair trade volume -------------------------------------

def q_tpch_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral shipping volume between two nations by year.
    supplier-nation and customer-nation resolved through two broadcast
    dim chains; the only big shuffle is lineitem ⋈ orders."""
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(_bc(supp), li.l_suppkey == supp.s_suppkey)
        .join(_bc(n1), supp.s_nationkey == n1.s_nk)
        .join(_bc(cust), orders.o_custkey == cust.c_custkey)
        .join(_bc(n2), cust.c_nationkey == n2.c_nk)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q8 shape: national market share ----------------------------------------

def q_tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_5's share of PROMO-part revenue sold to ASIA
    customers, by order year. Conditional aggregation (sum-of-CASE over
    sum) on top of a 6-relation star; all dims broadcast."""
    part = T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = T(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    )
    li = T(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(_bc(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(_bc(cust), orders.o_custkey == cust.c_custkey)
        .join(_bc(cn), cust.c_nationkey == cn.n_nationkey)
        .join(_bc(region), cn.n_regionkey == region.r_regionkey)
        .join(_bc(supp), li.l_suppkey == supp.s_suppkey)
        .join(_bc(sn), supp.s_nationkey == sn.s_nk)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
        .orderBy("o_year")
    )


# --- Q9 shape: product-line profit by nation and year -----------------------

def q_tpch_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (no ps_supplycost: cost modeled as 60% of retail price
    × quantity). LIKE filter on p_name ('%red%') pushed to the part
    scan; profit aggregated by supplier nation × ship year."""
    part = T(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = T(spark, sf_dir, "lineitem")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(_bc(part), li.l_partkey == part.p_partkey)
        .join(_bc(supp), li.l_suppkey == supp.s_suppkey)
        .join(_bc(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --- Q12 shape: late-shipment priority counts -------------------------------

def q_tpch_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (no shipmode: lateness bucket derived from
    ship-vs-order delay). Counts high- vs low-priority orders per
    bucket — conditional aggregation over one fact-fact join."""
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    bucket = F.when(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60, F.lit("late")
    ).otherwise(F.lit("ontime"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


# --- Q14 shape: promo revenue percentage ------------------------------------

def q_tpch_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of revenue from PROMO parts in one ship
    month. Single broadcast join + two-sided conditional sum → one row."""
    part = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(_bc(part), li.l_partkey == part.p_partkey).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
            / F.sum(vol),
            4,
        ).alias("promo_pct"),
        F.round(F.sum(vol), 2).alias("total_revenue"),
    )


# --- Q16 shape: supplier count by part attributes ---------------------------

def q_tpch_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (lineitem as the part↔supplier link). Distinct
    suppliers able to ship each (brand, size-bucket), excluding
    Brand#5 parts and negative-balance suppliers (the NOT IN
    subquery → broadcast anti-join)."""
    part = T(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#5").select(
        "p_partkey", "p_brand", (F.floor(F.col("p_size") / 10)).cast("int").alias("size_bucket")
    )
    bad_supp = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(_bc(part), li.l_partkey == part.p_partkey)
        .join(_bc(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "size_bucket")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "size_bucket")
    )


# --- Q19 shape: disjunctive predicate revenue -------------------------------

def q_tpch_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs across both join sides. Catalyst extracts
    the common l_partkey=p_partkey conjunct so the join stays an
    equi-join (broadcast), with the disjunction evaluated post-join;
    per-branch breakdown keeps the result verifiable."""
    part = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(_bc(part), li.l_partkey == part.p_partkey)
    b1 = (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11)
    b2 = (F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 20)
    b3 = (F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 30)
    branch = F.when(b1, "B1").when(b2, "B2").when(b3, "B3")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.filter(b1 | b2 | b3)
        .groupBy(branch.alias("branch"))
        .agg(
            F.round(F.sum(vol), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("branch")
    )


# --- Q21 shape: suppliers who shipped last in multi-supplier orders ---------

def q_tpch_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (shipdate stands in for receipt-vs-commit lateness):
    for finished orders touched by ≥2 suppliers, count per supplier the
    orders where that supplier was the strictly-latest shipper.

    Textbook Q21 is EXISTS(other supplier) AND NOT EXISTS(other
    supplier shipped later); both correlated subqueries decorrelate to
    one window pass over (orderkey): max shipdate over the order and
    max shipdate over the other suppliers — one shuffle instead of two
    self-joins."""
    from pyspark.sql import Window

    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    li = li.join(orders, li.l_orderkey == orders.o_orderkey)
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("l_shipdate").alias("supp_last"))
    w = Window.partitionBy("l_orderkey")
    enriched = per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w)).withColumn(
        "order_last", F.max("supp_last").over(w)
    ).withColumn(
        # how many suppliers attained the order's max shipdate: the
        # "strictly latest" test needs it to be exactly one.
        "n_at_max", F.sum(F.when(F.col("supp_last") == F.col("order_last"), 1).otherwise(0)).over(w)
    )
    sole_latest = enriched.filter(
        (F.col("n_supp") >= 2)
        & (F.col("supp_last") == F.col("order_last"))
        & (F.col("n_at_max") == 1)
    )
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_latest.join(_bc(supp), sole_latest.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


# --- Q22 shape: idle high-balance customers ---------------------------------

def q_tpch_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: customers with above-average positive balance and no
    orders after 1999 — uncorrelated scalar AVG subquery + left-anti
    join onto orders, grouped by nation."""
    cust = T(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    recent = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1999-01-01").select(
        "o_custkey"
    )
    rich = cust.join(_bc(avg_bal)).filter(F.col("c_acctbal") > F.col("ab"))
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --- Q4 shape: order-priority checking ---------------------------------------

def q_tpch_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (no commitdate/receiptdate: "late" means a lineitem
    shipped >30 days after the order date). Orders placed in 1997-Q1
    with at least one late lineitem, counted per priority.

    The correlated EXISTS becomes a LEFT SEMI join whose condition has
    an equi conjunct (orderkey) plus a non-equi residual (the 30-day
    lateness test) — Catalyst hashes on the equi part and evaluates the
    residual post-probe, so each order is emitted at most once with no
    distinct pass."""
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- Q6 shape: forecast revenue change ---------------------------------------

def q_tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-side query — discount revenue lost in 1997
    for mid-discount small-quantity lines. Zero joins; every predicate
    references a scan column so all three land in the parquet
    PushedFilters, and only 4 of 11 lineitem columns are read
    (ReadSchema pruning). The cheapest query in the suite by design —
    its job is to prove the scan path is optimal."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --- Q11 shape: important stock identification -------------------------------

def q_tpch_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (no partsupp: "stock value" is the revenue shipped by
    NATION_3 suppliers per part). Parts whose value exceeds 2.5× the
    average per-part value — the HAVING-vs-scalar-subquery shape.
    Textbook Q11 thresholds on a fraction of the TOTAL, which it must
    rescale by 1/SF to stay non-empty; an avg-relative threshold keeps
    the selectivity constant across scale factors with no tuning knob.

    The grouped intermediate feeds BOTH the output and the threshold
    scalar, so it is persisted: one pass over the fact table, and the
    second consumer reads the (part-sized, orders-of-magnitude smaller)
    cache. Without the explicit barrier AQE only de-duplicates the
    exchange at runtime stage-materialization — the persist makes the
    single-fact-scan property hold by construction and testable from
    the static plan."""
    supp_n3 = (
        T(spark, sf_dir, "supplier")
        .join(
            _bc(T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    value = (
        li.join(_bc(supp_n3), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("val"))
        .persist()
    )
    threshold = value.agg((F.avg("val") * F.lit(2.5)).alias("thr"))
    return (
        value.join(_bc(threshold))
        .filter(F.col("val") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("val"), 2).alias("stock_value"),
        )
        .orderBy(F.col("stock_value").desc(), "p_partkey")
    )


# --- Q13 shape: customer order-count distribution ----------------------------

def q_tpch_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed how many orders (urgent
    orders excluded), zero-order customers included. The filter lives
    in the LEFT JOIN condition — pushing it to a WHERE would silently
    drop the zero-order customers, the classic outer-join trap. Two
    cascaded aggregations; the first groups on the (already shuffled)
    customer key."""
    cust = T(spark, sf_dir, "customer").select("c_custkey")
    orders = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    co = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        co.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --- Q15 shape: top supplier by quarterly revenue ----------------------------

def q_tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) whose 1997-Q1 revenue equals the
    maximum — the textbook CREATE VIEW + scalar MAX subquery. The max
    is taken with a global window over the ONE computed rev frame,
    not a second aggregation of the subtree: a double sum re-evaluated
    twice (Spark re-executes shared subtrees per consumer; shuffle
    fetch order is a network race) can differ in the last ulp, and
    the equality then matches zero rows — observed as a flaky sf1
    oracle before DuckDB's twin was MATERIALIZED for the same reason.
    The window input is the per-supplier rev table (dim-sized,
    bounded), not the fact table."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    from pyspark.sql import Window

    mx = F.max("total_rev").over(Window.partitionBy())
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.withColumn("mx", mx)
        .filter(F.col("total_rev") == F.col("mx"))
        .join(_bc(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total_rev", 2).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# --- Q20 shape: heavy shippers of promotable parts ---------------------------

def q_tpch_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (no ps_availqty: "excess stock" means >60 units of a
    red part shipped during 1997 by one supplier). The nested
    IN-subqueries of textbook Q20 become a broadcast LEFT SEMI against
    the filtered part keys, a grouped HAVING on (supplier, part), and a
    final per-supplier count — three cascaded reductions, only one
    fact-side shuffle (the groupBy key (l_suppkey, l_partkey) is
    reused by the second agg since l_suppkey is its prefix)."""
    red = T(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    heavy = (
        li.join(_bc(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 60)
    )
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        heavy.groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("n_heavy_parts"))
        .join(_bc(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "n_heavy_parts")
        .orderBy("s_suppkey")
    )


QUERIES = {
    "tpch_min_cost": q_tpch_min_cost,
    "tpch_volume": q_tpch_volume,
    "tpch_market_share": q_tpch_market_share,
    "tpch_profit": q_tpch_profit,
    "tpch_late_priority": q_tpch_late_priority,
    "tpch_promo_revenue": q_tpch_promo_revenue,
    "tpch_supplier_cnt": q_tpch_supplier_cnt,
    "tpch_disjunctive": q_tpch_disjunctive,
    "tpch_waiting": q_tpch_waiting,
    "tpch_idle_balance": q_tpch_idle_balance,
    "tpch_order_priority": q_tpch_order_priority,
    "tpch_forecast_revenue": q_tpch_forecast_revenue,
    "tpch_important_stock": q_tpch_important_stock,
    "tpch_cust_distribution": q_tpch_cust_distribution,
    "tpch_top_supplier": q_tpch_top_supplier,
    "tpch_promo_suppliers": q_tpch_promo_suppliers,
}

ORACLES = {
    "tpch_min_cost": """
        WITH unit AS (
            SELECT p_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS up_exact
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_size = 10
            GROUP BY p_partkey, l_suppkey
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY p_partkey
                       ORDER BY up_exact, l_suppkey) AS rn
            FROM unit
        )
        SELECT p_partkey, l_suppkey AS best_supp,
               floor(up_exact * 10000 + 0.5) / 10000e0 AS min_unit_price
        FROM ranked WHERE rn = 1 ORDER BY p_partkey
    """,
    "tpch_volume": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "tpch_market_share": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               round(sum(CASE WHEN n1.n_name = 'NATION_5'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0e0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_volume
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE p_type = 'PROMO' AND r_name = 'ASIA'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                              AND TIMESTAMP '1997-12-31'
        GROUP BY 1 ORDER BY 1
    """,
    "tpch_profit": """
        SELECT n_name AS nation,
               CAST(year(l_shipdate) AS INTEGER) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - 0.6e0 * p_retailprice * l_quantity), 2) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
    "tpch_late_priority": """
        SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
                    THEN 'late' ELSE 'ontime' END AS ship_bucket,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1
    """,
    "tpch_promo_revenue": """
        SELECT round(100e0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0e0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
    "tpch_supplier_cnt": """
        SELECT p_brand,
               CAST(floor(p_size / 10e0) AS INTEGER) AS size_bucket,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, size_bucket
    """,
    "tpch_disjunctive": """
        WITH j AS (
            SELECT CASE
                     WHEN p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                          AND l_quantity BETWEEN 1 AND 11 THEN 'B1'
                     WHEN p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                          AND l_quantity BETWEEN 10 AND 20 THEN 'B2'
                     WHEN p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                          AND l_quantity BETWEEN 20 AND 30 THEN 'B3'
                   END AS branch,
                   l_extendedprice * (1 - l_discount) AS vol
            FROM lineitem JOIN part ON l_partkey = p_partkey
        )
        SELECT branch, round(sum(vol), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM j WHERE branch IS NOT NULL
        GROUP BY branch ORDER BY branch
    """,
    "tpch_waiting": """
        WITH f AS (
            SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_last
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY 1, 2
        ),
        w1 AS (
            SELECT *,
                   count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
                   max(supp_last) OVER (PARTITION BY l_orderkey) AS order_last
            FROM f
        ),
        e AS (
            SELECT *,
                   sum(CASE WHEN supp_last = order_last THEN 1 ELSE 0 END)
                       OVER (PARTITION BY l_orderkey) AS n_at_max
            FROM w1
        )
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM e JOIN supplier ON l_suppkey = s_suppkey
        WHERE n_supp >= 2 AND supp_last = order_last AND n_at_max = 1
        GROUP BY s_name ORDER BY numwait DESC, s_name
    """,
    "tpch_idle_balance": """
        SELECT c_nationkey,
               CAST(count(*) AS BIGINT) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND c_custkey NOT IN (
              SELECT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "tpch_order_priority": """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "tpch_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05e0 AND 0.07e0
          AND l_quantity < 24
    """,
    "tpch_important_stock": """
        WITH value AS (
            SELECT l_partkey, sum(l_extendedprice) AS val
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
            GROUP BY l_partkey
        )
        SELECT l_partkey AS p_partkey, round(val, 2) AS stock_value
        FROM value
        WHERE val > (SELECT avg(val) * 2.5e0 FROM value)
        ORDER BY stock_value DESC, p_partkey
    """,
    "tpch_cust_distribution": """
        WITH co AS (
            SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM co GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_top_supplier": """
        -- MATERIALIZED + window max: an inlined rev would be summed
        -- independently for the scalar-max subquery and the probe
        -- side, and parallel double sums can differ in the last ulp,
        -- making the equality match zero rows (observed flaky at sf1)
        WITH rev AS MATERIALIZED (
            SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        ),
        r AS (
            SELECT l_suppkey, total_rev, max(total_rev) OVER () AS mx
            FROM rev
        )
        SELECT s_suppkey, s_name, round(total_rev, 2) AS total_revenue
        FROM r JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev = mx
        ORDER BY s_suppkey
    """,
    "tpch_promo_suppliers": """
        WITH heavy AS (
            SELECT l_suppkey, l_partkey, sum(l_quantity) AS q
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE '%red%')
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING sum(l_quantity) > 60
        )
        SELECT s_suppkey, s_name,
               CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_heavy_parts
        FROM heavy JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_suppkey, s_name
        ORDER BY s_suppkey
    """,
}
