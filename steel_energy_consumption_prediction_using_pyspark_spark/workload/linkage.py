"""Record-linkage / entity-resolution workload + skew-salted join.

Entity resolution is the missing tier between exact dedup (identical
keys) and near-dedup (similar content): the same real-world entity
appearing under DIFFERENT keys with corrupted attributes. The classic
pipeline — candidate generation by BLOCKING (cheap equi-join on a
derived key, avoiding the |A|×|B| cross product), pairwise SCORING
(edit distance), best-match selection — is exactly a Spark-shaped
problem: the blocking key is the shuffle key, scoring is a JVM-side
expression, best-match is one window pass.

The fixture corpus has no naturally dirty entities, so the queries
derive a deterministic "dirty" side from `customer` IN THE QUERY
(same expressions on the DuckDB side): two corruption styles keyed by
custkey parity. That keeps the whole family oracle-checkable —
blocking recall and scoring precision are pinned by values, not by
trust.

Scale notes (100 TB): candidate-pair count is the whole game. Any
FIXED block-key length k makes candidate pairs grow as n²/10^k —
the round-4 sf1 stress bench measured exactly that (last-3 digits:
0.7 s at sf0.1 → 24.7 s at sf1, 37× for 10× data). The fix is a
SCALE-ADAPTIVE key: block length = greatest(3, len(str(|C|)) − 2),
computed from count(customer) inside the query (one column-pruned
count scan, broadcast as a scalar), so expected block occupancy is
structurally capped at ~15 clean rows regardless of table size and
the pair count is O(n), not O(n²). The identical integer formula
runs on the DuckDB side, so the family stays oracle-checkable at
every SF. Recall stays 100% because the corruption never touches
digits. Skewed blocks (a too-coarse key) are the other failure
mode; the salted_join query next door is the recipe when a block
key goes hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T


def _dirty_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corrupted replica of every third customer: even
    keys are uppercased, odd keys get the 'Customer#' prefix rewritten
    — letter-region edits only, so the digit region (which blocking
    and disambiguation rely on) survives."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 == 1)
    return c.select(
        F.col("c_custkey").alias("dirty_key"),
        F.when(
            F.col("c_custkey") % 2 == 0, F.upper(F.col("c_name"))
        )
        .otherwise(
            F.regexp_replace(F.col("c_name"), "Customer#", "cust no ")
        )
        .alias("dirty_name"),
    )


def _blocked_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared blocked-ER pipeline: adaptive-length digit blocking →
    Levenshtein scoring → struct-min best match per dirty record.

    Block length = greatest(3, len(str(|customer|)) − 2): one extra
    digit per 10× rows, so expected occupancy (|C| / 10^blen) stays
    ≤ ~15 and the candidate-pair count is linear in |C|. The count
    rides a column-pruned scan and is broadcast to both sides as a
    1-row scalar; the blocking join itself is a plain equi-join on
    the derived key — no cross product anywhere in the plan."""
    dirty = _dirty_customers(spark, sf_dir)
    clean = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    params = T(spark, sf_dir, "customer").agg(
        F.greatest(
            F.lit(3), F.length(F.count(F.lit(1)).cast("string")) - F.lit(2)
        ).alias("blen")
    )
    digits = lambda col: F.regexp_replace(col, "[^0-9]", "")  # noqa: E731
    d = (
        dirty.withColumn("dig", digits(F.col("dirty_name")))
        .crossJoin(F.broadcast(params))
        .withColumn("block", F.expr("substring(dig, -blen, blen)"))
    )
    c = (
        clean.withColumn("dig", digits(F.col("c_name")))
        .crossJoin(F.broadcast(params))
        .withColumn("block", F.expr("substring(dig, -blen, blen)"))
    )
    pairs = d.join(c, "block").withColumn(
        "lev", F.levenshtein(F.col("dirty_name"), F.col("c_name"))
    )
    # Best match = lexicographic struct-min per dirty record — a hash
    # aggregate with MAP-SIDE partial min (each scan task emits one
    # candidate per dirty key), vs the previous row_number window whose
    # sort shuffled every scored pair. Same (lev, c_custkey) total
    # order, same winner; measured 5.2 s → 3.7 s at sf0.1.
    return (
        pairs.groupBy("dirty_key")
        .agg(F.min(F.struct("lev", "c_custkey")).alias("m"))
        .select(
            "dirty_key",
            F.col("m.c_custkey").alias("c_custkey"),
            F.col("m.lev").alias("lev"),
        )
    )


def q_er_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked entity resolution: dirty customer names → best clean
    match. Block on the last `blen` digits of the digits-only name
    (the corruption never touches digits; blen is scale-adaptive, see
    _blocked_best), score candidates by Levenshtein distance, keep
    the minimum per dirty record (clean-key tiebreak). Output is the
    20 worst (highest-distance) resolved matches — small, fully
    deterministic, value-checked against DuckDB computing the
    identical pipeline in SQL."""
    best = _blocked_best(spark, sf_dir).withColumnRenamed(
        "c_custkey", "match_key"
    )
    return best.orderBy(F.desc("lev"), F.asc("dirty_key")).limit(20)


def q_er_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate quality of the blocked ER pipeline: total dirty
    records, how many resolved to their true entity (match_key ==
    dirty_key), and the distance histogram collapsed to min/max.
    One row; pins blocking recall == 100% on this corruption set as a
    VALUE the oracle must reproduce, not a test-only assertion."""
    best = _blocked_best(spark, sf_dir)
    return best.agg(
        F.count(F.lit(1)).alias("n_dirty"),
        F.sum(
            (F.col("c_custkey") == F.col("dirty_key")).cast("long")
        ).alias("n_correct"),
        F.min("lev").alias("min_lev"),
        F.max("lev").alias("max_lev"),
    )


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈fact equi-join (operators/relational.py::
    salted_join): lineitem ⋈ orders on the order key with the big side
    salted over 8 buckets and the right side replicated per salt —
    the plan-level fix when one join key holds a disproportionate row
    share on both sides and AQE's post-shuffle splitting can't save
    the stage. Result must be identical to the plain join: revenue by
    order priority."""
    from steel_energy_consumption_prediction_using_pyspark_spark.operators.relational import (
        salted_join,
    )

    li = (
        T(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            "l_extendedprice",
            "l_discount",
        )
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, o, on=["o_orderkey"], salt_buckets=8)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


QUERIES = {
    "er_match": q_er_match,
    "er_quality": q_er_quality,
    "salted_join": q_salted_join,
}

# DuckDB notes: regexp_replace needs the 'g' flag (Spark replaces all
# occurrences by default); right(x, k) ≡ Spark substring(x, -k, k)
# for k ≤ len(x); levenshtein is the same unit-cost edit distance in
# both engines. The adaptive block length replays the Spark formula:
# greatest(3, len(str(count(customer))) − 2).
_ER_BEST = """
    WITH params AS (
        SELECT greatest(3, length(CAST(count(*) AS VARCHAR)) - 2) AS blen
        FROM customer
    ),
    dirty AS (
        SELECT c_custkey AS dirty_key,
               CASE WHEN c_custkey % 2 = 0 THEN upper(c_name)
                    ELSE regexp_replace(c_name, 'Customer#', 'cust no ', 'g')
               END AS dirty_name
        FROM customer WHERE c_custkey % 3 = 1
    ),
    d AS (SELECT dirty.*,
                 right(regexp_replace(dirty_name, '[^0-9]', '', 'g'), blen) AS block
          FROM dirty, params),
    c AS (SELECT c_custkey, c_name,
                 right(regexp_replace(c_name, '[^0-9]', '', 'g'), blen) AS block
          FROM customer, params),
    pairs AS (
        SELECT d.dirty_key, d.dirty_name, c.c_custkey, c.c_name,
               levenshtein(d.dirty_name, c.c_name) AS lev
        FROM d JOIN c USING (block)
    ),
    best AS (
        SELECT dirty_key, c_custkey, lev,
               row_number() OVER (PARTITION BY dirty_key ORDER BY lev, c_custkey) AS rn
        FROM pairs
    )
"""

ORACLES = {
    "er_match": _ER_BEST
    + """
    SELECT dirty_key, c_custkey AS match_key, lev
    FROM best WHERE rn = 1
    ORDER BY lev DESC, dirty_key ASC LIMIT 20
    """,
    "er_quality": _ER_BEST
    + """
    SELECT CAST(count(*) AS BIGINT) AS n_dirty,
           CAST(sum(CASE WHEN c_custkey = dirty_key THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           min(lev) AS min_lev,
           max(lev) AS max_lev
    FROM best WHERE rn = 1
    """,
    "salted_join": """
        SELECT o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
}
