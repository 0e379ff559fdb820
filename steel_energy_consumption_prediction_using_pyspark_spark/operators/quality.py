"""Pipeline data-quality gates via observed metrics.

`df.observe` piggybacks aggregate counters on whatever action the
pipeline already runs — at 100 TB that means quality telemetry with
ZERO extra scans, vs a separate validation pass that re-reads the
input. The counters surface through `pyspark.sql.Observation` after
the first action and can fail the job (gate) when a rule is violated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def rule_metrics(rules: dict[str, Column]) -> list[Column]:
    """Aggregate columns for boolean `rules` (True = row OK): a
    total-row counter plus one `bad_<name>` violation counter per
    rule. Shared by the observe path and plain batch summaries
    (`df.agg(*rule_metrics(rules))`)."""
    return [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(~cond, 1).otherwise(0)).cast("bigint").alias(f"bad_{name}")
        for name, cond in rules.items()
    ]


def observe_rules(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach violation counters for boolean `rules` (True = row OK)
    plus a total-row counter. Returns (df, observation); read
    `observation.get` after the next action on df."""
    obs = Observation()
    return df.observe(obs, *rule_metrics(rules)), obs


def check_gate(
    observation: Observation, max_bad_fraction: float = 0.0
) -> dict[str, int]:
    """Evaluate an observation after the action ran. Raises ValueError
    naming every violated rule whose bad-row fraction exceeds
    `max_bad_fraction`; returns the raw counters otherwise."""
    got = observation.get
    n = max(got["n_rows"], 1)
    violated = {
        k: v for k, v in got.items() if k.startswith("bad_") and v / n > max_bad_fraction
    }
    if violated:
        raise ValueError(f"quality gate failed: {violated} of {got['n_rows']} rows")
    return got


def skew_profile(df, keys, top: int = 5):
    """Key-distribution diagnostic for shuffle planning: per-key group
    sizes reduced to (n_keys, total, max/avg/p50 group size, skew
    factor max/avg, and the `top` hottest keys with their row share).

    At 100 TB this is the report you run BEFORE choosing a join/agg
    strategy on a new key: skew factor ≈ 1 → plain hash shuffle;
    ≫ 1 → salting (salted_sum_count / salted_join) or AQE skew
    splitting. Cost is one partial+final aggregation on the candidate
    key — the same shuffle shape the real query would pay, but on
    count partials only.

    Returns a 1-row DataFrame; hot keys are packed into a sorted
    array<struct> so the output is deterministic and schema-stable.
    """
    from pyspark.sql import functions as F

    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    key_str = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
    # skew_factor derives from the UNROUNDED average (dividing by an
    # already-4dp value compounds rounding error), and both ratios use
    # the floor(x*10^n + 0.5) recipe — round() halfway behavior is the
    # classic cross-engine parity trap (NOTES.md rule 5 / ADVICE r1).
    flr = lambda c, n: F.floor(c * F.lit(10.0**n) + F.lit(0.5)) / F.lit(10.0**n)  # noqa: E731
    summary = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.avg("cnt").alias("_avg_raw"),
    ).select(
        "n_keys",
        "n_rows",
        "max_cnt",
        flr(F.col("_avg_raw"), 4).alias("avg_cnt"),
        flr(F.col("max_cnt") / F.col("_avg_raw"), 4).alias("skew_factor"),
    )
    # Hot keys via TakeOrderedAndProject (per-partition k-heap, driver
    # merge) THEN the array pack — the packed aggregation only ever
    # sees `top` rows, never the full key population (a collect_list
    # over every key would be a single-buffer OOM at 10⁸ keys).
    hot = (
        per_key.withColumn("key_s", key_str)
        .orderBy(F.desc("cnt"), F.asc("key_s"))
        .limit(int(top))
        .agg(
            F.expr(
                "array_sort(collect_list(named_struct('cnt', cnt, 'key', key_s)), "
                "(a, b) -> CASE WHEN a.cnt > b.cnt THEN -1 WHEN a.cnt < b.cnt THEN 1 "
                "WHEN a.key < b.key THEN -1 WHEN a.key > b.key THEN 1 ELSE 0 END)"
            ).alias("hot_keys")
        )
    )
    return summary.crossJoin(hot)


def table_fingerprint(df, row_str):
    """Order-insensitive whole-table checksum for anti-entropy checks
    (replica comparison, migration verification, cross-engine parity)
    at 100 TB: per-row md5 split into two 60-bit lanes, XOR-aggregated.
    XOR is commutative/associative → partition-order- and
    shuffle-free: one partial+final aggregation, constant state,
    no sort anywhere. Two independent lanes (md5 hex chars 1-15 and
    17-31) make silent collision odds negligible (~2⁻¹²⁰ per pair).

    `row_str` must be a deterministic, engine-portable stringification
    of the row (caller formats floats/timestamps explicitly — plain
    casts of doubles differ across engines, and %.Nf parity across
    Java/C formatters holds only when the value is already N-decimal:
    halfway digits beyond N round differently, see
    test_parity_fuzz.py::test_printf_float_format_parity). Note the XOR algebra
    cancels rows appearing an EVEN number of times; include the
    table's unique key in `row_str` so physical duplicates are the
    only thing that can cancel — those are upstream bugs this check
    exists to catch via n_rows.

    Returns 1 row: (n_rows, fp_lo, fp_hi).
    """
    from pyspark.sql import functions as F

    h = F.md5(row_str)
    lane = lambda a: F.conv(F.substring(h, a, 15), 16, 10).cast("long")  # noqa: E731
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(lane(1)).alias("fp_lo"),
        F.bit_xor(lane(17)).alias("fp_hi"),
    )


def join_size_estimate(
    a: DataFrame,
    a_key: str,
    b: DataFrame,
    b_key: str,
    label: str = "join",
) -> DataFrame:
    """EXACT equi-join output cardinality from per-key counts —
    |A ⋈ B| = Σ_k cntA(k)·cntB(k) — without executing the join.

    The pre-flight check before committing a join key at 100 TB
    (companion to :func:`skew_profile`): two map-side-combinable
    groupBy counts plus a join of the (small) count tables replace
    materializing a potentially exploding output. A self-join profile
    (pass the same frame twice) answers "will this pair generator
    blow up" — the question the dedup tier's blocked self-joins ask
    before choosing block keys. The formula is exact, not an
    estimate, so a DuckDB twin hash-verifies it; at warehouse scale
    the same shape runs over sampled or sketched counts (the CM-sketch
    variant trades exactness for one pass).

    Returns 1 row: (join_name, est_rows, n_shared_keys,
    max_key_rows, top_key) where max_key_rows is the largest single
    key's contribution — the skew headline — and top_key is its key
    (largest key wins contribution ties, via struct-max: one hash
    aggregate, no window sort).
    """
    ca = a.groupBy(F.col(a_key).alias("k")).agg(F.count(F.lit(1)).alias("ca"))
    cb = b.groupBy(F.col(b_key).alias("k")).agg(F.count(F.lit(1)).alias("cb"))
    contrib = ca.join(cb, "k").select(
        "k", (F.col("ca") * F.col("cb")).alias("rows")
    )
    m = F.max(F.struct(F.col("rows"), F.col("k"))).alias("m")
    return contrib.agg(
        F.sum("rows").alias("est_rows"),
        F.count(F.lit(1)).alias("n_shared_keys"),
        m,
    ).select(
        F.lit(label).alias("join_name"),
        "est_rows",
        "n_shared_keys",
        F.col("m.rows").alias("max_key_rows"),
        F.col("m.k").alias("top_key"),
    )
