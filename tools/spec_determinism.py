"""Speculative-execution / task-retry determinism probe (round 6,
VERDICT r5 #7).

PERF.md's knob doctrine claims retries and speculative duplicates can
never change results because every query is value-deterministic (total
ordering tie-breaks, order-independent aggregation, content-addressed
sampling). This script PROVES it once per round instead of asserting
it:

1. A fresh session with AGGRESSIVE speculation (every task eligible
   immediately: quantile 0, multiplier 1, 5 ms interval) runs a
   representative slice of the registry — window tie-breaks, hash
   sampling, salted aggregation, ANN probe, weighted reservoir — and
   prints each result's canonical order-insensitive hash (the exact
   digest tools/check_correctness.py compares against DuckDB).
2. A retry probe injects a GUARANTEED task failure (attempt 0 of
   partition 0 raises) under master local[8,3] (maxTaskFailures=3, so
   the stage survives); the job can only succeed via re-execution, and
   its hash must equal the uninjected run's.

tests/test_determinism.py runs this in a subprocess (speculation is a
SparkContext-creation conf) and compares the printed hashes against
the live DuckDB oracle hashes — any nondeterminism a retry or a
duplicate task attempt could introduce breaks the equality.

Usage: python tools/spec_determinism.py [sf_dir]
Prints ONE JSON line: {"speculation": {name: hash}, "retry": {...}}.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Representative nondeterminism-sensitive shapes: ranking window with
# tie-break contract, content-addressed hash sample, salted two-phase
# aggregation, IVF probe (session index built under speculation too),
# weighted reservoir (rank over transformed keys).
PROBE_QUERIES = [
    "window_ranks",
    "sample_hash",
    "salted_agg",
    "ivf_probe",
    "weighted_reservoir",
]


def _fail_first_attempt(iterator):
    from pyspark import TaskContext

    tc = TaskContext.get()
    if tc is not None and tc.attemptNumber() == 0 and tc.partitionId() == 0:
        raise RuntimeError("injected failure: retry-determinism probe")
    for batch in iterator:
        yield batch


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    sys.path.insert(0, REPO)
    from tools.check_correctness import summarize

    import __spark_entry__ as e
    from steel_energy_consumption_prediction_using_pyspark_spark.session import (
        get_session,
    )

    spark = get_session(
        "spec-determinism",
        master="local[8,3]",  # 3 task attempts: injected failures retry
        shuffle_partitions=8,
        extra_conf={
            "spark.speculation": "true",
            "spark.speculation.interval": "5ms",
            "spark.speculation.multiplier": "1.0",
            "spark.speculation.quantile": "0.0",
        },
    )
    assert spark.sparkContext.getConf().get("spark.speculation") == "true"

    qs = e.queries()
    out = {"speculation": {}, "retry": {}}
    for name in PROBE_QUERIES:
        df = qs[name](spark, sf_dir)
        out["speculation"][name] = summarize(df.collect(), df.columns)

    # Retry probe: a salted-agg + ranking-window pipeline over a scan
    # whose first task attempt ALWAYS fails — success requires a retry,
    # and the result must match the uninjected plan bit for bit.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import (
        T,
    )

    base = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )

    def pipeline(src):
        salted = (
            src.withColumn("_salt", F.pmod(F.col("l_orderkey"), F.lit(7)))
            .groupBy("l_returnflag", "_salt")
            .agg(F.sum("l_quantity").alias("_q"), F.count(F.lit(1)).alias("_n"))
            .groupBy("l_returnflag")
            .agg(F.sum("_q").alias("qty"), F.sum("_n").alias("n"))
        )
        w = Window.orderBy(F.desc("n"), F.asc("l_returnflag"))
        return salted.withColumn("rank", F.row_number().over(w)).select(
            "l_returnflag", "n", F.round("qty", 2).alias("qty"), "rank"
        )

    injected = pipeline(base.mapInPandas(_fail_first_attempt, base.schema))
    plain = pipeline(base)
    out["retry"]["injected"] = summarize(injected.collect(), injected.columns)
    out["retry"]["plain"] = summarize(plain.collect(), plain.columns)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
