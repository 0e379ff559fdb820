"""Memory-pressure gate (round 7, VERDICT r6 #4): prove the heavy
tiers SPILL instead of OOM when executor memory is scarce — the last
untested axis of the 100 TB claim, where per-task memory is a small
slice of a shared executor, not a roomy 128 GiB box.

Runs the spill-dependent queries at sf1 inside a SUBPROCESS whose JVM
is capped (spark.driver.memory=2g — driver == executor in local mode)
with the unified-memory execution pool further squeezed
(spark.memory.fraction=0.3, ~450 MB for execution+storage), then:

- verifies every result against its DuckDB oracle digest (DuckDB runs
  in native memory, unaffected by the JVM cap) — spill must never
  change answers;
- records per-query spill volumes (memoryBytesSpilled /
  diskBytesSpilled deltas from the Spark REST status API) and the
  JVM's actual Runtime.maxMemory() as proof the cap was real.

Usage:
    python tools/memory_pressure.py [--round 7] [--sf-dir .testdata/sf1]
Writes MEMORY_PRESSURE_r{round}.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

# The spill-dependent tier, each phase at the SF where its per-task
# volumes actually exceed the spill threshold: the fact-table
# sort/window/write paths at sf1 (6M-row lineitem), the SCALABLE
# doc-tier shuffle paths at sf10 (100k docs — at sf1 they run ~2.5k
# rows/task, far below any sane spill point; forcing thresholds under
# that was measured to OOM in the spill-READER instead: 183 spill
# files/task x 1 MB read buffers at threshold 1024).
#
# dedup_clusters (exact n-gram-Jaccard tier) runs at sf1 — its
# CONTRACT scale: the tier is quadratic-within-block by design and
# its 100 TB volume path IS the minhash tier benched at sf10 here.
# Measured boundary (round 7, kept as the adjudication): at sf10
# under this cap its verify join heap-OOMs holding the
# shingle-set-array rows of 34 concurrent tasks — out of contract,
# while minhash_lsh at the same scale/cap passes with ~815 MB
# spilled and a green oracle hash.
#
# The GRAPH tier joins the sf1 phase in round 8 (VERDICT r7 #5):
# iterative lineage + persisted rank/frontier vectors is the classic
# OOM site the sort/window/text phases never touch. pagerank builds
# the bucketed edge table under the cap; bfs_hops and ppr then ride
# the same session's edge cache — the serving shape, measured cold
# (pagerank) and warm (the walks).
PHASES: dict[str, list[str]] = {
    "sf1": ["percentiles", "window_running", "table_maintenance",
            "dedup_clusters", "pagerank", "bfs_hops", "ppr"],
    "sf10": ["minhash_lsh", "simhash", "tfidf", "bm25"],
}

DRIVER_MEMORY = "2g"
MEMORY_FRACTION = "0.3"
# Deterministic spill engagement: Spark's force-spill thresholds make
# the unsafe sorters/buffers spill after N in-memory rows regardless
# of free memory — the documented testing knobs for exactly this
# gate. With them, the run proves the SPILL PATH yields
# oracle-identical answers (not merely that sf1 fits in the cap).
CHILD_CONF = {
    "spark.driver.memory": DRIVER_MEMORY,
    "spark.memory.fraction": MEMORY_FRACTION,
    # the engine session disables the UI; the gate needs the REST
    # status API for spill metrics
    "spark.ui.enabled": "true",
    # per-task in-memory row budget: low enough that the fact-tier
    # (sf1: ~190k rows/task) and doc-tier-at-sf10 (~600k rows/task for
    # tfidf) sorters take the spill path a handful of times per task,
    # high enough to stay clear of the too-many-spill-files reader
    # pathology (measured at threshold 1024: UnsafeSorterSpillReader's
    # 1 MB buffer x 183 files/task OOMed the merge).
    "spark.shuffle.spill.numElementsForceSpillThreshold": "65536",
    "spark.sql.windowExec.buffer.spill.threshold": "65536",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "65536",
}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _stage_spill_totals(spark) -> tuple[int, int]:
    """Sum memory/disk spill bytes over all stages via the REST status
    API. Raises if the UI is unavailable — a silent (0, 0) here would
    make the recorded spill volumes indistinguishable from a broken
    probe (caught in round 7: the engine session ships
    spark.ui.enabled=false, so the first artifact's zeros measured
    nothing; CHILD_CONF re-enables it)."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        raise RuntimeError("Spark UI disabled: no spill telemetry")
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages", timeout=10
    ) as r:
        stages = json.load(r)
    return (
        sum(s.get("memoryBytesSpilled", 0) for s in stages),
        sum(s.get("diskBytesSpilled", 0) for s in stages),
    )


def child(sf_dir: str, queries: list[str]) -> None:
    """Runs inside the capped JVM: execute + oracle-compare each query,
    print one RESULT json line per query."""
    import duckdb

    from check_correctness import summarize
    from steel_energy_consumption_prediction_using_pyspark_spark.session import (
        get_session,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.workload import (
        all_queries,
    )

    spark = get_session("memory-pressure", extra_conf=CHILD_CONF)
    jvm_max = int(spark._jvm.Runtime.getRuntime().maxMemory())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as e

    qs = all_queries()
    oracles = e.oracle_sql()
    print("META " + json.dumps({"jvm_max_heap_bytes": jvm_max}), flush=True)
    for name in queries:
        m0, d0 = _stage_spill_totals(spark)
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            engine_sec = round(time.time() - t0, 1)
        except Exception as ex:
            print(
                "RESULT "
                + json.dumps({"query": name, "status": "fail",
                              "err": f"spark: {ex}"[:500]}),
                flush=True,
            )
            continue
        m1, d1 = _stage_spill_totals(spark)
        res = con.execute(oracles[name])
        dcols = [x[0] for x in res.description]
        drows = res.fetchall()
        ok = (
            len(srows) == len(drows)
            and sorted(scols) == sorted(dcols)
            and summarize(srows, scols) == summarize(drows, dcols)
        )
        print(
            "RESULT "
            + json.dumps(
                {
                    "query": name,
                    "status": "ok" if ok else "fail",
                    "rows": len(srows),
                    "engine_sec": engine_sec,
                    "memory_bytes_spilled": m1 - m0,
                    "disk_bytes_spilled": d1 - d0,
                }
            ),
            flush=True,
        )
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=7)
    ap.add_argument("--sf-dir", default=None,
                    help="(child mode) fixture dir for this phase")
    ap.add_argument("--queries", default="",
                    help="(child mode) comma-separated query names")
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()
    if args.child:
        child(args.sf_dir, [q for q in args.queries.split(",") if q])
        return 0

    results, meta, failures = [], {}, []
    stderr_tail = ""
    expected: set = set()
    for phase, queries in PHASES.items():
        sf_dir = os.path.join(REPO, ".testdata", phase)
        expected |= set(queries)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--sf-dir", sf_dir, "--queries", ",".join(queries)],
            capture_output=True,
            text=True,
            timeout=3600,
            cwd=REPO,
        )
        for ln in proc.stdout.splitlines():
            if ln.startswith("RESULT "):
                r = json.loads(ln[len("RESULT "):])
                r["phase"] = phase
                results.append(r)
            elif ln.startswith("META "):
                meta = json.loads(ln[len("META "):])
        if proc.returncode != 0:
            failures.append(f"{phase} child exit {proc.returncode}")
            stderr_tail += proc.stderr[-1500:]
    failures += [r["query"] for r in results if r["status"] != "ok"]
    missing = sorted(expected - {r["query"] for r in results})
    spilled = [r for r in results if r.get("disk_bytes_spilled", 0) > 0
               or r.get("memory_bytes_spilled", 0) > 0]
    peak = max(
        results,
        key=lambda r: r.get("memory_bytes_spilled", 0)
        + r.get("disk_bytes_spilled", 0),
        default=None,
    )
    out = {
        "purpose": (
            "Spill-not-OOM gate: the spill-dependent tier at sf1 under "
            f"a {DRIVER_MEMORY} JVM cap with spark.memory.fraction="
            f"{MEMORY_FRACTION}, every result hash-verified against its "
            "DuckDB oracle (VERDICT r6 #4)."
        ),
        "phases": {k: v for k, v in PHASES.items()},
        "driver_memory": DRIVER_MEMORY,
        "memory_fraction": MEMORY_FRACTION,
        "child_conf": CHILD_CONF,
        "jvm_max_heap_bytes": meta.get("jvm_max_heap_bytes"),
        "queries": results,
        "n_spilling": len(spilled),
        "peak_spill_query": peak["query"] if peak else None,
        "missing": missing,
        "failures": failures,
        "child_stderr_tail": stderr_tail if failures else "",
    }
    path = os.path.join(REPO, f"MEMORY_PRESSURE_r{args.round:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in (
        "jvm_max_heap_bytes", "n_spilling", "peak_spill_query", "failures",
        "missing")}))
    print(f"wrote {path}")
    return 1 if (failures or missing) else 0


if __name__ == "__main__":
    sys.exit(main())
