"""Round-9 optimization profiler: min-of-N per-query timings in ONE
warm session, with per-family cache eviction so every rep measures the
same (cold or warm) contract as bench.py, plus optional
explain("formatted") capture.

Usage:
  python tools/profile_r09.py [--reps N] [--plans DIR] q1 q2 ...

Unlike bench.py this is a DEV tool: it never writes bench_detail.json
and the output is a human-readable table plus one JSON line."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    plans_dir = None
    suffix = "before"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from steel_energy_consumption_prediction_using_pyspark_spark.session import (
        get_session,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.workload import (
        all_queries,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.workload import (
        graph as _wgraph,
        text as _wtext,
        vector as _wvector,
    )

    spark = get_session("profile-r09")
    qs = all_queries()

    # Same JVM warm-up as bench.py so first-query readings aren't JIT.
    warm = spark.range(10000).selectExpr("id", "cast(id % 7 as string) k")
    warm.groupBy("k").count().collect()
    warm.selectExpr(
        "id", "row_number() over (partition by k order by id) rn"
    ).collect()
    dim = spark.range(7).selectExpr("cast(id as string) k")
    warm.join(dim.hint("broadcast"), "k").count()
    spark.range(100).selectExpr(
        "variant_get(parse_json('{\"k\": 1}'), '$.k', 'int') v"
    ).agg({"v": "sum"}).collect()
    spark.range(100).selectExpr(
        "aggregate(sequence(1, 10), 0L, (a, x) -> a + x) s"
    ).agg({"s": "sum"}).collect()

    def _evict_sig_store() -> None:
        _wtext._SIG_STORE.clear()
        shutil.rmtree(_wtext._sig_store_base(sf_dir), ignore_errors=True)

    def _evict_ann_index() -> None:
        _wvector._DISK_INDEX.clear()
        shutil.rmtree(_wvector._index_base(sf_dir), ignore_errors=True)

    def _evict_graph() -> None:
        for k in list(_wgraph._EDGE_CACHE):
            _wgraph._EDGE_CACHE.pop(k).unpersist()

    def _evict_ivf() -> None:
        for k in list(_wvector._IVF_CACHE):
            _wvector._IVF_CACHE.pop(k).unpersist()
        for k in list(_wvector._PQ_CACHE):
            _wvector._PQ_CACHE.pop(k)[1].unpersist()

    # Evictions that make EVERY rep measure the query's bench contract
    # (bench order: the first of each family pays the cold build).
    EVICT = {
        "signature_store_build": [_evict_sig_store],
        "ann_index_build": [_evict_ann_index],
        "pagerank": [_evict_graph],
        "keyword_pagerank": [],
        "rag_retrieve": [_evict_ivf],
        "ann_ivf": [],  # rebuilds by contract anyway
    }

    results = {}
    for name in names:
        fn = qs[name]
        runs = []
        for r in range(reps):
            for ev in EVICT.get(name, []):
                ev()
            spark.sparkContext.setJobDescription(f"profile:{name}#{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {"min": min(runs), "runs": runs}
        print(f"{name:32s} min={min(runs):7.3f}  runs={runs}", flush=True)
        if plans_dir:
            import contextlib
            import io

            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
    print(json.dumps({k: v["min"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
