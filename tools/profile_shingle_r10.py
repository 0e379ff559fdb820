"""Round-10 component profiler: where does the shingling chain spend
its time? Times each stage of the normalize->tokens->shingles->
distinct->hash pipeline into a noop sink, min-of-N.

Dev tool only; never touches bench_detail.json.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "4"))

    from pyspark.sql import functions as F

    from steel_energy_consumption_prediction_using_pyspark_spark.session import (
        get_session,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.operators import (
        dedup as D,
        text as X,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

    spark = get_session("profile-shingle-r10")
    # warmup
    spark.range(100).selectExpr(
        "aggregate(sequence(1, 10), 0L, (a, x) -> a + x) s"
    ).agg({"s": "sum"}).collect()

    d = T(spark, sf_dir, "documents")

    def timeit(name, mk):
        runs = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name}#{r}")
            t0 = time.perf_counter()
            mk().write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(f"{name:34s} min={min(runs):7.3f}  runs={runs}", flush=True)

    toks = lambda: d.select(  # noqa: E731
        F.col("doc_id").alias("_id"),
        X.tokens(X.normalize_text("text")).alias("_tk"),
    ).filter(F.size("_tk") >= 3)

    timeit("0_tokens_only", toks)
    timeit(
        "1_shingles_hof",
        lambda: toks().select("_id", X.shingles_from("_tk", 3).alias("_sh")),
    )
    timeit(
        "2_shingles_distinct",
        lambda: toks().select(
            "_id", F.array_distinct(X.shingles_from("_tk", 3)).alias("_sh")
        ),
    )
    timeit("3_shingled_sets", lambda: D.shingled_sets(d))
    timeit(
        "4_plus_gramhash_jvm",
        lambda: D.shingled_sets(d).select(
            "_id", F.transform("_sh", D.gram_hash32).alias("_hs")
        ),
    )
    timeit("5_minhash_banded", lambda: D.minhash_banded(D.shingled_sets(d)))
    timeit(
        "6_hashed_shingle_sets",
        lambda: D._hashed_shingle_sets(d, "text", "doc_id", "source", 3),
    )
    # passage_scrub pieces
    timeit(
        "7_posexplode_grams5",
        lambda: d.select(
            "doc_id",
            X.tokens(X.normalize_text(F.col("text"))).alias("_tk"),
        ).select(
            "doc_id", F.posexplode(X.shingles_from("_tk", 5)).alias("p", "gram")
        ),
    )
    # winnowing pieces
    timeit(
        "8_winnow_fps",
        lambda: X.with_winnow_fingerprints(
            d.select("doc_id", "text"), "text", k=3, w=4
        ).drop("text"),
    )
    timeit(
        "9_gram_md5_only",
        lambda: d.select(
            F.col("doc_id"), X.tokens(X.normalize_text("text")).alias("_tk")
        ).select(
            "doc_id",
            F.transform(
                X.shingles_from("_tk", 3), lambda g: F.md5(g)
            ).alias("_h"),
        ),
    )


if __name__ == "__main__":
    main()
