"""Round-10 component profiler for the cold vector tier: where do
rag_retrieve / ann_pq / ann_ivf spend their cold seconds? Times each
stage of the IVF/PQ build+probe chain. Dev tool only."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from steel_energy_consumption_prediction_using_pyspark_spark.operators import (
        pq as PQ,
        similarity as S,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.session import (
        get_session,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.vector import (
        IVF_K,
        IVF_NPROBE,
        N_QUERY,
        TOP_K,
        PQ_SHORTLIST,
    )

    spark = get_session("profile-vector-r10")
    spark.range(100).selectExpr(
        "aggregate(sequence(1, 10), 0L, (a, x) -> a + x) s"
    ).agg({"s": "sum"}).collect()

    e = T(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = e.filter(F.col("vec_id") >= N_QUERY)

    def t(name, fn):
        t0 = time.perf_counter()
        r = fn()
        print(f"{name:32s} {time.perf_counter()-t0:7.3f}s", flush=True)
        return r

    for rep in range(2):
        print(f"--- rep {rep} (rep0 = cold session) ---")
        idx = t("ivf_build(persist)", lambda: S.ivf_build(
            corpus, n_centroids=IVF_K, seed=42, persist=True))
        t("  assigned.count (materialize)", lambda: idx.assigned.count())
        probe = t("ivf_probe plan", lambda: S.ivf_probe(
            idx, queries, k=50, n_probe=IVF_NPROBE))
        t("ivf_probe exec", lambda: probe.write.mode("overwrite").format("noop").save())
        cand = probe.join(
            e.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            "neighbor_id",
        )
        picked = t("mmr plan", lambda: S.mmr_rerank(cand, k=10, lamb=0.7))
        t("mmr exec", lambda: picked.write.mode("overwrite").format("noop").save())
        idx.assigned.unpersist()

        model = t("pq_train", lambda: PQ.pq_train(corpus, m=8, k=32, dim=64))
        enc = t("pq_encode plan", lambda: PQ.pq_encode(corpus, model))
        t("pq_encode exec", lambda: enc.write.mode("overwrite").format("noop").save())
        rr = t("pq_rerank plan", lambda: PQ.pq_rerank_topk(
            enc, queries, corpus, model, k=TOP_K, shortlist=PQ_SHORTLIST))
        t("pq_rerank exec", lambda: rr.write.mode("overwrite").format("noop").save())


if __name__ == "__main__":
    main()
