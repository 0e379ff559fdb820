"""Round-10 micro-A/B: connected_components convergence sum via
observe()-on-checkpoint (current) vs a separate agg.collect() per
round (round-9 form). Interleaved in ONE session on the identical
pairs input so box drift hits both variants equally.

Dev tool only; never touches bench artifacts.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def cc_collect(edges, nodes, id_col, src_col, dst_col, max_iter=15):
    """The round-9 shape: separate sum-collect per round."""
    from pyspark.sql import functions as F

    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .union(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).cast("long").alias("lbl")
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.s == labels.id)
            .groupBy(sym.d.alias("nid"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.nid, "left")
            .select(
                labels.id,
                F.least(labels.lbl, F.coalesce("nbr_lbl", labels.lbl)).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = new_labels.agg(F.sum("lbl")).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("id", F.col("lbl").alias("cluster"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "4"))

    from pyspark.sql import functions as F

    from steel_energy_consumption_prediction_using_pyspark_spark.operators import (
        dedup as D,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.session import (
        get_session,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.text import (
        _with_planted_dups,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

    spark = get_session("ab-cc-observe")
    d = T(spark, sf_dir, "documents")
    aug = _with_planted_dups(
        _with_planted_dups(d, 10, 10_000_000), 10, 20_000_000
    )
    pairs = D.ngram_jaccard_pairs(
        aug, "text", "doc_id", block_col="source", shingle_n=3, threshold=0.03
    ).localCheckpoint(eager=True)
    nodes = aug.select("doc_id").localCheckpoint(eager=True)

    def run(tag, fn):
        spark.sparkContext.setJobDescription(f"cc:{tag}")
        t0 = time.perf_counter()
        out = fn()
        out.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    obs_runs, col_runs = [], []
    for r in range(reps):
        col_runs.append(
            run("collect", lambda: cc_collect(pairs, nodes, "doc_id", "id_a", "id_b"))
        )
        obs_runs.append(
            run(
                "observe",
                lambda: D.connected_components(
                    pairs, nodes, id_col="doc_id", src_col="id_a", dst_col="id_b"
                ),
            )
        )
    print("collect:", [round(t, 3) for t in col_runs], "min", round(min(col_runs), 3))
    print("observe:", [round(t, 3) for t in obs_runs], "min", round(min(obs_runs), 3))


if __name__ == "__main__":
    main()
