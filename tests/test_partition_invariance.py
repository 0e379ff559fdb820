"""Partition-count independence: results must not depend on
spark.sql.shuffle.partitions or input repartitioning — the property
that lets the same code run on 4 local threads and 1000 executors.
(randomSplit is the documented exception — SURVEY §7.4.)"""

import pytest

from steel_energy_consumption_prediction_using_pyspark_spark.workload import (
    all_queries,
)

REPRESENTATIVE = [
    "pricing_summary",     # multi-agg
    "join_fact",           # shuffle join
    "window_running",      # ordered window frames
    "sessionize",          # lag-based state
    "histogram",           # two-pass + scalar subquery
    "knn_bruteforce",      # fp-ordered top-k
    "corpus_curation",     # filter→dedup→agg pipeline
    "minhash_lsh",         # sketch + LSH join
    "salted_join",         # tuple-hash salt must not vary with layout
    "prefix_jaccard",      # prefix self-join + exact verify
    "ewma_value",          # per-key ordered fold
    "table_fingerprint",   # XOR aggregate (order-free by algebra)
    "bfs_hops",            # iterative frontier expansion
    "er_match",            # blocked linkage + window best-match
    "bm25",                # integer-count float scoring + top-k
    "rolling_median",      # framed collect + interpolation
    "percentiles",         # weighted order statistics over the value spine
    "quantile_normalize",  # spine-derived global grid + percent_rank
    "customer_deciles",    # distributed_ntile partition-offset ranks
    "stream_dedup",        # dropDuplicates keep-arbitrary on unique keys
    "ngram_jaccard",       # inverted-index pair counts + checkpointed postings
    "dsir_select",         # bucket-model log ratios + per-doc fp sums
    "stream_full_join",    # full-outer time-bounded join accounting
    "semantic_dedup",      # cluster-blocked cosine pairs + survivor counts
    "rag_retrieve",        # composed probe→rerank→diversify→join pipeline
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_result_invariant_to_shuffle_partitions(spark, sf_dir, name):
    qs = all_queries()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        a = _rows(qs[name](spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = _rows(qs[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name} result depends on shuffle partition count"
