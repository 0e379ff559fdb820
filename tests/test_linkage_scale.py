"""Scale pins for the blocked-ER tier (workload/linkage.py).

The round-4 sf1 stress bench showed any FIXED block-key length makes
candidate pairs grow as n²/10^k (er_match: 37× wall for 10× rows).
These pins make the fix structural: the block length grows one digit
per 10× table size, so expected block occupancy — and therefore the
Levenshtein pair count per dirty record — is bounded by a constant
regardless of scale factor.
"""

import pytest
from pyspark.sql import functions as F


def _blen(n: int) -> int:
    # Mirror of the in-query formula: greatest(3, len(str(n)) - 2).
    return max(3, len(str(n)) - 2)


def test_block_length_grows_with_scale():
    # One extra digit per 10× rows above the 10^5 knee; expected
    # occupancy n / 10^blen stays ≤ 15 at every TPC-H customer size.
    for n in (1500, 15_000, 150_000, 1_500_000, 15_000_000, 1_500_000_000):
        assert n / (10 ** _blen(n)) <= 15, n
    assert _blen(150_000) == 4
    assert _blen(1_500_000) == 5


def test_candidate_pairs_bounded_by_occupancy(spark, sf_dir):
    """End-to-end: the blocking join's pair count is ≤ |dirty| × the
    occupancy cap — linear in table size, never the n²/10^k blowup."""
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.linkage import (
        _dirty_customers,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

    clean = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    n = clean.count()
    blen = _blen(n)
    digits = lambda col: F.regexp_replace(col, "[^0-9]", "")  # noqa: E731
    d = _dirty_customers(spark, sf_dir).withColumn(
        "block", F.substring(digits(F.col("dirty_name")), -blen, blen)
    )
    c = clean.withColumn(
        "block", F.substring(digits(F.col("c_name")), -blen, blen)
    )
    n_dirty = d.count()
    n_pairs = d.join(c, "block").count()
    # 4× headroom over the expected occupancy for digit-distribution
    # lumpiness at tiny SFs; the quadratic failure mode is orders of
    # magnitude past this.
    cap = max(1.0, 4.0 * n / (10 ** blen))
    assert n_pairs <= n_dirty * cap, (n_pairs, n_dirty, cap)


def test_er_match_winners_stable_across_key_widths(spark, sf_dir):
    """Widening the block key must only ever SHRINK the candidate set
    while keeping the true match in-block (digits are never corrupted)
    — pinned by comparing best-match output at blen vs blen+1."""
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.linkage import (
        _dirty_customers,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

    clean = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    digits = lambda col: F.regexp_replace(col, "[^0-9]", "")  # noqa: E731

    def best(blen):
        d = _dirty_customers(spark, sf_dir).withColumn(
            "block", F.substring(digits(F.col("dirty_name")), -blen, blen)
        )
        c = clean.withColumn(
            "block", F.substring(digits(F.col("c_name")), -blen, blen)
        )
        pairs = d.join(c, "block").withColumn(
            "lev", F.levenshtein("dirty_name", "c_name")
        )
        return (
            pairs.groupBy("dirty_key")
            .agg(F.min(F.struct("lev", "c_custkey")).alias("m"))
            .select("dirty_key", F.col("m.c_custkey").alias("k"))
        )

    a = {r.dirty_key: r.k for r in best(3).collect()}
    b = {r.dirty_key: r.k for r in best(4).collect()}
    assert set(a) == set(b)  # recall preserved: every dirty key resolves
    # The true entity always survives widening; at this fixture the
    # winner is the true entity for every record, so the maps agree.
    assert a == b
