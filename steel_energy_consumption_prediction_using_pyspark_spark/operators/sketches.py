"""Mergeable DataSketches operators (Apache DataSketches via Spark SQL).

The 100 TB pattern for distinct counts / quantiles / set overlap is
NOT a global shuffle of raw values — it is: build a small fixed-size
sketch per partition (or per day / per file as a materialized rollup),
then merge sketches. Merges are commutative and associative, so
partials can be stored, reused, and late-merged without re-scanning
history; a day's 100 GB partition collapses to a few KB of state.

All functions here are thin declarative wrappers over Spark's built-in
datasketches expressions (JVM-side, codegen-friendly, no Python):

- HLL (HyperLogLog): distinct-count estimates, `hll_union_agg` for
  register-wise partial merges;
- KLL: rank/quantile estimates over doubles, `kll_merge_agg_double`;
- Theta: set algebra on distinct sets — union / intersection /
  difference cardinalities (the "users who did A and B" question that
  plain distinct counts cannot answer without a self-join).

Estimates are deterministic: sketch hashing is seed-fixed and merges
are order-insensitive, so results are partition-invariant (pinned by
tests/test_sketches.py). They are still *estimates* — no DuckDB
oracle; accuracy vs exact is asserted in tests instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_distinct_rollup(
    df: DataFrame,
    keys: list[str],
    item: str,
    partial_by: str | None = None,
    lg_k: int = 14,
) -> DataFrame:
    """Distinct-`item` estimate per `keys`, computed as a two-level
    rollup: sketch per (keys, partial_by) first — the materializable
    daily/partition partial — then union registers up to `keys`.
    With partial_by=None, a single sketch_agg level."""
    est = F.expr("hll_sketch_estimate(sk)").cast("bigint").alias("distinct_est")
    if partial_by is None:
        sk = df.groupBy(*keys).agg(F.expr(f"hll_sketch_agg({item}, {lg_k})").alias("sk"))
        return sk.select(*keys, est)
    partials = df.groupBy(*keys, partial_by).agg(
        F.expr(f"hll_sketch_agg({item}, {lg_k})").alias("sk")
    )
    merged = partials.groupBy(*keys).agg(F.expr("hll_union_agg(sk)").alias("sk"))
    return merged.select(*keys, est)


def kll_quantile_rollup(
    df: DataFrame,
    col: str,
    probs: list[float],
    partial_by: str | None = None,
    k: int = 1600,
) -> DataFrame:
    """Quantile estimates of double column `col` at ranks `probs` via
    KLL sketches — one row out, one small sketch per partial merged
    with `kll_merge_agg_double`. The streaming/rollup-friendly
    replacement for an exact global sort at 100 TB."""
    qcols = [
        F.expr(f"kll_sketch_get_quantile_double(sk, {p})").alias(f"q{int(p * 100):02d}")
        for p in probs
    ]
    n = F.expr("kll_sketch_get_n_double(sk)").cast("bigint").alias("n")
    if partial_by is None:
        sk = df.agg(F.expr(f"kll_sketch_agg_double({col}, {k})").alias("sk"))
        return sk.select(*qcols, n)
    partials = df.groupBy(partial_by).agg(
        F.expr(f"kll_sketch_agg_double({col}, {k})").alias("sk")
    )
    merged = partials.agg(F.expr("kll_merge_agg_double(sk)").alias("sk"))
    return merged.select(*qcols, n)


def theta_overlap(
    df: DataFrame,
    tag_col: str,
    item: str,
    tag_a: str,
    tag_b: str,
    lg_k: int = 14,
) -> DataFrame:
    """Set-algebra cardinalities between the distinct `item` sets
    tagged `tag_a` vs `tag_b`: |A|, |B|, |A∪B|, |A∩B|, |A\\B| — all
    from two theta sketches, no self-join of raw data."""
    sk = (
        df.filter(F.col(tag_col).isin(tag_a, tag_b))
        .groupBy(tag_col)
        .agg(F.expr(f"theta_sketch_agg({item}, {lg_k})").alias("sk"))
    )
    a = sk.filter(F.col(tag_col) == tag_a).select(F.col("sk").alias("sk_a"))
    b = sk.filter(F.col(tag_col) == tag_b).select(F.col("sk").alias("sk_b"))

    def _est(expr: str) -> Column:
        return F.expr(f"theta_sketch_estimate({expr})").cast("bigint")

    return a.crossJoin(b).select(
        _est("sk_a").alias("n_a"),
        _est("sk_b").alias("n_b"),
        _est("theta_union(sk_a, sk_b)").alias("n_union"),
        _est("theta_intersection(sk_a, sk_b)").alias("n_intersect"),
        _est("theta_difference(sk_a, sk_b)").alias("n_a_only"),
    )
