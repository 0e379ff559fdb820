"""Z-order layout (sources/layout.py): every indexed column stays
locally clustered, so min-max file skipping works for filters on any
of them — unlike a linear sort, which only helps its leading column."""

import pytest
from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.sources.layout import (
    file_stats,
    with_zorder_code,
    zorder_write,
)
from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T

N_FILES = 16


def _skippable_fraction(stats_rows, col, lo, hi):
    """Fraction of files whose [min, max] interval proves they hold no
    rows with col in [lo, hi] — a reader skips those outright."""
    skipped = sum(
        1
        for r in stats_rows
        if r[f"max_{col}"] < lo or r[f"min_{col}"] > hi
    )
    return skipped / len(stats_rows)


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    zdir = str(tmp_path_factory.mktemp("layout") / "zorder")
    ldir = str(tmp_path_factory.mktemp("layout") / "linear")
    zorder_write(base, zdir, ["o_custkey", "o_totalprice"], num_files=N_FILES)
    (
        base.repartitionByRange(N_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(ldir)
    )
    zstats = file_stats(spark.read.parquet(zdir), ["o_custkey", "o_totalprice"]).collect()
    lstats = file_stats(spark.read.parquet(ldir), ["o_custkey", "o_totalprice"]).collect()
    return base, zstats, lstats


def test_zorder_preserves_rows(spark, layouts, tmp_path):
    base, zstats, _ = layouts
    assert sum(r.n_rows for r in zstats) == base.count()
    assert len(zstats) > 1


def test_zorder_skips_on_both_dimensions(layouts):
    base, zstats, lstats = layouts
    ck = base.agg(F.min("o_custkey"), F.max("o_custkey")).collect()[0]
    tp = base.agg(F.min("o_totalprice"), F.max("o_totalprice")).collect()[0]
    # a ~6%-wide range predicate on each dimension
    ck_lo = ck[0] + (ck[1] - ck[0]) * 0.50
    ck_hi = ck[0] + (ck[1] - ck[0]) * 0.56
    tp_lo = tp[0] + (tp[1] - tp[0]) * 0.50
    tp_hi = tp[0] + (tp[1] - tp[0]) * 0.56

    z_ck = _skippable_fraction(zstats, "o_custkey", ck_lo, ck_hi)
    z_tp = _skippable_fraction(zstats, "o_totalprice", tp_lo, tp_hi)
    l_ck = _skippable_fraction(lstats, "o_custkey", ck_lo, ck_hi)
    l_tp = _skippable_fraction(lstats, "o_totalprice", tp_lo, tp_hi)

    # linear layout: perfect on its sort column, useless on the other
    assert l_ck >= 0.8
    assert l_tp == 0.0
    # z-order: substantial skipping on BOTH dimensions
    assert z_ck >= 0.5, (z_ck, z_tp)
    assert z_tp >= 0.5, (z_ck, z_tp)


def test_morton_code_orders_quadrants(spark):
    # 2-bit toy: the z-curve visits quadrants in (0,0),(1,0),(0,1),(1,1)
    # order — x owns even bit positions, y odd.
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], ["x", "y"]
    )
    coded = with_zorder_code(df, ["x", "y"], nbits=2)
    got = {(r.x, r.y): r._zcode for r in coded.collect()}
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 3)] == 15
