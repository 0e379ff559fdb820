"""Multi-dimensional data layout: Z-order clustering for scan skipping.

At 100 TB, the cheapest query is the one that never reads the data:
parquet keeps per-row-group/file min-max stats, and readers skip units
whose [min, max] interval excludes the predicate. A linear sort makes
that work for ONE column; Z-ordering (interleaving the bits of several
columns into one Morton code, then range-partitioning + sorting by the
code) keeps EVERY indexed column locally clustered, so selective
filters on any of them skip most files.

Everything is built-in Catalyst expressions (shiftright/and/or — bit
twiddling is codegen'd JVM arithmetic, no UDF). The two-pass shape
(one tiny min/max agg, then the write) is the standard layout-job
trade: pay one extra scan at write time, save it on every read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, cmin: Column, cmax: Column, nbits: int) -> Column:
    """Affine-scale a numeric column to an integer in [0, 2^nbits)."""
    span = F.when(cmax > cmin, cmax - cmin).otherwise(F.lit(1.0))
    unit = (col.cast("double") - cmin) / span
    top = F.lit((1 << nbits) - 1)
    return F.least(F.floor(unit * (1 << nbits)).cast("bigint"), top.cast("bigint"))


def morton_code(scaled: list[Column], nbits: int) -> Column:
    """Interleave the low `nbits` bits of each already-scaled integer
    column into one Morton code (column i owns bit positions
    i, i+d, i+2d, ... for d dimensions)."""
    d = len(scaled)
    code = F.lit(0).cast("bigint")
    for i, c in enumerate(scaled):
        for bit in range(nbits):
            code = code.bitwiseOR(
                F.shiftleft(F.shiftright(c, bit).bitwiseAND(F.lit(1)), bit * d + i)
            )
    return code


def with_zorder_code(df: DataFrame, cols: list[str], nbits: int = 10) -> DataFrame:
    """Append a `_zcode` Morton-code column over `cols` (numeric).
    Min/max are computed in one small aggregate and broadcast-joined
    back (a 1-row cross join — no shuffle of the fact side)."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_mx_{c}") for c in cols],
    )
    joined = df.crossJoin(F.broadcast(stats))
    scaled = [
        _scale_to_bits(F.col(c), F.col(f"_mn_{c}"), F.col(f"_mx_{c}"), nbits) for c in cols
    ]
    out = joined.withColumn("_zcode", morton_code(scaled, nbits))
    return out.drop(*[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols])


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    nbits: int = 10,
    num_files: int = 16,
) -> None:
    """Write `df` as parquet Z-ordered on `cols`: range-partition by
    the Morton code (each output file owns a contiguous z-range — a
    compact hyper-rectangle union in col-space), sort within
    partitions so row groups inherit the clustering, drop the code."""
    coded = with_zorder_code(df, cols, nbits)
    (
        coded.repartitionByRange(num_files, "_zcode")
        .sortWithinPartitions("_zcode")
        .drop("_zcode")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(df_read: DataFrame, cols: list[str]) -> DataFrame:
    """Per-file min/max of `cols` for a parquet-backed DataFrame —
    the skipping-power diagnostic used by tests/test_layout.py."""
    per_file = df_read.withColumn("_file", F.input_file_name())
    return per_file.groupBy("_file").agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[x for c in cols for x in (F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}"))],
    )
