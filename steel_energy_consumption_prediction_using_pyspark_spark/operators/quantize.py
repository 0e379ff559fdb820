"""Embedding quantization: int8 storage path for the similarity tier.

At 100 TB an fp32 embedding column is usually the single largest
column in the lake; symmetric max-abs scalar quantization stores it as
array<tinyint> + one float scale per vector — 4× smaller before
parquet compression, with ~0.999 cosine fidelity on typical
embeddings. Dequantization composes with every operator in
operators/similarity.py (brute-force, LSH, IVF) since they only need
an array<double>.

All transforms are built-in higher-order functions (JVM-side codegen,
no Python). Per NOTES.md rule 6/7: lambdas use explicit single
parameters, and the scale is staged as a named column before the HOF
pass so it is not re-evaluated per element.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_int8(
    df: DataFrame, col: str = "embedding", qcol: str = "q", scale_col: str = "q_scale"
) -> DataFrame:
    """Append `qcol` (array<tinyint>) and `scale_col` (float): each
    component mapped to round(x / scale * 127) with scale = max|x|.
    Zero vectors get scale 1.0 (quantize to all-zeros losslessly)."""
    absmax = F.aggregate(
        F.col(col),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    staged = df.withColumn(scale_col, F.when(absmax > 0, absmax).otherwise(F.lit(1.0)))
    q = F.transform(
        F.col(col),
        lambda x: F.round(x.cast("double") / F.col(scale_col) * 127).cast("tinyint"),
    )
    return staged.withColumn(qcol, q).withColumn(scale_col, F.col(scale_col).cast("float"))


def dequantize(qcol: Column | str, scale_col: Column | str) -> Column:
    """array<double> reconstruction: q * scale / 127."""
    qcol = F.col(qcol) if isinstance(qcol, str) else qcol
    scale = F.col(scale_col) if isinstance(scale_col, str) else scale_col
    return F.transform(qcol, lambda x: x.cast("double") * scale / 127)


def with_dequantized(
    df: DataFrame, qcol: str = "q", scale_col: str = "q_scale", out: str = "embedding"
) -> DataFrame:
    return df.withColumn(out, dequantize(qcol, scale_col))
