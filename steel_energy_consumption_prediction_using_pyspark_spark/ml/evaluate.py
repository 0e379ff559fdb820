"""Evaluation (reference M13, SteelPred.py:213-222) and the
model-comparison table (SteelPred.py:274-292).

The 5 metrics and their quirks are preserved knowledge: `var`
(explained variance) is UNNORMALIZED (values ~1100 on the reference
data — quirk Q4), and rmse ≡ sqrt(mse) is pinned by tests.
"""

from __future__ import annotations

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

METRICS = ("r2", "rmse", "mae", "mse", "var")

# Comparison-table schema (reference SteelPred.py:274-281).
COMPARISON_SCHEMA = StructType(
    [
        StructField("Model", StringType(), True),
        StructField("R2", DoubleType(), True),
        StructField("RMSE", DoubleType(), True),
        StructField("MAE", DoubleType(), True),
        StructField("MSE", DoubleType(), True),
        StructField("Explained_Variance", DoubleType(), True),
    ]
)


def evaluate_predictions(
    predictions: DataFrame,
    label_col: str = "Usage_kWh",
    prediction_col: str = "prediction",
) -> dict[str, float]:
    """All five RegressionEvaluator metrics, one aggregate job each —
    over a PERSISTED (label, prediction) projection, so the upstream
    chain (fixture generation → split → 6-stage pipeline transform)
    executes once instead of once per metric (round 9: five evaluate()
    actions each replayed the full transform; caching the two-column
    projection changes no values — the evaluator reads exactly these
    columns and the partitioning is untouched)."""
    proj = predictions.select(label_col, prediction_col).persist()
    try:
        out = {}
        for m in METRICS:
            ev = RegressionEvaluator(
                labelCol=label_col, predictionCol=prediction_col, metricName=m
            )
            out[m] = ev.evaluate(proj)
    finally:
        proj.unpersist(blocking=False)
    return out


def comparison_table(
    spark: SparkSession, results: dict[str, dict[str, float]]
) -> DataFrame:
    """Ranked model-comparison table, descending R2 (reference
    SteelPred.py:283-292 — including its orderBy('R2', descending))."""
    rows = [
        (
            name,
            m.get("r2"),
            m.get("rmse"),
            m.get("mae"),
            m.get("mse"),
            m.get("var"),
        )
        for name, m in results.items()
    ]
    df = spark.createDataFrame(rows, COMPARISON_SCHEMA)
    return df.orderBy(df.R2.desc())
