"""Feature pipeline (reference M1-M4, SteelPred.py:168-180).

Stage layout matches the persisted reference artifact
(`pipeline/metadata` + `pipeline/stages/{0..5}_*`): three
StringIndexers (frequencyDesc, the default — most frequent label → 0)
→ VectorAssembler over the 6 numeric + 3 indexed columns with
handleInvalid="skip" (the reference's implicit null filter, P7) →
StandardScaler (withStd, no mean — the reference defaults).

One deliberate divergence (reference quirk Q1, SURVEY.md §2.13): the
reference saves the UNFITTED Pipeline (class
org.apache.spark.ml.Pipeline in pipeline/metadata/part-*.txt:1); this
engine persists the fitted PipelineModel, which is what serving needs.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import StandardScaler, StringIndexer, VectorAssembler
from pyspark.sql import DataFrame

# Reference feature sets (SteelPred.py:168-172).
CATEGORICAL_COLS = ["Day_of_week", "Load_Type", "WeekStatus"]
NUMERIC_COLS = [
    "Lagging_Current_Reactive_Power_kVarh",
    "Leading_Current_Reactive_Power_kVarh",
    "CO2",
    "Lagging_Current_Power_Factor",
    "Leading_Current_Power_Factor",
    "NSM",
]
LABEL_COL = "Usage_kWh"


def feature_stages(
    categorical: list[str] | None = None,
    numeric: list[str] | None = None,
    scaled_col: str = "scaledFeatures",
) -> list:
    categorical = CATEGORICAL_COLS if categorical is None else categorical
    numeric = NUMERIC_COLS if numeric is None else numeric
    indexers = [
        StringIndexer(inputCol=c, outputCol=f"{c}_index") for c in categorical
    ]
    assembler = VectorAssembler(
        inputCols=numeric + [f"{c}_index" for c in categorical],
        outputCol="features",
        handleInvalid="skip",
    )
    scaler = StandardScaler(inputCol="features", outputCol=scaled_col)
    return [*indexers, assembler, scaler]


def build_pipeline(regressor, **kwargs) -> Pipeline:
    """6-stage pipeline: features + regressor (reference
    SteelPred.py:178-180)."""
    return Pipeline(stages=[*feature_stages(**kwargs), regressor])


def save_fitted(model: PipelineModel, path: str) -> None:
    model.write().overwrite().save(path)


def load_fitted(path: str) -> PipelineModel:
    return PipelineModel.load(path)
