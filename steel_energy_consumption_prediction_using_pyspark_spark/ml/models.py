"""The eight regressor families + hyperparameter grids (reference
M5-M12, SteelPred.py:237-265 and grids at :341-417).

Grids are byte-for-byte the reference's ParamGridBuilder contents so
tuned-model parity is checkable against BASELINE.md.
"""

from __future__ import annotations

from pyspark.ml.regression import (
    DecisionTreeRegressor,
    FMRegressor,
    GBTRegressor,
    GeneralizedLinearRegression,
    IsotonicRegression,
    LinearRegression,
    RandomForestRegressor,
)
from pyspark.ml.tuning import ParamGridBuilder

LABEL = "Usage_kWh"
FEATURES = "scaledFeatures"


def baseline_regressors(seed: int = 42) -> dict[str, object]:
    """Default-hyperparameter models (reference SteelPred.py:237-265).
    Seeded where the estimator accepts a seed so runs reproduce."""
    common = dict(featuresCol=FEATURES, labelCol=LABEL)
    return {
        "LinearRegression": LinearRegression(**common),
        "DecisionTreeRegressor": DecisionTreeRegressor(seed=seed, **common),
        "RandomForestRegressor": RandomForestRegressor(seed=seed, **common),
        "GBTRegressor": GBTRegressor(seed=seed, **common),
        "FMRegressor": FMRegressor(seed=seed, **common),
        "GLR_poisson": GeneralizedLinearRegression(
            family="poisson", link="log", **common
        ),
        "GLR_tweedie": GeneralizedLinearRegression(family="tweedie", **common),
        "IsotonicRegression": IsotonicRegression(**common),
    }


def param_grids(models: dict[str, object]) -> dict[str, list]:
    """The reference's exact grids (SteelPred.py:341-417)."""
    g: dict[str, list] = {}

    lr = models["LinearRegression"]
    g["LinearRegression"] = (
        ParamGridBuilder()
        .addGrid(lr.regParam, [0.01, 0.1, 0.5])
        .addGrid(lr.fitIntercept, [True, False])
        .addGrid(lr.elasticNetParam, [0.0, 0.5, 1.0])
        .build()
    )

    dt = models["DecisionTreeRegressor"]
    g["DecisionTreeRegressor"] = (
        ParamGridBuilder()
        .addGrid(dt.maxDepth, [2, 5, 10])
        .addGrid(dt.maxBins, [32, 64, 128])
        .build()
    )

    rf = models["RandomForestRegressor"]
    g["RandomForestRegressor"] = (
        ParamGridBuilder()
        .addGrid(rf.numTrees, [10, 20, 50])
        .addGrid(
            rf.featureSubsetStrategy, ["all", "auto", "onethird", "sqrt", "log2"]
        )
        .build()
    )

    gbt = models["GBTRegressor"]
    g["GBTRegressor"] = (
        ParamGridBuilder()
        .addGrid(gbt.maxDepth, [5, 10])
        .addGrid(gbt.maxIter, [10, 20])
        .build()
    )

    fm = models["FMRegressor"]
    g["FMRegressor"] = (
        ParamGridBuilder()
        .addGrid(fm.stepSize, [0.001, 0.01, 0.1])
        .addGrid(fm.factorSize, [4, 8, 16])
        .build()
    )

    glp = models["GLR_poisson"]
    g["GLR_poisson"] = (
        ParamGridBuilder()
        .addGrid(glp.regParam, [0.01, 0.1, 0.5])
        .addGrid(glp.fitIntercept, [True, False])
        .build()
    )

    glt = models["GLR_tweedie"]
    g["GLR_tweedie"] = (
        ParamGridBuilder()
        .addGrid(glt.regParam, [0.01, 0.1, 0.5])
        .addGrid(glt.fitIntercept, [True, False])
        .addGrid(glt.variancePower, [0.0, 1.0])
        .build()
    )

    iso = models["IsotonicRegression"]
    g["IsotonicRegression"] = (
        ParamGridBuilder().addGrid(iso.isotonic, [True, False]).build()
    )
    return g
