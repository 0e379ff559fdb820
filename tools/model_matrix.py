"""Fit all eight reference regressor families on the steel fixture and
print the ranked comparison table next to the reference's published
metrics (BASELINE.md) — the model-quality parity artifact.

Usage: python tools/model_matrix.py [n_days=180]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Reference baselines (BASELINE.md, default hyperparameters, test set).
REFERENCE_R2 = {
    "GBTRegressor": 0.992671,
    "DecisionTreeRegressor": 0.987733,
    "LinearRegression": 0.978373,
    "GLR_tweedie": 0.978373,
    "RandomForestRegressor": 0.977120,
    "GLR_poisson": 0.944979,
    "FMRegressor": 0.892570,
    "IsotonicRegression": 0.850908,
}


def main() -> None:
    n_days = int(sys.argv[1]) if len(sys.argv) > 1 else 180

    from steel_energy_consumption_prediction_using_pyspark_spark.ml.evaluate import (
        evaluate_predictions,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.ml.models import (
        baseline_regressors,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.ml.pipeline import (
        build_pipeline,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.session import (
        get_session,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.sources.steel import (
        steel_energy,
    )

    spark = get_session("model-matrix")
    data = steel_energy(spark, 96 * n_days).coalesce(8).cache()
    data.count()
    train, test = data.randomSplit([0.75, 0.25], seed=64)
    train.cache().count()
    test.cache().count()

    print(f"{'model':24} {'R2':>8} {'refR2':>8} {'RMSE':>9} {'MAE':>9} {'sec':>6}")
    results = []
    for name, reg in baseline_regressors().items():
        t0 = time.time()
        fitted = build_pipeline(reg).fit(train)
        m = evaluate_predictions(fitted.transform(test))
        dt = time.time() - t0
        results.append((m["r2"], name, m, dt))
    for r2, name, m, dt in sorted(results, reverse=True):
        print(
            f"{name:24} {r2:8.4f} {REFERENCE_R2[name]:8.4f}"
            f" {m['rmse']:9.4f} {m['mae']:9.4f} {dt:6.1f}"
        )


if __name__ == "__main__":
    main()
