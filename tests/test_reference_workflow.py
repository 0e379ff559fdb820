"""End-to-end replay of the reference notebook (SteelPred.py, all 66
cells' worth of dataflow) on this engine — the 'a reference user can
switch' guarantee, as one integration test:

raw CSV (dotted/parenthesized headers) → inferSchema ingest →
normalization → EDA aggregates → temp-view SQL → corr → seeded split →
feature pipeline → regressor → 5-metric evaluation → TVS tuning →
fitted-pipeline persistence → reload → identical predictions.
"""

import pytest
from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.ml.evaluate import (
    evaluate_predictions,
)
from steel_energy_consumption_prediction_using_pyspark_spark.ml.models import (
    baseline_regressors,
)
from steel_energy_consumption_prediction_using_pyspark_spark.ml.pipeline import (
    build_pipeline,
    load_fitted,
    save_fitted,
)
from steel_energy_consumption_prediction_using_pyspark_spark.ml.tuning import tvs_fit
from steel_energy_consumption_prediction_using_pyspark_spark.sources.readers import (
    read_csv,
)
from steel_energy_consumption_prediction_using_pyspark_spark.sources.steel import (
    steel_energy,
)

RAW_RENAMES = {
    "Lagging_Current_Reactive_Power_kVarh": "Lagging_Current_Reactive.Power_kVarh",
    "CO2": "CO2(tCO2)",
}


@pytest.fixture(scope="module")
def steel_csv(spark, tmp_path_factory):
    """Write the fixture as the RAW reference CSV (dotted/parenthesized
    headers, SteelPred's actual input shape data.csv:1)."""
    raw = steel_energy(spark, 96 * 60)
    for clean, rawname in RAW_RENAMES.items():
        raw = raw.withColumnRenamed(clean, rawname)
    path = str(tmp_path_factory.mktemp("ref") / "steel.csv")
    raw.coalesce(1).write.option("header", True).mode("overwrite").csv(path)
    return path


def test_reference_workflow_end_to_end(spark, steel_csv, tmp_path):
    # -- ingest (SteelPred.py:27: inferSchema + header) ------------------
    data = read_csv(spark, steel_csv)  # normalization replaces :139-146
    assert data.count() == 96 * 60
    dtypes = dict(data.dtypes)
    assert dtypes["Usage_kWh"] == "double" and dtypes["NSM"] == "int"

    # -- EDA (SteelPred.py:45-92) ----------------------------------------
    counts = {r.Load_Type: r["count"] for r in data.groupBy("Load_Type").count().collect()}
    assert counts["Light_Load"] > counts["Medium_Load"] > counts["Maximum_Load"]
    ranked = (
        data.groupBy("Day_of_week")
        .agg({"Usage_kWh": "avg"})
        .orderBy("avg(Usage_kWh)", ascending=False)
        .withColumnRenamed("avg(Usage_kWh)", "avg_energy_consumption")
        .select("Day_of_week", F.format_number("avg_energy_consumption", 2).alias("avg"))
        .collect()
    )
    assert len(ranked) == 7 and all("." in r.avg for r in ranked)

    # -- SQL over temp view (SteelPred.py:106-111) -----------------------
    data.createOrReplaceTempView("steel_energy")
    sql_out = spark.sql(
        """
        SELECT Day_of_week, SUM(NSM) AS total_nsm,
               (SELECT MAX(Usage_kWh) FROM steel_energy) AS peak
        FROM steel_energy GROUP BY Day_of_week
        """
    ).collect()
    assert len(sql_out) == 7 and all(r.peak > 0 for r in sql_out)

    # -- corr (SteelPred.py:125) -----------------------------------------
    assert data.select(F.corr("CO2", "Usage_kWh")).collect()[0][0] > 0.95

    # -- split + pipeline + evaluate (SteelPred.py:155-222) --------------
    train, test = data.randomSplit([0.75, 0.25], seed=64)
    models = baseline_regressors()
    fitted = build_pipeline(models["DecisionTreeRegressor"]).fit(train)
    metrics = evaluate_predictions(fitted.transform(test))
    assert metrics["r2"] > 0.9  # reference band: DT 0.9877

    # -- tuning (SteelPred.py:318-319, DT grid :351-357) -----------------
    dt = models["DecisionTreeRegressor"]
    from pyspark.ml.tuning import ParamGridBuilder

    grid = ParamGridBuilder().addGrid(dt.maxDepth, [5, 10]).build()
    tuned = tvs_fit(build_pipeline(dt), grid, train)
    tuned_metrics = evaluate_predictions(tuned.transform(test))
    assert tuned_metrics["r2"] >= metrics["r2"] - 0.01  # tuning not worse

    # -- persistence (SteelPred.py:482; fitted model, fixing Q1) ---------
    path = str(tmp_path / "ref_pipeline")
    save_fitted(tuned.bestModel, path)
    reloaded = load_fitted(path)
    a = [r.prediction for r in tuned.bestModel.transform(test).select("prediction").collect()]
    b = [r.prediction for r in reloaded.transform(test).select("prediction").collect()]
    assert a == b
