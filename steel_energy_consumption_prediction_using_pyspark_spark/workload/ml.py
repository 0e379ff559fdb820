"""ML workload entries (rows-only: MLlib fits have no DuckDB-SQL
equivalent — the driver records the weaker check; the full invariants
live in tests/test_ml.py).

Runs on the synthetic steel_energy fixture (sources/steel.py), sized
down so the driver's per-query budget stays sane: the point here is
the end-to-end fit→transform→evaluate dataflow (reference entry point
C, SURVEY.md §3.3), not model quality — tests pin quality on the
bigger fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steel_energy_consumption_prediction_using_pyspark_spark.ml.evaluate import (
    comparison_table,
    evaluate_predictions,
)
from steel_energy_consumption_prediction_using_pyspark_spark.ml.models import (
    baseline_regressors,
)
from steel_energy_consumption_prediction_using_pyspark_spark.ml.pipeline import (
    build_pipeline,
    feature_stages,
)
from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import T
from steel_energy_consumption_prediction_using_pyspark_spark.sources.steel import (
    steel_energy,
)

QUERY_ROWS = 96 * 30  # one month of 15-min intervals


def q_ml_feature_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature stages only (M1-M3): index 3 categoricals, assemble 9
    features, scale. Output: per-Load_Type feature stats proving the
    indexer ordinals follow frequencyDesc and the vectors exist."""
    from pyspark.ml import Pipeline

    data = steel_energy(spark, QUERY_ROWS)
    model = Pipeline(stages=feature_stages()).fit(data)
    out = model.transform(data)
    return (
        out.groupBy("Load_Type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("Load_Type_index").alias("load_type_index"),
            F.round(F.avg("Usage_kWh"), 2).alias("avg_usage"),
        )
        .orderBy("load_type_index")
    )


def q_ml_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit LinearRegression + DecisionTree pipelines on a seeded 75/25
    split (reference R1 seed=64, SteelPred.py:155) and return the
    ranked comparison table (reference SteelPred.py:283-294)."""
    data = steel_energy(spark, QUERY_ROWS).coalesce(4)
    train, test = data.randomSplit([0.75, 0.25], seed=64)
    models = baseline_regressors()
    results = {}
    for name in ("LinearRegression", "DecisionTreeRegressor"):
        fitted = build_pipeline(models[name]).fit(train)
        preds = fitted.transform(test)
        results[name] = evaluate_predictions(preds)
    return comparison_table(spark, results)


def q_steel_eda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's signature EDA chain, verbatim shape
    (SteelPred.py:57): groupBy → dict-style avg agg (auto-named
    `avg(Usage_kWh)`) → orderBy desc → withColumnRenamed →
    format_number STRING output. FULL oracle since round 4: the
    fixture's portable-md5 noise lets DuckDB regenerate the table and
    replay the chain (see ORACLES["steel_eda"]); printf('%.2f')
    matches format_number's HALF_EVEN on these sub-1000 averages
    (no thousands separator in range)."""
    data = steel_energy(spark, QUERY_ROWS)
    return (
        data.groupBy("Day_of_week")
        .agg({"Usage_kWh": "avg"})
        .orderBy("avg(Usage_kWh)", ascending=False)
        .withColumnRenamed("avg(Usage_kWh)", "avg_energy_consumption")
        .select(
            "Day_of_week",
            F.format_number("avg_energy_consumption", 2).alias(
                "avg_energy_consumption"
            ),
        )
    )


def q_string_indexer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 with a real oracle: fit MLlib StringIndexer
    (stringOrderType=frequencyDesc, the reference's default —
    SteelPred.py:168-170) on a fixture column and emit its
    label→ordinal table. The fitted mapping is deterministic and
    SQL-expressible — row_number over (count DESC, label ASC); the
    fixture even has a frequency TIE (2-HIGH/3-MEDIUM), so the
    alphabetical tiebreak the indexer documents is genuinely
    exercised. Bridges the ML surface into the oracle gate."""
    from pyspark.ml.feature import StringIndexer

    o = T(spark, sf_dir, "orders")
    model = StringIndexer(
        inputCol="o_orderpriority",
        outputCol="idx",
        stringOrderType="frequencyDesc",
    ).fit(o)
    labels = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    return (
        model.transform(labels)
        .select(F.col("o_orderpriority").alias("label"), "idx", "n")
        .orderBy("label")
    )


def q_scaler_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2+M3 with a real oracle: assemble lineitem's four measures,
    fit StandardScaler (defaults withStd=true/withMean=false —
    pipeline/stages/4_StandardScaler metadata), and emit the fitted
    per-feature mean/std table. Summarizer's fitted moments equal SQL
    avg/stddev_samp, so the fit itself is oracle-checked."""
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = T(spark, sf_dir, "lineitem").select(*cols)
    assembled = VectorAssembler(inputCols=cols, outputCol="features").transform(li)
    model = StandardScaler(inputCol="features", outputCol="scaled").fit(assembled)
    rows = [
        (c, float(model.mean[i]), float(model.std[i])) for i, c in enumerate(cols)
    ]
    raw = spark.createDataFrame(rows, "feature string, mean double, std double")
    return raw.select(
        "feature",
        F.round("mean", 3).alias("mean"),
        F.round("std", 3).alias("std"),
    ).orderBy("feature")


def q_evaluator_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M13 with a real oracle: all five RegressionEvaluator metrics on
    a deterministic prediction column (0.95·x + 10), returned as a
    local-rows DataFrame (the reference's S5 createDataFrame shape,
    SteelPred.py:274-292). Formulas pinned empirically: mse/rmse/mae
    are plain averages, r2 = 1 − SSres/SStot, and `var` (explained
    variance, quirk Q4) is mean((pred − mean(label))²) — population-
    style, centered on the LABEL mean. Large metrics are rescaled
    before rounding so summation-order noise cannot flip a digit."""
    from pyspark.ml.evaluation import RegressionEvaluator

    li = T(spark, sf_dir, "lineitem")
    preds = li.select(
        F.col("l_extendedprice").alias("label"),
        (F.col("l_extendedprice") * 0.95 + 10.0).alias("prediction"),
    )
    vals = {
        m: RegressionEvaluator(
            labelCol="label", predictionCol="prediction", metricName=m
        ).evaluate(preds)
        for m in ("rmse", "mse", "mae", "r2", "var")
    }
    raw = spark.createDataFrame(
        [(vals["rmse"], vals["mse"], vals["mae"], vals["r2"], vals["var"])],
        "rmse double, mse double, mae double, r2 double, var double",
    )
    return raw.select(
        F.round("rmse", 3).alias("rmse"),
        F.round(F.col("mse") / 1e6, 4).alias("mse_m"),
        F.round("mae", 3).alias("mae"),
        F.round("r2", 6).alias("r2"),
        F.round(F.col("var") / 1e6, 2).alias("var_m"),
    )


QUERIES = {
    "ml_feature_pipeline": q_ml_feature_pipeline,
    "ml_regression": q_ml_regression,
    "steel_eda": q_steel_eda,
    "string_indexer": q_string_indexer,
    "scaler_stats": q_scaler_stats,
    "evaluator_metrics": q_evaluator_metrics,
}

# DuckDB twin of the generated steel fixture (round 4, VERDICT r3 #4):
# the noise family is the portable md5 recipe (sources/steel.py::
# _noise), so DuckDB re-derives the generated table row by row — same
# timestamp grid, same dayparts, same uniform draws. Every float
# literal is eN-typed so DuckDB parses doubles, not decimals;
# association parenthesized exactly as the Catalyst expression. Shared
# by the steel_eda and ml_feature_pipeline oracles.
def _steel_fixture_sql(n_rows: int) -> str:
    """CTE fragment yielding relation steel(dow, h, load_type, usage)."""
    return f"""
        _steel_n AS (
            SELECT range AS id,
                   TIMESTAMP '2018-01-01 00:00:00'
                   + range * INTERVAL 900 SECOND AS ts
            FROM range({n_rows})
        ), _steel_x AS (
            SELECT dayname(ts) AS dow, hour(ts) AS h,
                   dayname(ts) IN ('Saturday', 'Sunday') AS wkend,
                   CAST('0x' || substr(md5(id || ':1'), 1, 8) AS UBIGINT)
                       / 4294967296.0e0 AS u1,
                   CAST('0x' || substr(md5(id || ':7'), 1, 8) AS UBIGINT)
                       / 4294967296.0e0 AS u7
            FROM _steel_n
        ), steel AS (
            SELECT dow, h,
                   CASE WHEN h < 12 THEN 'Light_Load'
                        WHEN h < 19 THEN 'Medium_Load'
                        ELSE 'Maximum_Load' END AS load_type,
                   round((CASE WHEN h < 3 THEN 5.0e0 WHEN h < 6 THEN 9.0e0
                               WHEN h < 9 THEN 16.0e0 WHEN h < 12 THEN 30.0e0
                               WHEN h < 15 THEN 48.0e0 WHEN h < 18 THEN 60.0e0
                               WHEN h < 21 THEN 70.0e0 ELSE 52.0e0 END
                          * CASE WHEN wkend THEN 0.55e0 ELSE 1.0e0 END
                          * (0.93e0 + 0.14e0 * u1 * u1)
                          + u7), 2) AS usage
            FROM _steel_x
        )"""


ORACLES: dict[str, str] = {
    # printf('%.2f') mirrors format_number's HALF_EVEN (sub-1000
    # averages: no thousands separator in range).
    "steel_eda": f"""
        WITH {_steel_fixture_sql(QUERY_ROWS)}
        SELECT dow AS Day_of_week,
               printf('%.2f', avg(usage)) AS avg_energy_consumption
        FROM steel GROUP BY dow
    """,
    # ml_feature_pipeline: the fitted StringIndexer ordinal is the
    # frequencyDesc rank (count DESC, label ASC — the tiebreak MLlib
    # documents and string_indexer already pins), and n/avg_usage come
    # straight off the regenerated fixture — so the MLlib fit's
    # OBSERVABLE output is fully value-checked even though the fit
    # itself runs in MLlib.
    "ml_feature_pipeline": f"""
        WITH {_steel_fixture_sql(QUERY_ROWS)},
        counts AS (
            SELECT load_type, CAST(count(*) AS BIGINT) AS n,
                   round(avg(usage), 2) AS avg_usage
            FROM steel GROUP BY load_type
        )
        SELECT load_type AS Load_Type, n,
               CAST(row_number() OVER (ORDER BY n DESC, load_type ASC) - 1
                    AS DOUBLE) AS load_type_index,
               avg_usage
        FROM counts
    """,
    "scaler_stats": """
        WITH long AS (
            UNPIVOT (
                SELECT l_quantity, l_extendedprice, l_discount, l_tax
                FROM lineitem
            ) ON l_quantity, l_extendedprice, l_discount, l_tax
            INTO NAME feature VALUE v
        )
        SELECT feature,
               round(avg(v), 3) AS mean,
               round(stddev_samp(v), 3) AS std
        FROM long GROUP BY feature ORDER BY feature
    """,
    "evaluator_metrics": """
        WITH p AS (
            SELECT l_extendedprice AS label,
                   l_extendedprice * 0.95e0 + 10e0 AS prediction
            FROM lineitem
        ),
        s AS (
            SELECT avg(label) AS ml,
                   CAST(count(*) AS DOUBLE) AS n,
                   avg((label - prediction) * (label - prediction)) AS mse,
                   avg(abs(label - prediction)) AS mae,
                   sum((label - prediction) * (label - prediction)) AS ssres
            FROM p
        )
        SELECT round(sqrt(s.mse), 3) AS rmse,
               round(s.mse / 1e6, 4) AS mse_m,
               round(s.mae, 3) AS mae,
               round(1e0 - s.ssres
                     / (SELECT sum((label - s.ml) * (label - s.ml)) FROM p), 6)
                   AS r2,
               round((SELECT sum((prediction - s.ml) * (prediction - s.ml)) FROM p)
                     / s.n / 1e6, 2) AS var_m
        FROM s
    """,
    "string_indexer": """
        WITH counts AS (
            SELECT o_orderpriority AS label, CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY 1
        )
        SELECT label,
               CAST(row_number() OVER (ORDER BY n DESC, label ASC) - 1
                    AS DOUBLE) AS idx,
               n
        FROM counts ORDER BY label
    """,
}
