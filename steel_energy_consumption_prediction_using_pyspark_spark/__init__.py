"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference notebook
(SayamAlt/Steel-Energy-Consumption-Prediction-using-PySpark), rebuilt
Spark-first and extended with LLM-data-pipeline operators.

Everything here is built on the public Apache Spark DataFrame / SQL /
MLlib / Structured Streaming APIs. The reference (a single Databricks
notebook, see SURVEY.md) defines WHAT we compute; this package defines
HOW: declarative logical plans optimized by Catalyst, broadcast joins
for dims, partial aggregation, Arrow-vectorized Pandas UDFs only where
built-ins cannot express the semantics.

Layout (SURVEY.md §7.1):
  session.py   SparkSession factory (AQE, Arrow, UTC, sane shuffle parallelism)
  sources/     readers/writers, table registry, steel fixture generator
  operators/   relational core + dedup/similarity/text/multimodal extensions
  functions/   scalar function surface (datetime family, histogram, etc.)
  plans/       plan inspection: pushdown/broadcast/codegen assertions
  streaming/   structured-streaming windows + stateful ops
  ml/          feature pipeline, 8 regressor families, tuning, evaluation
"""

from steel_energy_consumption_prediction_using_pyspark_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
