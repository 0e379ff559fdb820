from steel_energy_consumption_prediction_using_pyspark_spark.operators import (
    relational,
)

__all__ = ["relational"]
