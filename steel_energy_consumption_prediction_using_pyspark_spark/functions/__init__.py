from steel_energy_consumption_prediction_using_pyspark_spark.functions.scalar import (
    datetime_features,
    format_number_col,
    histogram,
    parse_reference_date,
)

__all__ = [
    "datetime_features",
    "format_number_col",
    "histogram",
    "parse_reference_date",
]
