from steel_energy_consumption_prediction_using_pyspark_spark.sources.readers import (
    TPCH_TABLES,
    load_table,
    load_tables,
    read_csv,
    read_parquet,
    register_views,
)

__all__ = [
    "TPCH_TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_parquet",
    "register_views",
]
