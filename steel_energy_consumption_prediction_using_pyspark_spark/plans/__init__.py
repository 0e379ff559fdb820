from steel_energy_consumption_prediction_using_pyspark_spark.plans.inspect import (
    assert_broadcast_join,
    assert_pushed_filters,
    assert_read_schema_pruned,
    assert_whole_stage_codegen,
    physical_plan,
)

__all__ = [
    "assert_broadcast_join",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
    "assert_whole_stage_codegen",
    "physical_plan",
]
