"""The driver-facing workload: named queries with DuckDB oracle SQL.

Each module contributes ``QUERIES: dict[name, callable(spark, sf_dir)
-> DataFrame]`` and ``ORACLES: dict[name, sql]``. A query without an
oracle entry gets the driver's weaker rows-only check (reserved for
genuinely non-SQL-expressible operators: LSH, ML fits, streaming).

Cross-engine determinism rules (every query follows these):
- float aggregates are wrapped in round(x, N) with identical arithmetic
  on both sides, so order-of-summation ulp noise cannot flip the hash;
- any top-k / row_number has a total-order tiebreak on a unique key;
- timestamps in output are formatted to 'yyyy-MM-dd HH:mm:ss' strings;
- count()/sum(int) are cast so both engines yield int64.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from steel_energy_consumption_prediction_using_pyspark_spark.workload import (
    behavior,
    core,
    curation,
    graph,
    linkage,
    maintenance,
    ml,
    multimodal,
    stats,
    text,
    tpch,
    vector,
)

_MODULES = [
    core,
    tpch,
    stats,
    text,
    vector,
    multimodal,
    ml,
    curation,
    graph,
    behavior,
    maintenance,
    linkage,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
