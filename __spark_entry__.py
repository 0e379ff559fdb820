"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's signature EDA
shape, SteelPred.py:57, on the sf0.001 fixtures). ``queries()`` /
``oracle_sql()`` expose the full workload from
``steel_energy_consumption_prediction_using_pyspark_spark.workload`` —
one entry per implemented operator from SURVEY.md §2, each with a
DuckDB oracle unless the operator is not SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from steel_energy_consumption_prediction_using_pyspark_spark.session import (
    apply_runtime_confs,
)
from steel_energy_consumption_prediction_using_pyspark_spark.workload import (
    all_oracles,
    all_queries,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship COMPOSITE on /root/testdata/sf0.001 (driver checks
    rows>0): rag_retrieve exercises a composed pipeline end-to-end —
    deterministic k-means quantizer training, IVF inverted-list
    assignment, multi-probe candidate generation, greedy MMR
    reranking, and the document-metadata join — so the smoke test
    fails if ANY stage of the engine's retrieval stack regresses, not
    just a scan+agg (round 9, VERDICT r8 #8)."""
    apply_runtime_confs(spark)
    return all_queries()["rag_retrieve"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qs = all_queries()

    def with_confs(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = getattr(fn, "__name__", "query")
        return wrapped

    return {name: with_confs(fn) for name, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return all_oracles()
