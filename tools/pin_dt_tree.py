"""Regenerate workload/ml.py::_DT_PINNED — the literal structure of
the deterministic single-partition DecisionTree fit that
q_ml_regression's DuckDB twin applies as a CASE tree.

Run after any change to the steel fixture, the feature pipeline, the
split, or the Spark version, then paste the printed literal over
_DT_PINNED. tests/test_ml.py::test_dt_pinned_structure_matches_live
fails loudly when the live fit drifts from the pin.

Node encoding (plain Python literals, no classes):
    ("s", feature_index, threshold, left, right)   internal split
    ("l", prediction)                              leaf
Feature indices follow the assembler order: the 6 numeric columns
then the 3 categorical index columns, all in SCALED space.
"""

from __future__ import annotations

import os
import pprint
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_debug_string(s: str):
    """Parse DecisionTreeRegressionModel.toDebugString into the nested
    literal encoding. The format is indentation-structured:

        If (feature N <= X)
          <subtree>
        Else (feature N > X)
          <subtree>
        Predict: V
    """
    lines = [ln for ln in s.splitlines()[1:] if ln.strip()]
    pos = 0

    def parse():
        nonlocal pos
        ln = lines[pos].strip()
        m = re.match(r"If \(feature (\d+) <= (.+)\)$", ln)
        if m:
            pos += 1
            left = parse()
            assert lines[pos].strip().startswith("Else "), lines[pos]
            pos += 1
            right = parse()
            return ("s", int(m.group(1)), float(m.group(2)), left, right)
        m = re.match(r"Predict: (.+)$", ln)
        assert m, ln
        pos += 1
        return ("l", float(m.group(1)))

    tree = parse()
    assert pos == len(lines), f"trailing lines at {pos}/{len(lines)}"
    return tree


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

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
    from steel_energy_consumption_prediction_using_pyspark_spark.workload.ml import (
        QUERY_ROWS,
        _portable_split,
    )

    spark = get_session("pin-dt")
    train, _ = _portable_split(steel_energy(spark, QUERY_ROWS))
    fitted = build_pipeline(baseline_regressors()["DecisionTreeRegressor"]).fit(
        train.coalesce(1)
    )
    tree = parse_debug_string(fitted.stages[-1].toDebugString)
    print("_DT_PINNED = ", end="")
    pprint.pprint(tree, width=78)


if __name__ == "__main__":
    main()
