"""Pipeline data-quality gates via observed metrics.

`df.observe` piggybacks aggregate counters on whatever action the
pipeline already runs — at 100 TB that means quality telemetry with
ZERO extra scans, vs a separate validation pass that re-reads the
input. The counters surface through `pyspark.sql.Observation` after
the first action and can fail the job (gate) when a rule is violated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def rule_metrics(rules: dict[str, Column]) -> list[Column]:
    """Aggregate columns for boolean `rules` (True = row OK): a
    total-row counter plus one `bad_<name>` violation counter per
    rule. Shared by the observe path and plain batch summaries
    (`df.agg(*rule_metrics(rules))`)."""
    return [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(~cond, 1).otherwise(0)).cast("bigint").alias(f"bad_{name}")
        for name, cond in rules.items()
    ]


def observe_rules(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach violation counters for boolean `rules` (True = row OK)
    plus a total-row counter. Returns (df, observation); read
    `observation.get` after the next action on df."""
    obs = Observation()
    return df.observe(obs, *rule_metrics(rules)), obs


def check_gate(
    observation: Observation, max_bad_fraction: float = 0.0
) -> dict[str, int]:
    """Evaluate an observation after the action ran. Raises ValueError
    naming every violated rule whose bad-row fraction exceeds
    `max_bad_fraction`; returns the raw counters otherwise."""
    got = observation.get
    n = max(got["n_rows"], 1)
    violated = {
        k: v for k, v in got.items() if k.startswith("bad_") and v / n > max_bad_fraction
    }
    if violated:
        raise ValueError(f"quality gate failed: {violated} of {got['n_rows']} rows")
    return got
