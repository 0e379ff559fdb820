"""Plan audit: dump scale-relevant physical-plan properties for every
headline query — exchange count, broadcast joins, pushed filters,
scan column counts — so plan regressions are visible at a glance.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from steel_energy_consumption_prediction_using_pyspark_spark.plans.inspect import (
        physical_plan,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.session import (
        get_session,
    )

    spark = get_session("plan-audit")
    qs = e.queries()
    print(f"{'query':24} {'exch':>4} {'bcast':>5} {'smj':>3} {'scans':>5}  pushed/notes")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name.startswith("ml_") or name == "steel_eda":
            continue  # ML fits: plan of the *output table*, not informative
        try:
            df = fn(spark, sf_dir)
            plan = physical_plan(df)
        except Exception as ex:
            print(f"{name:24} ERROR {ex}")
            continue
        exch = len(re.findall(r"\bExchange\b|\bShuffleExchange", plan)) + plan.count(
            "ShuffleQueryStage"
        )
        bcast = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        scans = plan.count("Scan parquet")
        pushed = sorted(
            set(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
            - {""}
        )
        pushed_cols = sorted(
            {
                m.split("(")[-1].split(",")[0].strip()
                for p in pushed
                for m in p.split("), ")
                if "(" in m
            }
        )[:4]
        print(
            f"{name:24} {exch:>4} {bcast:>5} {smj:>3} {scans:>5}  {','.join(pushed_cols)}"
        )


if __name__ == "__main__":
    main()
