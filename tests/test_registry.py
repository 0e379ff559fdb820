"""The query registry is a frozen API (VERDICT r2 #7): the driver's
per-round sweeps certify names by exact match, so a silently-dropped or
silently-renamed entry would erase its certification history. The
checked-in manifest (workload/manifest.json) records every driver-facing
name and whether it carries a DuckDB oracle or a documented rows-only
reason; this test fails on ANY drift — adding a query requires adding a
manifest row in the same change (with a reason if rows-only), which is
exactly the review hook we want."""

import json
import os

from steel_energy_consumption_prediction_using_pyspark_spark.workload import (
    all_oracles,
    all_queries,
)

MANIFEST_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "steel_energy_consumption_prediction_using_pyspark_spark",
    "workload",
    "manifest.json",
)


def _manifest():
    with open(MANIFEST_PATH) as fh:
        return json.load(fh)


def test_registry_matches_manifest_names():
    manifest = _manifest()
    qs = all_queries()
    missing = sorted(set(manifest) - set(qs))
    unlisted = sorted(set(qs) - set(manifest))
    assert not missing, f"manifest entries no longer registered: {missing}"
    assert not unlisted, (
        f"queries not in manifest (add rows, with reasons if rows-only): "
        f"{unlisted}"
    )


def test_oracle_coverage_matches_manifest():
    manifest = _manifest()
    oracles = set(all_oracles())
    for name, row in manifest.items():
        if row["check"] == "oracle":
            assert name in oracles, f"{name} lost its oracle"
        else:
            assert name not in oracles, (
                f"{name} gained an oracle — promote it in the manifest"
            )
            assert row.get("reason"), f"rows-only {name} needs a reason"


def test_no_orphan_oracles():
    qs = set(all_queries())
    orphans = sorted(set(all_oracles()) - qs)
    assert not orphans, f"oracles without queries: {orphans}"
