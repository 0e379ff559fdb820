"""Speculative-execution / retry determinism pin (round 6, VERDICT r5
#7): prove — not just claim — that duplicate task attempts and task
re-execution cannot change any query's result.

The probe runs in a SUBPROCESS because spark.speculation is a
SparkContext-creation conf (the shared test session can't adopt it):
tools/spec_determinism.py creates a local[8,3] session with every task
speculation-eligible immediately, runs five nondeterminism-sensitive
queries plus an injected-task-failure pipeline, and prints canonical
hashes. Here we assert (a) the retry-injected pipeline hashes equal to
its uninjected twin, and (b) every speculative run's hash equals the
LIVE DuckDB oracle hash — the same digest the correctness gate pins.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SF = "/root/testdata/sf0.001"


def test_speculation_and_retry_determinism():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "spec_determinism.py"), SF],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    data = json.loads(proc.stdout.strip().splitlines()[-1])

    # retry: the injected-failure plan succeeded (so a retry happened)
    # and produced the identical result
    assert data["retry"]["injected"] == data["retry"]["plain"]

    # speculation: every hash equals the DuckDB oracle's
    import duckdb

    import __spark_entry__ as e
    from tools.check_correctness import TABLES, summarize

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = e.oracle_sql()
    assert data["speculation"], "probe ran no queries"
    for name, h in data["speculation"].items():
        cur = con.execute(oracles[name])
        cols = [d[0] for d in cur.description]
        assert summarize(cur.fetchall(), cols) == h, name
