"""Cross-PROCESS build coordination (round 7, VERDICT r6 #2).

The in-process key_lock work (round 6) left one race standing: two
driver PROCESSES sharing the same .scratch warehouse could overwrite-
write the same materialized asset, and the validate-by-isdir fast
paths could observe a half-written directory. These tests pin the
fix — fcntl lockfile per (namespace, asset) + build-into-tmp +
atomic-rename publish with a `_PUBLISHED` marker:

- unit level: publish semantics, stale-tmp cleanup, marker gating,
  kernel lock release after SIGKILL, and no torn directory under an
  injected mid-write kill;
- integration level: two subprocess SparkSessions cold-build the SAME
  persisted ANN index concurrently — exactly one build observed
  (marker telemetry), both probes byte-identical, and the bucketed
  graph-edge table registered over the shared bytes in both.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import (  # noqa: E402
    fs_key_lock,
    is_published,
    publish_dir,
)


def test_publish_dir_atomic_and_idempotent(tmp_path):
    final = str(tmp_path / "asset")
    calls = []

    def build(tmp):
        calls.append(tmp)
        os.makedirs(tmp)
        with open(os.path.join(tmp, "part-00000"), "w") as fh:
            fh.write("data")

    with fs_key_lock("testns", "asset1"):
        assert publish_dir(final, build, app_id="app-1") is True
    assert is_published(final)
    assert os.path.exists(os.path.join(final, "part-00000"))
    marker = json.load(open(os.path.join(final, "_PUBLISHED")))
    assert marker["builder_pid"] == os.getpid()
    assert marker["app_id"] == "app-1"
    # Second call: no build, no mutation.
    with fs_key_lock("testns", "asset1"):
        assert publish_dir(final, build) is False
    assert len(calls) == 1


def test_bare_dir_is_not_published(tmp_path):
    """A directory that exists but was never atomically published
    (the pre-round-7 validate-by-isdir hazard) must NOT validate."""
    final = str(tmp_path / "asset")
    os.makedirs(final)
    with open(os.path.join(final, "part-00000"), "w") as fh:
        fh.write("torn")
    assert not is_published(final)

    def build(tmp):
        os.makedirs(tmp)
        with open(os.path.join(tmp, "part-00000"), "w") as fh:
            fh.write("complete")

    # publish_dir replaces the unpublished partial under the lock.
    with fs_key_lock("testns", "asset2"):
        assert publish_dir(final, build) is True
    assert open(os.path.join(final, "part-00000")).read() == "complete"


def test_midwrite_kill_leaves_no_torn_asset(tmp_path):
    """SIGKILL a builder mid-write: the final path must never become
    observable, the flock must be kernel-released (no deadlock), and
    the next builder must clean the stale tmp and publish cleanly."""
    final = str(tmp_path / "asset")
    script = textwrap.dedent(f"""
        import os, signal, sys
        sys.path.insert(0, {REPO!r})
        from steel_energy_consumption_prediction_using_pyspark_spark.workload.util import (
            fs_key_lock, publish_dir,
        )
        def build(tmp):
            os.makedirs(tmp)
            with open(os.path.join(tmp, "part-00000"), "w") as fh:
                fh.write("half")
            print("MIDWRITE", flush=True)
            os.kill(os.getpid(), signal.SIGKILL)
        with fs_key_lock("testns", "kill_asset"):
            publish_dir({final!r}, build)
    """)
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=60,
    )
    assert proc.returncode == -signal.SIGKILL
    assert "MIDWRITE" in proc.stdout
    # Torn state: only a .tmp.<pid> sibling, never the final path.
    assert not os.path.exists(final)
    assert not is_published(final)
    import glob

    stale = glob.glob(final + ".tmp.*")
    assert len(stale) == 1

    # The kernel released the dead builder's flock: this acquire must
    # not block, and the rebuild must sweep the stale tmp.
    def build(tmp):
        os.makedirs(tmp)
        with open(os.path.join(tmp, "part-00000"), "w") as fh:
            fh.write("complete")

    with fs_key_lock("testns", "kill_asset"):
        assert publish_dir(final, build) is True
    assert is_published(final)
    assert glob.glob(final + ".tmp.*") == []
    assert open(os.path.join(final, "part-00000")).read() == "complete"


_WORKER = textwrap.dedent("""
    import json, os, sys
    sys.path.insert(0, sys.argv[1])
    sf_dir = sys.argv[2]
    from steel_energy_consumption_prediction_using_pyspark_spark.session import (
        get_session,
    )
    from steel_energy_consumption_prediction_using_pyspark_spark.workload import (
        all_queries,
    )
    spark = get_session("xproc-worker", shuffle_partitions=4)
    qs = all_queries()
    probe = qs["ivf_probe_materialized"](spark, sf_dir)
    rows = sorted(map(str, probe.collect()))
    edges = qs["graph_edges_build"](spark, sf_dir)
    erows = sorted(map(str, edges.collect()))
    print("RESULT " + json.dumps({
        "pid": os.getpid(),
        "probe_digest": "|".join(rows),
        "edge_digest": "|".join(erows),
    }), flush=True)
    spark.stop()
""")


@pytest.mark.slow
def test_two_process_cold_build_single_builder(tmp_path):
    """Two driver processes cold-build the same persisted ANN index
    (and bucketed edge table) CONCURRENTLY against a private fixture
    alias: exactly one build observed via the marker telemetry, both
    probes identical, no stale tmp, and the loser registered its
    catalog entry over the winner's published bytes."""
    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf0.001")
    os.makedirs(sf_dir)
    for f in os.listdir(src):
        os.symlink(os.path.join(src, f), os.path.join(sf_dir, f))

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, REPO, sf_dir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for _ in range(2)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-3000:]
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, out[-2000:]
        results.append(json.loads(line[-1][len("RESULT "):]))

    # Both processes produced identical, non-empty results.
    assert results[0]["probe_digest"] == results[1]["probe_digest"] != ""
    assert results[0]["edge_digest"] == results[1]["edge_digest"] != ""

    # Exactly one build: the published marker names one of the two
    # worker pids (publish_dir only stamps the process that built).
    import glob
    import re

    suffix = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.rstrip("/")).strip("_")
    base = os.path.join(REPO, ".scratch", "ann_index", suffix)
    assert is_published(base)
    marker = json.load(open(os.path.join(base, "_PUBLISHED")))
    pids = {r["pid"] for r in results}
    assert marker["builder_pid"] in pids
    assert glob.glob(base + ".tmp.*") == []

    edge_base = os.path.join(
        REPO, ".scratch", "graph_edges", "graph_edges_" + suffix
    )
    assert is_published(edge_base)
    emarker = json.load(open(os.path.join(edge_base, "_PUBLISHED")))
    assert emarker["builder_pid"] in pids
    assert glob.glob(edge_base + ".tmp.*") == []
