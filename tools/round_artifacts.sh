#!/bin/bash
# Regenerate every per-round artifact on the current tree, in order,
# stopping at the first failure. Run from the repo root:
#   bash tools/round_artifacts.sh 2>&1 | tee .scratch/round_artifacts.log
# pipefail is load-bearing: every stage pipes through `tail`, which
# would otherwise swallow the stage's exit code and let set -e sail
# past a failing gate into regenerating artifacts from a broken tree.
set -eo pipefail
cd "$(dirname "$0")/.."

echo "=== [1/10] pytest ==="
python -m pytest tests/ -x -q 2>&1 | tail -2

echo "=== [2/10] sf1 fixture (regenerate if absent) ==="
if [ ! -d .testdata/sf1 ]; then
  python tools/gen_sf.py /root/testdata/sf0.1 .testdata/sf1 10 2
fi

echo "=== [3/10] full gate sf0.001 ==="
CHECK_JSON_OUT=CORRECTNESS_FULL_sf0.001.json \
  python tools/check_correctness.py /root/testdata/sf0.001 2>/dev/null | tail -2

echo "=== [4/10] full gate sf0.01 ==="
CHECK_JSON_OUT=CORRECTNESS_FULL_sf0.01.json \
  python tools/check_correctness.py /root/testdata/sf0.01 2>/dev/null | tail -2

echo "=== [5/10] full gate sf0.1 ==="
CHECK_JSON_OUT=CORRECTNESS_FULL_sf0.1.json \
  python tools/check_correctness.py /root/testdata/sf0.1 2>/dev/null | tail -2

echo "=== [6/10] full gate sf1 ==="
CHECK_JSON_OUT=CORRECTNESS_FULL_sf1.json \
  python tools/check_correctness.py .testdata/sf1 2>/dev/null | tail -2

echo "=== [7/9] bench sf0.01 + sf0.1 + sf1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py 2>/dev/null | tail -1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py 2>/dev/null | tail -1
SPARK_GRAFT_SF_DIR=.testdata/sf1 python bench.py 2>/dev/null | tail -1

echo "=== [8/9] scale ladder ==="
python tools/scale_ladder.py --out SCALE_LADDER_r06.json \
  bench_detail_sf001.json bench_detail.json bench_detail_sf1.json | tail -3

echo "=== [9/9] done ==="
