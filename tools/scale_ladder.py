"""Scale-ladder analysis: compare two bench.py JSON outputs taken at
different scale factors and flag queries whose runtime grew faster
than the data.

Usage: python tools/scale_ladder.py BENCH_small.json BENCH_big.json

The data ratio is inferred from the two files' "sf" fields (e.g.
sf0.1 -> sf1 = 10x). A query is flagged super-linear when

    t_big / max(t_small, FLOOR) > data_ratio * SLACK

with FLOOR = 0.3 s (below that, fixed per-query session/plan overhead
dominates and ratios are noise) and SLACK = 1.5 (AQE re-plans, JIT,
and partition-count effects legitimately bend the curve). Documented
exact tiers (the O(n^2)-by-design pair generators) are reported in a
separate section rather than flagged — their growth law is quadratic
on purpose and their volume path is the LSH/sketch tier.

Output: one human-readable table plus a final JSON line
{"ratio": R, "flagged": [...], "expected_quadratic": [...]} so round
artifacts can embed the result.
"""

from __future__ import annotations

import json
import sys

FLOOR = 0.3
SLACK = 1.5

# O(n^2/blocks)-by-design tiers: growth ~ data_ratio^2 is expected,
# documented, and NOT a scale bug (their 100 TB path is LSH/minhash).
EXPECTED_QUADRATIC = {
    "ngram_jaccard",
    "containment_pairs",
    "dedup_clusters",
    "cluster_representatives",
    "embedding_neardup",
    "knn_bruteforce",
}


def main() -> int:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    r_small = float(str(small.get("sf", "0.1")).replace("sf", ""))
    r_big = float(str(big.get("sf", "1")).replace("sf", ""))
    ratio = r_big / r_small

    qs = sorted(set(small["queries"]) & set(big["queries"]))
    missing = sorted(set(small["queries"]) ^ set(big["queries"]))
    flagged, quad, rows = [], [], []
    for q in qs:
        ts, tb = small["queries"][q], big["queries"][q]
        growth = tb / max(ts, FLOOR)
        rows.append((growth, q, ts, tb))
        if growth > ratio * SLACK:
            (quad if q in EXPECTED_QUADRATIC else flagged).append(q)

    rows.sort(reverse=True)
    print(f"data ratio {ratio:g}x  |  flag threshold {ratio * SLACK:g}x  "
          f"| floor {FLOOR}s")
    print(f"{'growth':>8}  {'sf_small':>8}  {'sf_big':>8}  query")
    for growth, q, ts, tb in rows[:25]:
        mark = ("  <-- SUPER-LINEAR" if q in flagged
                else ("  (quadratic tier, by design)" if q in quad else ""))
        print(f"{growth:8.2f}  {ts:8.2f}  {tb:8.2f}  {q}{mark}")
    if missing:
        print(f"not in both runs ({len(missing)}): {', '.join(missing)}")
    print(json.dumps({"ratio": ratio, "flagged": flagged,
                      "expected_quadratic": quad}))
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
