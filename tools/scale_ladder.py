"""Scale-ladder analysis: compare bench.py outputs taken at different
scale factors and flag queries whose runtime grew faster than the
data.

Usage:
    python tools/scale_ladder.py BENCH_small.json BENCH_big.json [...]
    python tools/scale_ladder.py --out SCALE_LADDER_r05.json \
        bench_detail_sf001.json bench_detail.json bench_detail_sf1.json

Accepts either the bench stdout summary line or bench_detail.json
(the full per-query map); with 3+ files every consecutive pair becomes
one ladder rung. The data ratio is inferred from the files' "sf"
fields (e.g. sf0.1 -> sf1 = 10x). A query is flagged super-linear when

    t_big / max(t_small, FLOOR) > data_ratio * SLACK

with FLOOR = 0.3 s (below that, fixed per-query session/plan overhead
dominates and ratios are noise) and SLACK = 1.5 (AQE re-plans, JIT,
and partition-count effects legitimately bend the curve). Documented
exact tiers (the O(n^2)-by-design pair generators) are reported in a
separate section rather than flagged — their growth law is quadratic
on purpose and their volume path is the LSH/sketch tier.

BOX NORMALIZATION (round 8, VERDICT r7 #2): each bench_detail file
self-reports its run's box speed (`box_factor` / `box_factor_median`
— the pinned calibration probe); every timing is divided by its run's
factor BEFORE computing growth, so a rung taken in a slow regime
(sf10's r7 run: box 1.729 vs sf1's 1.019) no longer inflates every
ratio ~1.7x. Raw growth is kept alongside as `growth_raw`.

Output: one human-readable table per rung plus a final JSON line;
--out additionally writes the committed round artifact (VERDICT r4
#6) with every rung's per-query growth ratios and the flag lists.
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


def load(path: str) -> tuple[float, float, dict[str, float]]:
    d = json.load(open(path))
    s = d.get("summary", d)
    sf = float(str(s.get("sf", "0.1")).replace("sf", ""))
    # Prefer the steady-series median (r8+; min-of-reps basis from r9,
    # computed over post-start probes only — judge advice r8) over the
    # single start probe (r7); neutral 1.0 before that.
    box = float(s.get("box_factor_median", s.get("box_factor", 1.0)))
    return sf, box, dict(d["queries"])


def rung(small_path: str, big_path: str) -> dict:
    sf_s, box_s, qs_s = load(small_path)
    sf_b, box_b, qs_b = load(big_path)
    ratio = sf_b / sf_s
    qs = sorted(set(qs_s) & set(qs_b))
    missing = sorted(set(qs_s) ^ set(qs_b))
    flagged, quad, rows, growths, growths_raw = [], [], [], {}, {}
    for q in qs:
        ts, tb = qs_s[q], qs_b[q]
        # Box-normalize each side by ITS run's calibration factor
        # before the floor/ratio — see module docstring.
        ts_n, tb_n = ts / box_s, tb / box_b
        growth = tb_n / max(ts_n, FLOOR)
        growths[q] = round(growth, 3)
        growths_raw[q] = round(tb / max(ts, FLOOR), 3)
        rows.append((growth, q, ts_n, tb_n))
        if growth > ratio * SLACK:
            (quad if q in EXPECTED_QUADRATIC else flagged).append(q)

    rows.sort(reverse=True)
    print(f"\n== {small_path} (sf{sf_s:g}, box {box_s:g}) -> "
          f"{big_path} (sf{sf_b:g}, box {box_b:g}) ==")
    print(f"data ratio {ratio:g}x  |  flag threshold {ratio * SLACK:g}x  "
          f"| floor {FLOOR}s  | times box-normalized")
    print(f"{'growth':>8}  {'sf_small':>8}  {'sf_big':>8}  query")
    for growth, q, ts_n, tb_n in rows[:25]:
        mark = ("  <-- SUPER-LINEAR" if q in flagged
                else ("  (quadratic tier, by design)" if q in quad else ""))
        print(f"{growth:8.2f}  {ts_n:8.2f}  {tb_n:8.2f}  {q}{mark}")
    if missing:
        print(f"not in both runs ({len(missing)}): {', '.join(missing)}")
    return {
        "sf_small": sf_s,
        "sf_big": sf_b,
        "box_small": box_s,
        "box_big": box_b,
        "ratio": ratio,
        "threshold": ratio * SLACK,
        "n_compared": len(qs),
        "flagged": flagged,
        "expected_quadratic": quad,
        "missing_from_one_side": missing,
        "growth": growths,
        "growth_raw": growths_raw,
    }


def main() -> int:
    args = sys.argv[1:]
    out = None
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) < 2:
        print(__doc__)
        return 2
    rungs = [rung(a, b) for a, b in zip(args, args[1:])]
    flagged = sorted({q for r in rungs for q in r["flagged"]})
    summary = {
        "floor_sec": FLOOR,
        "slack": SLACK,
        "flagged": flagged,
        "rungs": rungs,
    }
    print(json.dumps({"flagged": flagged,
                      "rungs": [(r["sf_small"], r["sf_big"],
                                 len(r["flagged"])) for r in rungs]}))
    if out:
        with open(out, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {out}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
