"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB against the same parquet fixtures, then compares row count,
column names, and an order-insensitive value hash (doubles rounded to 9
significant digits before hashing, so engine-side ulp noise in values we
already rounded query-side cannot flip the comparison).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def row_key(row) -> str:
    return "|".join(canon(v) for v in row)


def summarize(rows, cols):
    """Order-insensitive multiset digest of rows (columns sorted by name)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    keys = sorted(row_key([r[i] for i in order]) for r in rows)
    import hashlib

    return hashlib.sha256("\n".join(keys).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # CHECK_JSON_OUT=<path>: additionally write the per-query result
    # sheet (driver-style rows) so full runs leave a committed artifact
    # instead of only scrollback (ADVICE r2 #3).
    json_out = os.environ.get("CHECK_JSON_OUT")
    sheet: dict[str, dict] = {}

    import duckdb

    import __spark_entry__ as e
    from steel_energy_consumption_prediction_using_pyspark_spark.session import (
        get_session,
    )

    spark = get_session("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            failures.append(name)
            sheet[name] = {"status": "fail", "err": f"spark: {ex}"}
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            sheet[name] = {"status": "rows_only", "spark_rows": len(srows)}
            if len(srows) == 0:
                failures.append(name)
                sheet[name] = {"status": "fail", "err": "zero rows"}
                print(f"FAIL  {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            failures.append(name)
            sheet[name] = {"status": "fail", "err": f"duckdb: {ex}"}
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            hs, hd = summarize(srows, scols), summarize(drows, dcols)
            if hs != hd:
                problems.append(f"hash {hs} vs {hd}")
        if problems:
            failures.append(name)
            sheet[name] = {"status": "fail", "err": "; ".join(problems)}
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if sorted(scols) == sorted(dcols) and srows and drows:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = {row_key([r[i] for i in order]) for r in srows}
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dset = {row_key([r[i] for i in dorder]) for r in drows}
                for k in list(sset - dset)[:3]:
                    print(f"        spark-only: {k}")
                for k in list(dset - sset)[:3]:
                    print(f"        duck-only:  {k}")
        else:
            sheet[name] = {
                "status": "ok",
                "rows": len(srows),
                "hash": summarize(srows, scols),
            }
            print(f"OK    {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(sheet),
                    "n_ok": sum(
                        1 for v in sheet.values() if v["status"] == "ok"
                    ),
                    "n_rows_only": sum(
                        1 for v in sheet.values() if v["status"] == "rows_only"
                    ),
                    "n_fail": len(failures),
                    "queries": sheet,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
