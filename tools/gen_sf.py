"""Scale-up generator for stress gates (VERDICT r3 #2).

Builds an sfN fixture set by replicating a source SF with per-replica
key offsets, preserving every invariant the workload depends on:
referential integrity (all FKs offset by the same per-table stride),
enum domains, timestamp ranges, ASCII-only document text, and the
original rows as replica 0 (so seeded entities like customer 0 and
query vectors vec_id < 5 keep existing). Dimension-ish tables scale
the way the driver's own generator does: region/nation fixed;
documents/embeddings sublinear (x2 at 10x facts — matching the
observed 500/500/5000 and 500/500/2000 progression).

Replica perturbation is deterministic and engine-neutral: replicas of
documents get a per-replica ASCII suffix (n_chars updated), so the
dedup tiers see near-dup clusters rather than a degenerate 2x exact
dup of every doc; embeddings replicate exactly (tie-broken by id
everywhere, and ann oracles re-derive whatever is stored).

Usage: python tools/gen_sf.py SRC_DIR OUT_DIR FACT_MULT [DOC_MULT]
e.g.:  python tools/gen_sf.py /root/testdata/sf0.1 .testdata/sf1 10 2
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    src, out, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    doc_mult = int(sys.argv[4]) if len(sys.argv) > 4 else max(2, mult // 5)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{src}/{t}.parquet'"
        )

    def stride(table: str, key: str) -> int:
        return con.sql(f"SELECT max({key}) + 1 FROM {table}").fetchone()[0]

    c_s = stride("customer", "c_custkey")
    s_s = stride("supplier", "s_suppkey")
    p_s = stride("part", "p_partkey")
    o_s = stride("orders", "o_orderkey")
    e_s = stride("events", "event_id")
    u_s = stride("events", "user_id")
    d_s = stride("documents", "doc_id")
    v_s = stride("embeddings", "vec_id")

    jobs = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""
            SELECT c_custkey + r * {c_s} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM customer CROSS JOIN (SELECT unnest(range({mult})) AS r)
        """,
        "supplier": f"""
            SELECT s_suppkey + r * {s_s} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM supplier CROSS JOIN (SELECT unnest(range({mult})) AS r)
        """,
        "part": f"""
            SELECT p_partkey + r * {p_s} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM part CROSS JOIN (SELECT unnest(range({mult})) AS r)
        """,
        "orders": f"""
            SELECT o_orderkey + r * {o_s} AS o_orderkey,
                   o_custkey + r * {c_s} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM orders CROSS JOIN (SELECT unnest(range({mult})) AS r)
        """,
        "lineitem": f"""
            SELECT l_orderkey + r * {o_s} AS l_orderkey,
                   l_partkey + r * {p_s} AS l_partkey,
                   l_suppkey + r * {s_s} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem CROSS JOIN (SELECT unnest(range({mult})) AS r)
        """,
        "events": f"""
            SELECT event_id + r * {e_s} AS event_id, ts,
                   user_id + r * {u_s} AS user_id,
                   event_type, value, props
            FROM events CROSS JOIN (SELECT unnest(range({mult})) AS r)
        """,
        "documents": f"""
            SELECT doc_id + r * {d_s} AS doc_id,
                   CASE WHEN r = 0 THEN text
                        ELSE text || ' replica ' || r END AS text,
                   lang, source,
                   CASE WHEN r = 0 THEN n_chars
                        ELSE n_chars + length(' replica ' || r) END
                       AS n_chars
            FROM documents CROSS JOIN (SELECT unnest(range({doc_mult})) AS r)
        """,
        "embeddings": f"""
            SELECT vec_id + r * {v_s} AS vec_id, embedding, label
            FROM embeddings CROSS JOIN (SELECT unnest(range({doc_mult})) AS r)
        """,
    }
    for t, q in jobs.items():
        con.sql(
            f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}", flush=True)


if __name__ == "__main__":
    main()
