#!/usr/bin/env python3
"""Build an ~8x replica of a testdata SF dir for the scale PROBE (a 4th
timing point past sf0.1 — SCALING.md measures sf0.001/0.01/0.1; this
answers "does the curve hold one more 8x step" for the heavy tail).

Entities replicate with consistently SHIFTED keys (8x more orders,
parts, suppliers, customers, users, docs — same per-entity sizes), so
every join still matches and the workload profile is scale-out growth,
not hotter keys. The nation/region dims stay fixed (5/25 rows), like a
real deployment. Document text gets a per-copy prefix token so the 8
copies are near- but not exact duplicates (keeps the dedup/LSH
workload realistic instead of 8-way pure-dup explosion). Timestamps
keep the original timeline: more activity per day, same horizon.

Usage: make_scale_probe.py <srcSfDir> <outDir> [copies=8]
"""
import os
import sys

import duckdb

src, out = sys.argv[1], sys.argv[2]
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 8
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

def mx(table, col):
    return con.execute(
        f"SELECT max({col}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

K_ORD = mx("orders", "o_orderkey")
K_CUST = mx("customer", "c_custkey")
K_SUPP = mx("supplier", "s_suppkey")
K_PART = mx("part", "p_partkey")
K_EVT = mx("events", "event_id")
K_USER = mx("events", "user_id")
K_DOC = mx("documents", "doc_id")
K_VEC = mx("embeddings", "vec_id")

REP = f"(SELECT unnest(range({copies})) AS i)"

def emit(table, select):
    con.execute(
        f"COPY (SELECT {select} FROM '{src}/{table}.parquet' CROSS JOIN "
        f"{REP}) TO '{out}/{table}.parquet' (FORMAT parquet)")
    n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

# dims stay fixed — one copy only
for t in ("nation", "region"):
    con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
                f"'{out}/{t}.parquet' (FORMAT parquet)")
    print(f"{t}: copied")

emit("customer",
     f"c_custkey + i * {K_CUST} AS c_custkey, c_name, c_nationkey, "
     "c_acctbal, c_mktsegment")
emit("supplier",
     f"s_suppkey + i * {K_SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal")
emit("part",
     f"p_partkey + i * {K_PART} AS p_partkey, p_name, p_brand, p_type, "
     "p_size, p_retailprice")
emit("orders",
     f"o_orderkey + i * {K_ORD} AS o_orderkey, "
     f"o_custkey + i * {K_CUST} AS o_custkey, o_orderstatus, o_totalprice, "
     "o_orderdate, o_orderpriority")
emit("lineitem",
     f"l_orderkey + i * {K_ORD} AS l_orderkey, "
     f"l_partkey + i * {K_PART} AS l_partkey, "
     f"l_suppkey + i * {K_SUPP} AS l_suppkey, l_linenumber, l_quantity, "
     "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
     "l_shipdate")
emit("events",
     f"event_id + i * {K_EVT} AS event_id, ts, "
     f"user_id + i * {K_USER} AS user_id, event_type, value, props")
emit("documents",
     f"doc_id + i * {K_DOC} AS doc_id, "
     "CASE WHEN i = 0 THEN text ELSE 'v' || i || ' ' || text END AS text, "
     "lang, source, n_chars")
emit("embeddings",
     f"vec_id + i * {K_VEC} AS vec_id, embedding, label")
print("done ->", out)
