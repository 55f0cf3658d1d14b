#!/usr/bin/env python
"""Build a 10x self-scaled copy of an sf directory for SCALE-EVIDENCE
runs (SCALE.md sf0.1 -> ~sf1 ratios). NOT correctness testdata — the
driver's sf dirs stay the only oracle inputs.

Scaling rules keep each query's WORKLOAD SHAPE near-linear instead of
creating pathological density:

- fact/dim tables replicate R times with consistent key offsets
  (o_custkey moves with c_custkey, l_orderkey with o_orderkey, ...), so
  joins stay 1:N with the same fan-out and group-by cardinality grows
  ~R-fold where it is key-derived;
- region/nation stay fixed (true dimensions);
- events keep their timestamps (time-window queries select R x rows,
  not a longer history);
- documents get a per-replica suffix TOKEN so cross-replica docs are
  NOT near-duplicates — a verbatim 10x copy would square the LSH pair
  count instead of scaling it linearly;
- embeddings perturb one coordinate per replica (+r * 1e-3) so ANN
  neighborhoods stay ~R-fold, not degenerate ties.

Usage: python scripts/make_scaled_data.py [SRC] [DST] [R]
Defaults: /root/testdata/sf0.1 /tmp/pws_sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pws_sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW reps AS SELECT unnest(range({R})) AS r")


def src(t: str) -> str:
    return f"read_parquet('{SRC}/{t}.parquet')"


def key_offset(t: str, col: str) -> int:
    """Per-table replica stride: a round power of ten above max(key), so
    offset keys stay readable and never collide."""
    mx = con.execute(f"SELECT max({col}) FROM {src(t)}").fetchone()[0]
    stride = 10
    while stride <= mx:
        stride *= 10
    return stride


def write(t: str, select: str) -> None:
    out = f"{DST}/{t}.parquet"
    con.execute(f"COPY ({select}) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"{t}: {n} rows")


CUST = key_offset("customer", "c_custkey")
SUPP = key_offset("supplier", "s_suppkey")
PART = key_offset("part", "p_partkey")
ORDK = key_offset("orders", "o_orderkey")
EVT = key_offset("events", "event_id")
USR = key_offset("events", "user_id")
DOC = key_offset("documents", "doc_id")
VEC = key_offset("embeddings", "vec_id")

# true dims: copy through unchanged
for t in ("region", "nation"):
    write(t, f"SELECT * FROM {src(t)}")

write("customer", f"""
    SELECT c_custkey + r * {CUST} AS c_custkey,
           c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM {src('customer')}, reps""")

write("supplier", f"""
    SELECT s_suppkey + r * {SUPP} AS s_suppkey,
           s_name, s_nationkey, s_acctbal
    FROM {src('supplier')}, reps""")

write("part", f"""
    SELECT p_partkey + r * {PART} AS p_partkey,
           p_name, p_brand, p_type, p_size, p_retailprice
    FROM {src('part')}, reps""")

write("orders", f"""
    SELECT o_orderkey + r * {ORDK} AS o_orderkey,
           o_custkey + r * {CUST} AS o_custkey,
           o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM {src('orders')}, reps""")

write("lineitem", f"""
    SELECT l_orderkey + r * {ORDK} AS l_orderkey,
           l_partkey + r * {PART} AS l_partkey,
           l_suppkey + r * {SUPP} AS l_suppkey,
           l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
           l_returnflag, l_linestatus, l_shipdate
    FROM {src('lineitem')}, reps""")

write("events", f"""
    SELECT event_id + r * {EVT} AS event_id,
           ts,
           user_id + r * {USR} AS user_id,
           event_type, value, props
    FROM {src('events')}, reps""")

write("documents", f"""
    SELECT doc_id + r * {DOC} AS doc_id,
           CASE WHEN r = 0 THEN text
                ELSE text || ' replica marker token r' || r END AS text,
           lang, source,
           n_chars + CASE WHEN r = 0 THEN 0
                          ELSE 24 + length(CAST(r AS VARCHAR)) END AS n_chars
    FROM {src('documents')}, reps""")

write("embeddings", f"""
    SELECT vec_id + r * {VEC} AS vec_id,
           CASE WHEN r = 0 THEN embedding
                ELSE list_transform(
                    embedding,
                    (x, i) -> CASE WHEN i = 1
                                   THEN CAST(x + r * 0.001 AS FLOAT)
                                   ELSE x END)
           END AS embedding,
           label
    FROM {src('embeddings')}, reps""")

print(f"done -> {DST} (R={R})")
