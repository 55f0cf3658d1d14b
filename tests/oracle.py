"""Local twin of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side, then compares
row count, column names, and (order-insensitively) every value — exact
equality, which is stricter than a hash. Used by tests so a CORRECTNESS_r{N}
mismatch never surprises us.
"""

from __future__ import annotations

import math
import os
from datetime import datetime
from decimal import Decimal

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        # NaN equality; -0.0 == 0.0
        if math.isnan(v):
            return "NaN"
        return v + 0.0
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _key(row):
    return repr(row)


def compare(spark, name: str, query_fn, oracle: str, sf_dir: str) -> None:
    sdf = query_fn(spark, sf_dir)
    scols = list(sdf.columns)
    srows = [tuple(_norm(v) for v in row) for row in sdf.collect()]

    con = duckdb_connection(sf_dir)
    res = con.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = [tuple(_norm(v) for v in row) for row in res.fetchall()]

    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch spark={scols} oracle={ocols}"
    )
    # align column order by name (driver sorts columns by name before hashing)
    sidx = [scols.index(c) for c in sorted(scols)]
    oidx = [ocols.index(c) for c in sorted(ocols)]
    srows = sorted((_key([r[i] for i in sidx]) for r in srows))
    orows = sorted((_key([r[i] for i in oidx]) for r in orows))
    assert len(srows) == len(orows), (
        f"{name}: row count mismatch spark={len(srows)} oracle={len(orows)}"
    )
    mism = [(a, b) for a, b in zip(srows, orows) if a != b]
    assert not mism, f"{name}: {len(mism)} value mismatches; first: {mism[0]}"
