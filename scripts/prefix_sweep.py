#!/usr/bin/env python
"""Round rehearsal: replay the driver's correctness pass over the prefix-50.

Builds a VANILLA SparkSession (driver confs, not session.py's tuned ones) and
runs tests/oracle.py:compare — value-exact, stricter than the driver's hash —
for every prefix query at the given sf dir. Usage:

    python scripts/prefix_sweep.py [sf_dir] [start:stop]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sl = slice(0, 50)
    if len(sys.argv) > 2:
        a, b = sys.argv[2].split(":")
        sl = slice(int(a or 0), int(b or 50))

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("prefix-sweep-vanilla")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from oracle import compare  # tests/oracle.py

    from pipelinewise_spark.caching import release_caches
    from pipelinewise_spark.queries import ORACLES, QUERIES

    names = list(QUERIES)[:50][sl]
    failed = []
    for i, name in enumerate(names):
        t = time.time()
        try:
            release_caches(spark)
            compare(spark, name, QUERIES[name], ORACLES[name], sf_dir)
            print(f"[{i + sl.start:2d}] OK   {name} ({time.time() - t:.1f}s)", flush=True)
        except Exception:
            failed.append(name)
            print(f"[{i + sl.start:2d}] FAIL {name}", flush=True)
            traceback.print_exc()
    print(f"\n{len(names) - len(failed)}/{len(names)} green; failed: {failed}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
