#!/usr/bin/env python
"""Interleaved A/B of one runtime SQL conf (dev-only) — ab_env.py's twin
for confs that are set on the session rather than read from the
environment. OFF/ON alternate per pass inside one warmed session.

Usage:
    python scripts/ab_conf.py CONF off_val on_val q1,q2,... [passes] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelinewise_spark.caching import release_caches  # noqa: E402
from pipelinewise_spark.queries import QUERIES  # noqa: E402
from pipelinewise_spark.session import get_spark  # noqa: E402


def main() -> None:
    conf, off, on = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4].split(",")
    n_pass = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    sf_dir = sys.argv[6] if len(sys.argv) > 6 else "/root/testdata/sf0.1"

    spark = get_spark("pws-ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
    from pipelinewise_spark.sources.files import glob_tables, read_table

    for t in glob_tables(sf_dir):
        read_table(spark, sf_dir, t).count()

    results: dict[str, dict[str, list[float]]] = {
        n: {"off": [], "on": []} for n in names
    }
    for _p in range(n_pass):
        for variant, val in (("off", off), ("on", on)):
            if val == "<unset>":
                spark.conf.unset(conf)
            else:
                spark.conf.set(conf, val)
            for name in names:
                release_caches(spark)
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                results[name][variant].append(time.perf_counter() - t0)
        release_caches(spark, jvm_gc=True)
    spark.conf.unset(conf)
    print(f"\n=== A/B {conf}: off={off} on={on}, {n_pass} passes ===")
    for name in names:
        a, b = results[name]["off"], results[name]["on"]
        print(
            f"{name:42s} off min {min(a):6.2f} med {statistics.median(a):6.2f}"
            f" | on min {min(b):6.2f} med {statistics.median(b):6.2f}"
            f" | min-ratio {min(b) / min(a):5.2f}"
        )
        print(f"    off passes: {[round(x, 2) for x in a]}")
        print(f"    on  passes: {[round(x, 2) for x in b]}")


if __name__ == "__main__":
    main()
