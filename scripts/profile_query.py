#!/usr/bin/env python
"""Per-job profiling harness for a single registered query (dev-only).

Runs one query with the Spark event log enabled, then prints a per-job
breakdown (job id, description, submit->complete wall ms, #stages,
#tasks) plus the gaps BETWEEN jobs (driver-side time: planning, py4j,
control flow, filesystem metadata work). This answers "where do the
seconds of a job-count-bound query actually go" without the UI.

Usage: python scripts/profile_query.py <query_name> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelinewise_spark.caching import release_caches  # noqa: E402
from pipelinewise_spark.queries import QUERIES  # noqa: E402
from pipelinewise_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    evdir = "/tmp/pws_evlog"
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        "pws-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    # warm the scan infra like bench.py does
    from pipelinewise_spark.sources.files import glob_tables, read_table

    for t in glob_tables(sf_dir):
        read_table(spark, sf_dir, t).count()

    fn = QUERIES[name]
    n_pass = int(os.environ.get("PWS_PROFILE_PASSES", "2"))
    marker = 0.0  # PWS_PROFILE_PASSES=1: profile the only pass
    for i in range(n_pass):  # pass 2 is the converged one (codegen warm)
        release_caches(spark)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"pass {i}: {dt:.3f}s", file=sys.stderr)
        if i == n_pass - 2:
            marker = time.time() * 1000  # events after this are final pass
    release_caches(spark)
    spark.stop()

    def _lines():
        with open(os.path.join(evdir, app_id)) as fh:
            yield from fh

    jobs: dict[int, dict] = {}
    if True:
        for line in _lines():
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                ts = ev["Submission Time"]
                if ts < marker:
                    continue
                jobs[ev["Job ID"]] = {
                    "t0": ts,
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )[:80],
                    "nstages": len(ev.get("Stage Infos", [])),
                    "ntasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    ),
                }
            elif et == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j is not None:
                    j["t1"] = ev["Completion Time"]

    order = sorted(jobs)
    prev_end = None
    total_job = 0.0
    total_gap = 0.0
    print(f"\n=== {name}: final-pass jobs ===")
    for jid in order:
        j = jobs[jid]
        if "t1" not in j:
            continue
        dur = (j["t1"] - j["t0"]) / 1000.0
        gap = (j["t0"] - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = j["t1"]
        total_job += dur
        total_gap += max(gap, 0.0)
        print(
            f"job {jid:4d}  {dur:7.3f}s  gap_before {gap:7.3f}s  "
            f"stages {j['nstages']:2d} tasks {j['ntasks']:4d}  {j['desc']}"
        )
    print(
        f"TOTAL in-job {total_job:.3f}s, between-job (driver) "
        f"{total_gap:.3f}s, jobs {len(order)}"
    )


if __name__ == "__main__":
    main()
