#!/usr/bin/env python
"""Rebuild BENCH_PRIOR.json floors from this round's full runs (dev-only).

Floors are the per-query MIN across the given BENCH_DETAIL-shaped files;
``probe_floor`` is the min of their warm-up probe times. Floors and probe
MUST come from the same host family so the bench's host-calibration
factor (probe_now / probe_floor) stays meaningful — mixing a fast host's
floors with a slow host's probe (the r13 failure) makes the challenge
policy fire on everything.

Usage: python scripts/refloor.py out.json detail1.json [detail2.json ...]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, inputs = sys.argv[1], sys.argv[2:]
    floors: dict[str, float] = {}
    probes: list[float] = []
    sources = []
    for p in inputs:
        with open(p) as fh:
            d = json.load(fh)
        sources.append(p)
        if d.get("probe_s"):
            probes.append(float(d["probe_s"]))
        for name, sec in d.get("queries", {}).items():
            sec = float(sec)
            if name not in floors or sec < floors[name]:
                floors[name] = sec
    doc = {
        "note": (
            "per-query honest floors: cross-run minimum of this round's "
            "clean full runs on THIS host family; probe_floor from the "
            "same runs drives bench.py's host calibration"
        ),
        "sources": sources,
        "probe_floor": min(probes) if probes else None,
        "queries": {k: round(v, 4) for k, v in sorted(floors.items())},
    }
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(
        f"wrote {out_path}: {len(floors)} floors, "
        f"probe_floor={doc['probe_floor']}"
    )


if __name__ == "__main__":
    main()
