#!/usr/bin/env python
"""Patch steal-window-corrupted entries of BENCH_local.json with fresh
isolated re-measures (r16 closing). Reads a JSON file produced by
scripts/ab_r16.py and overwrites the named queries' med/iqr/runs in
BENCH_local.json, stamping each patched entry with
"repatched_r16": true so the provenance is explicit.

Usage: python scripts/patch_bench_local_r16.py ab_out.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def iqr(values):
    if len(values) < 2:
        return 0.0
    qs = statistics.quantiles(sorted(values), n=4, method="inclusive")
    return qs[2] - qs[0]


def main() -> None:
    ab = json.load(open(sys.argv[1]))["queries"]
    path = os.path.join(ROOT, "BENCH_local.json")
    full = json.load(open(path))
    for name, rec in ab.items():
        med = rec["med"]
        full["queries"][name] = med
        full["dispersion"][name] = {
            "med": med,
            "iqr": round(iqr(rec["runs"]), 3),
            "runs": len(rec["runs"]),
            "repatched_r16": True,
        }
    full["value"] = round(sum(full["queries"].values()), 3)
    with open(path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("patched:", sorted(ab), "new total:", full["value"])


if __name__ == "__main__":
    main()
