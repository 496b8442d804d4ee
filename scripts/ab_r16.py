#!/usr/bin/env python
"""Same-host A/B for the r16 round: runs a named query subset with the
bench.py methodology (warm session, builder + noop write, median) in
THIS checkout — invoke it once from the r15-baseline worktree and once
from HEAD, minutes apart, and compare the JSON outputs.

Usage: [BENCH_RUNS=3] python scripts/ab_r16.py out.json q_a q_b ...
(identical to bench_subset.py but writes to a file so interleaved A/B
runs can't clobber each other's stdout and keeps per-run times.)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from dynamodb_pitr_restore_cdc_spark.registry import all_queries, release_persisted  # noqa: E402
from dynamodb_pitr_restore_cdc_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def run_once(spec, spark) -> float:
    t0 = time.perf_counter()
    df = spec.builder(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    release_persisted()
    return elapsed


def main() -> None:
    out_path, names = sys.argv[1], sys.argv[2:]
    spark = get_spark("ab_r16", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    run_once(specs["q_cdc_snapshot_rebuild"], spark)  # warm the session
    out = {"root": ROOT, "cpus": CPUS, "runs": RUNS}
    res = {}
    for name in names:
        times = [run_once(specs[name], spark) for _ in range(RUNS)]
        res[name] = {
            "med": round(statistics.median(times), 3),
            "runs": [round(t, 3) for t in times],
        }
        print(f"# {name}: {res[name]['med']}s {res[name]['runs']}", file=sys.stderr)
    out["queries"] = res
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
