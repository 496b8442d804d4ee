#!/usr/bin/env python
"""Median-of-N timings for a named subset of queries — the bench.py
methodology (warm session, builder + noop write, release_persisted
between runs) without paying for the full 231-query suite. For the r15
optimization loop's before/after numbers.

Usage: [BENCH_RUNS=3] python scripts/bench_subset.py q_a q_b ...
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
    names = sys.argv[1:]
    spark = get_spark("bench_subset", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    run_once(specs["q_cdc_snapshot_rebuild"], spark)  # warm the session
    out = {}
    for name in names:
        times = [run_once(specs[name], spark) for _ in range(RUNS)]
        out[name] = {
            "med": round(statistics.median(times), 3),
            "runs": [round(t, 3) for t in times],
        }
        print(f"# {name}: {out[name]['med']}s {out[name]['runs']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
