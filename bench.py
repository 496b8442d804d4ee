#!/usr/bin/env python
"""Benchmark harness: every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Protocol (BASELINE.md): warm SparkSession, per-query wall time over
BENCH_RUNS runs (median), full execution forced with a noop-format
write so nothing is collected to the driver and nothing is cached
between runs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from dynamodb_pitr_restore_cdc_spark.registry import all_queries
from dynamodb_pitr_restore_cdc_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_RUNS", "2"))


def run_once(spec, spark) -> float:
    t0 = time.perf_counter()
    df = spec.builder(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # warm the JVM/codegen path once with the flagship
    run_once(specs["q_cdc_snapshot_rebuild"], spark)

    timings: dict[str, float] = {}
    for name in sorted(specs):
        times = [run_once(specs[name], spark) for _ in range(RUNS)]
        timings[name] = round(statistics.median(times), 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    print(
        json.dumps(
            {
                "metric": "suite_seconds_all_queries",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
