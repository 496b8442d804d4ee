#!/usr/bin/env python
"""Alternating variant bench (r16): runs ONE query repeatedly in a
single warm session while cycling an env knob between runs, so every
variant samples the same host conditions interleaved — the only
trustworthy A/B shape on this steal-prone host.

Usage:
  python scripts/alt_variant_bench.py q_name ENV_VAR v1,v2,v3 [rounds]
Prints per-variant run lists and medians as JSON on stdout.
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


def main() -> None:
    name, env_var = sys.argv[1], sys.argv[2]
    variants = sys.argv[3].split(",")
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    spark = get_spark("alt_bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    spec = specs[name]

    def run_once() -> float:
        t0 = time.perf_counter()
        spec.builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        release_persisted()
        return el

    # warm: one run per variant, discarded
    for v in variants:
        os.environ[env_var] = v
        run_once()

    times: dict[str, list[float]] = {v: [] for v in variants}
    for _ in range(rounds):
        for v in variants:
            os.environ[env_var] = v
            times[v].append(round(run_once(), 3))
    out = {
        v: {"med": round(statistics.median(ts), 3), "runs": ts}
        for v, ts in times.items()
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
