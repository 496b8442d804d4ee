#!/usr/bin/env python
"""Benchmark harness: every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE COMPACT JSON line (headline queries only — the driver's
stdout capture truncated the full 100-query map in round 1) and writes
the full per-query timing map to BENCH_local.json next to this file:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {headline: sec, ...}, "sf": <sf>, "n_queries": 100}

Protocol (BASELINE.md): warm SparkSession, per-query wall time over
repeated runs (median), full execution forced with a noop-format
write so nothing is collected to the driver and nothing is cached
between runs.

Dispersion (round-6, per the round-5 host-variance note): this shared
host swings sub-second queries 3-4× between sessions, so single-run
ratios near the 2× envelope are untrustworthy. Each query therefore
runs BENCH_RUNS times (default 3) plus BENCH_EXTRA_RUNS more when its
median lands under BENCH_NOISY_SEC (default: <1 s, the
steal-time-dominated regime) OR its IQR exceeds half its median (an
unstable median at any magnitude) — median-of-5 where noise
dominates, median-of-3 where the query itself dominates — and BENCH_local.json
records per-query {med, iqr, runs} under "dispersion". Breach
verdicts must gate on the MEDIAN ratio only and read the IQR for
stability context: scripts/bench_breach_check.py implements that gate
against a recorded baseline.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from dynamodb_pitr_restore_cdc_spark.registry import all_queries, release_persisted
from dynamodb_pitr_restore_cdc_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_RUNS", "3"))
EXTRA_RUNS = int(os.environ.get("BENCH_EXTRA_RUNS", "2"))
NOISY_SEC = float(os.environ.get("BENCH_NOISY_SEC", "1.0"))

# Representative queries surfaced in the one-line summary; the full
# per-query map goes to BENCH_local.json (the driver's stdout capture
# keeps only a bounded tail, so the final line must stay small).
HEADLINE = [
    "q_cdc_snapshot_rebuild",
    "q_cdc_change_deltas",
    "q_tpch_q3_shipping_priority",
    "q_tpch_q10_returned_items",
    "q_join_inner",
    "q_agg_groupby",
    "q_win_topk_per_group",
    "q_llm_near_dedup",
    "q_llm_cosine_topk",
    "q_llm_dedup_clusters",
    "q_stream_stateful_totals",
    "q_stream_foreachbatch_cdc",
    "q_cdc_time_travel",
    "q_cdc_changefeed",
    "q_llm_decontaminate",
    "q_tpch_q1_pricing_summary",
    "q_tpch_q21_waiting_supplier",
    "q_llm_ann_pq",
    "q_llm_paragraph_dedup",
    "q_cdc_restore_drill",
    "q_stream_alert_routing",
]


def run_once(spec, spark) -> float:
    t0 = time.perf_counter()
    df = spec.builder(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    release_persisted()  # builder persists don't outlive their run
    return elapsed


def iqr(values: list[float]) -> float:
    if len(values) < 2:  # BENCH_RUNS=1: dispersion is undefined, not an error
        return 0.0
    qs = statistics.quantiles(sorted(values), n=4, method="inclusive")
    return qs[2] - qs[0]


def main() -> None:
    spark = get_spark("bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # warm the JVM/codegen path once with the flagship
    run_once(specs["q_cdc_snapshot_rebuild"], spark)

    timings: dict[str, float] = {}
    dispersion: dict[str, dict[str, float]] = {}
    for name in sorted(specs):
        times = [run_once(specs[name], spark) for _ in range(RUNS)]
        # buy extra samples exactly where they pay: sub-NOISY_SEC
        # medians are steal-time-dominated on this shared host, and a
        # wide relative IQR means the initial median itself is unstable
        # at ANY magnitude (the round-6 q_llm_kmeans false breach:
        # med 4.4 s / iqr 2.1 over 3 runs vs 1.7 s isolated)
        if (
            statistics.median(times) < NOISY_SEC
            or iqr(times) > 0.5 * statistics.median(times)
        ):
            times += [run_once(specs[name], spark) for _ in range(EXTRA_RUNS)]
        med = round(statistics.median(times), 3)
        timings[name] = med
        dispersion[name] = {
            "med": med,
            "iqr": round(iqr(times), 3),
            "runs": len(times),
        }
        print(f"# {name}: {med}s (iqr {dispersion[name]['iqr']}s/{len(times)})", file=sys.stderr)

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    summary = {
        "metric": "suite_seconds_all_queries",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {n: timings[n] for n in HEADLINE if n in timings},
        "sf": sf,
        "n_queries": len(timings),
    }
    full = dict(summary)
    full["queries"] = timings
    full["dispersion"] = dispersion
    local_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json")
    with open(local_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
