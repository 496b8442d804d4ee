#!/usr/bin/env python
"""Per-query job-level profiler for the r15 optimization round.

Runs the named queries once each (builder + noop write, the bench
methodology) in a session with the Spark event log enabled, then
parses the event log to break each query's wall time into its Spark
jobs (call site, duration) and the driver-side gaps between them.

Usage:
  python scripts/profile_r15.py q_llm_pack_manifest_incremental q_stream_ewma ...
Output: one text report per query on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from dynamodb_pitr_restore_cdc_spark.registry import all_queries, release_persisted  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EVDIR = "/tmp/spark_events_r15"


def get_profiled_spark():
    from pyspark.sql import SparkSession

    os.makedirs(EVDIR, exist_ok=True)
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile_r15")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{EVDIR}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    names = sys.argv[1:]
    specs = all_queries()
    spark = get_profiled_spark()
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    # warm the session the way bench does
    w0 = time.perf_counter()
    specs["q_cdc_snapshot_rebuild"].builder(spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()
    release_persisted()
    print(f"# warmup: {time.perf_counter() - w0:.2f}s", file=sys.stderr)

    spans: dict[str, tuple[float, float]] = {}
    for name in names:
        sc = spark.sparkContext
        sc.setJobDescription(f"PROF:{name}")
        t0 = time.time()
        df = specs[name].builder(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        t1 = time.time()
        release_persisted()
        sc.setJobDescription(None)
        spans[name] = (t0 * 1000, t1 * 1000)
        print(f"# {name}: {t1 - t0:.3f}s wall", file=sys.stderr)

    spark.stop()
    time.sleep(1.0)

    # parse the event log
    ev_path = os.path.join(EVDIR, app_id)
    if not os.path.exists(ev_path):
        cands = [p for p in os.listdir(EVDIR) if p.startswith(app_id)]
        ev_path = os.path.join(EVDIR, cands[0])
    jobs: dict[int, dict] = {}
    with open(ev_path) as fh:
        for line in fh:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if e.get("Event") == "SparkListenerJobStart":
                props = e.get("Properties", {}) or {}
                jobs[e["Job ID"]] = {
                    "start": e["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "site": props.get("callSite.short", ""),
                    "stages": len(e.get("Stage IDs", [])),
                    "tasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in e.get("Stage Infos", [])
                    ),
                }
            elif e.get("Event") == "SparkListenerJobEnd":
                j = jobs.get(e["Job ID"])
                if j is not None:
                    j["end"] = e["Completion Time"]

    for name in names:
        s, t = spans[name]
        mine = [
            (jid, j)
            for jid, j in sorted(jobs.items())
            if j.get("end") and s <= j["start"] <= t
        ]
        total_job_ms = sum(j["end"] - j["start"] for _, j in mine)
        wall_ms = t - s
        print(f"\n=== {name}: wall {wall_ms/1000:.2f}s, {len(mine)} jobs, "
              f"in-job {total_job_ms/1000:.2f}s, gap {(wall_ms-total_job_ms)/1000:.2f}s ===")
        prev_end = s
        for jid, j in mine:
            gap = j["start"] - prev_end
            prev_end = max(prev_end, j["end"])
            dur = j["end"] - j["start"]
            tag = " PROF" if j["desc"].startswith("PROF:") else ""
            print(
                f"  job {jid:4d} +{gap:6.0f}ms gap | {dur:6.0f}ms "
                f"{j['stages']}st/{j['tasks']}tk {j['site'][:60]}{tag}"
            )


if __name__ == "__main__":
    main()
