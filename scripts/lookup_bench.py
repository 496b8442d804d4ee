"""Point-lookup latency evidence: lookup() vs a full-table filter.

Builds the shared 3-commit sink at $SPARK_GRAFT_SF_DIR (default
sf0.1), then times three access paths for the same keys:

  full-scan   visible().where(key = k)     -- reads every bucket
  lookup      sink.lookup(k)               -- manifest -> ONE bucket
  miss        sink.lookup(absent)          -- bloom -> ZERO files

Run: python scripts/lookup_bench.py
Appends nothing; prints one JSON line. Numbers land in SCALE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from dynamodb_pitr_restore_cdc_spark.operators.cdc import changelog  # noqa: E402
from dynamodb_pitr_restore_cdc_spark.session import tune_session  # noqa: E402
from dynamodb_pitr_restore_cdc_spark.streaming.versioned_sink import (  # noqa: E402
    shared_sink,
)


def timed(fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]  # median


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = tune_session(
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lookup-bench")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sink, _, _ = shared_sink(spark, sf_dir)
    keys = [
        int(r.key)
        for r in changelog(spark, sf_dir).select("key").distinct().limit(5).collect()
    ]

    full = timed(
        lambda: [
            sink.visible().where(F.col("key") == k).collect() for k in keys
        ]
    )
    point = timed(lambda: [sink.lookup(k).collect() for k in keys])
    miss = timed(
        lambda: [sink.lookup(10_000_000 + k).collect() for k in keys]
    )
    print(
        json.dumps(
            {
                "metric": "point_lookup_vs_scan_sec_per_5keys",
                "sf_dir": sf_dir,
                "full_scan_filter": round(full, 4),
                "manifest_lookup": round(point, 4),
                "bloom_miss": round(miss, 4),
                "speedup_hit": round(full / point, 2),
                "speedup_miss": round(full / miss, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
