#!/usr/bin/env python
"""10x replication experiment for the round-6 continuation operators.

Replicates the sf0.1 documents/embeddings/events fixtures 10x with
shifted ids into a temp dir (documents/embeddings keep their text /
vector payloads — exact replicas are the dedup-HEAVY case on purpose:
a 10x-replicated corpus is precisely what a dedup pass exists for) and
re-runs the new operators warm (2nd run reported) at both scales.

Usage: python scripts/llm_scale_bench.py
Prints a markdown table; numbers are recorded in SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from dynamodb_pitr_restore_cdc_spark.registry import (  # noqa: E402
    all_queries,
    release_persisted,
)
from dynamodb_pitr_restore_cdc_spark.session import get_spark  # noqa: E402
from dynamodb_pitr_restore_cdc_spark.sources import table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SCALE_REPLICAS", "10"))

QUERIES = [
    "q_llm_semantic_dedup",
    "q_stream_semantic_neardup",
    "q_llm_token_budget_sample",
    "q_ts_forecast_backtest",
    "q_cdc_branch_merge",
    "q_stream_cusum",
]

SHIFT_KEYS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}


def replicate(spark, out_dir: str) -> None:
    for name, keys in SHIFT_KEYS.items():
        # one scan, not REPLICAS scans: persist the source before the
        # replica union references it REPLICAS times (no cross-branch CSE)
        src = table(spark, SF_DIR, name).persist()
        maxes = src.agg(*[F.max(k).alias(k) for k in keys]).first()
        parts = []
        for i in range(REPLICAS):
            rep = src
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * (maxes[k] + 1)))
            parts.append(rep)
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.unionByName(p)
        acc.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
        src.unpersist()


def run_warm(spec, spark, sf_dir: str) -> float:
    # warm-up run (quantizer/index artifacts train here)
    spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    release_persisted()
    t0 = time.perf_counter()
    spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    release_persisted()
    return elapsed


def main() -> None:
    spark = get_spark("llm-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    rep_dir = tempfile.mkdtemp(prefix="spark_cdc_scale_")
    try:
        replicate(spark, rep_dir)
        print(f"| Query | sf0.1 | {REPLICAS}x | ratio |")
        print("|---|---|---|---|")
        for name in QUERIES:
            base = run_warm(specs[name], spark, SF_DIR)
            big = run_warm(specs[name], spark, rep_dir)
            print(f"| {name} | {base:.2f} s | {big:.2f} s | {big / base:.1f}x |")
    finally:
        shutil.rmtree(rep_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
