#!/usr/bin/env python
"""Skew evidence harness (SCALE.md): measures, on local[32],

1. the synthetic hot-key join (operators/skew.py::hot_key_join) with
   AQE skew-join splitting ON vs OFF, and
2. hot-key aggregation via salted_agg vs the plain single-stage
   groupBy,

printing one line per cell (median of RUNS). The numbers land in
SCALE.md; the plan-shape assertion lives in tests/test_plans.py
(test_aqe_skew_join_split_fires).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.operators.skew import (
    SKEW_JOIN_CONFS,
    hot_key_join,
    salted_agg,
    session_confs,
)
from dynamodb_pitr_restore_cdc_spark.session import get_spark

RUNS = 3
N_ROWS = 8_000_000


def timed(fn) -> float:
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def main() -> None:
    spark = get_spark("skew-bench", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    # -- AQE skew-join split: on vs off ---------------------------------
    for label, enabled in [("aqe_skew_on", "true"), ("aqe_skew_off", "false")]:
        confs = dict(SKEW_JOIN_CONFS, **{"spark.sql.adaptive.skewJoin.enabled": enabled})
        with session_confs(spark, confs):
            med = timed(lambda: hot_key_join(spark, n_rows=N_ROWS).collect())
            j = hot_key_join(spark, n_rows=N_ROWS)
            j.collect()
            fired = "skew=true" in j._jdf.queryExecution().executedPlan().toString().split(
                "== Initial Plan =="
            )[0]
        print(f"{label}: {med}s (n={N_ROWS}, skew_split_fired={fired})", file=sys.stderr)

    # -- hot-key aggregation: salted vs plain ---------------------------
    hot = spark.range(0, N_ROWS, 1, 32).select(
        F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(F.col("id")).alias("key"),
        (F.col("id") % 1000).alias("v"),
    )
    aggs = {"count_rows": F.count("*"), "sum_v": F.sum("v"), "max_v": F.max("v")}

    def plain():
        hot.groupBy("key").agg(*[c.alias(n) for n, c in aggs.items()]).write.format(
            "noop"
        ).mode("overwrite").save()

    def salted():
        salted_agg(hot, "key", aggs).write.format("noop").mode("overwrite").save()

    print(f"agg_plain: {timed(plain)}s", file=sys.stderr)
    print(f"agg_salted: {timed(salted)}s", file=sys.stderr)


if __name__ == "__main__":
    main()
