#!/usr/bin/env python
"""Filtered batched ANN serving measurement (SCALE.md round 12).

Compares two plans answering the SAME filtered serving batch (top-k
nearest label=SERVE_LABEL vectors for every probe in the multiprobe
slice):

- post-filter: score every candidate in the probed cells, filter
  afterwards — the plan you get when the predicate sits above the
  scorer.
- pushed: the predicate lands in the index scan's PartitionFilters
  (llm/serving.filtered_multiprobe), so only the label slice of each
  probed cell is ever read or scored.

Reports candidate-row counts (the scorer's input) and warm wall times,
and asserts the answers identical.  At fixture scale the win is
bounded by per-job overhead; the candidate reduction is the number
that scales — at 100 TB it is the fraction of the inverted lists the
scan never reads.

Run: python scripts/filtered_serving_bench.py  (SPARK_GRAFT_SF_DIR
overrides the corpus, default sf0.1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.llm import serving
from dynamodb_pitr_restore_cdc_spark.llm.similarity import cosine_col
from dynamodb_pitr_restore_cdc_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 5


def warm_median(fn):
    fn()  # warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main() -> None:
    spark = get_spark("filtered-serving-bench")
    spark.sparkContext.setLogLevel("ERROR")
    serving.filtered_index(spark, SF_DIR).count()  # build once, both lanes read it

    plan = serving.multiprobe_plan(spark, SF_DIR).localCheckpoint(eager=True)
    # post-filter lane: no predicate at the scan, filter above the scorer
    members_all = serving.filtered_index(spark, SF_DIR)
    cand_naive = (
        members_all.join(F.broadcast(plan), "cid")
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id", "label",
            cosine_col(F.col("v"), F.col("pv")).alias("cos"),
        )
    )
    naive = serving.probe_topk(
        cand_naive.where(F.col("label") == serving.SERVE_LABEL)
    )
    # pushed lane: the predicate prunes the index scan
    members_f = serving.filtered_index(spark, SF_DIR).where(
        F.col("label") == serving.SERVE_LABEL
    )
    cand_fast = (
        members_f.join(F.broadcast(plan), "cid")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine_col(F.col("v"), F.col("pv")).alias("cos"))
    )
    fast = serving.probe_topk(cand_fast)

    n_naive, n_fast = cand_naive.count(), cand_fast.count()
    a = sorted(map(tuple, fast.collect()))
    b = sorted(map(tuple, naive.collect()))
    assert a == b, "filtered and post-filtered answers diverge"

    t_naive = warm_median(lambda: naive.count())
    t_fast = warm_median(lambda: fast.count())
    n_probes = plan.select("qid").distinct().count()
    print(
        f"filtered serving sf={SF_DIR} probes={n_probes} "
        f"label={serving.SERVE_LABEL}: scored candidates "
        f"post-filter={n_naive} pushed={n_fast} "
        f"(reduction {n_naive / max(n_fast, 1):.1f}x), warm median "
        f"post-filter={t_naive * 1000:.0f}ms pushed={t_fast * 1000:.0f}ms, "
        f"answers identical ({len(a)} rows)"
    )


if __name__ == "__main__":
    main()
