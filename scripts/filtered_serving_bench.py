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

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.llm import serving
from dynamodb_pitr_restore_cdc_spark.llm.kmeans import assignment_ranking
from dynamodb_pitr_restore_cdc_spark.llm.similarity import (
    IVF_PROBE_CELLS,
    MULTIPROBE_MOD,
    MULTIPROBE_RES,
    MULTIPROBE_TOP_K,
    _as_double,
    cosine_col,
    trained_quantizer,
)
from dynamodb_pitr_restore_cdc_spark.session import get_spark
from dynamodb_pitr_restore_cdc_spark.sources import table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 5


def probe_plan(spark):
    vectors, cents = trained_quantizer(spark, SF_DIR)
    is_probe = F.col("vec_id") % MULTIPROBE_MOD == MULTIPROBE_RES
    probe_cells = (
        assignment_ranking(vectors.where(is_probe), cents)
        .where(F.col("rn") <= IVF_PROBE_CELLS)
        .select(F.col("vec_id").alias("qid"), "cid")
    )
    probes = (
        table(spark, SF_DIR, "embeddings")
        .where(is_probe)
        .select(F.col("vec_id").alias("qid"), _as_double("embedding").alias("pv"))
    )
    return probe_cells.join(probes, "qid")


def post_filter_lane(spark, plan):
    members = serving.filtered_index(spark, SF_DIR)  # NO predicate at scan
    cand = (
        members.join(F.broadcast(plan), "cid")
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id", "label",
            cosine_col(F.col("v"), F.col("pv")).alias("cos"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), "vec_id")
    return cand, (
        cand.where(F.col("label") == serving.SERVE_LABEL)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= MULTIPROBE_TOP_K)
        .select("qid", "vec_id", F.round("cos", 4).alias("cos_sim"))
    )


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

    plan = probe_plan(spark).localCheckpoint(eager=True)
    cand_naive, naive = post_filter_lane(spark, plan)

    members_f = serving.filtered_index(spark, SF_DIR).where(
        F.col("label") == serving.SERVE_LABEL
    )
    cand_fast = (
        members_f.join(F.broadcast(plan), "cid")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine_col(F.col("v"), F.col("pv")).alias("cos"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), "vec_id")
    fast = (
        cand_fast.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= MULTIPROBE_TOP_K)
        .select("qid", "vec_id", F.round("cos", 4).alias("cos_sim"))
    )

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
