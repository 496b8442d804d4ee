"""Measure the decontamination bloom pre-prune: how many test-side
gram rows the bloom removes BEFORE the gram-equijoin's exchange, and
what that does to wall time.

The pruned rows are exactly the shuffle rows saved (the probe side of
the join exchanges only surviving grams), so `rows_pruned / rows_total`
is the shuffle-bytes reduction on the probe side. Run on an otherwise
idle machine (CLAUDE.md: never overlap Spark work with timing runs).

    python scripts/bloom_prune_bench.py [sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.llm.curation import (
    TRAIN_PERMILLE,
    VALID_PERMILLE,
    bloom_build,
    bloom_might_contain,
    split_bucket,
)
from dynamodb_pitr_restore_cdc_spark.registry import release_persisted, tracked_persist
from dynamodb_pitr_restore_cdc_spark.session import get_spark
from dynamodb_pitr_restore_cdc_spark.sources import table


def grams_of(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    return d.where(F.size("w") >= 5).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(w) - 4), i -> concat_ws(' ', slice(w, i, 5)))"
                )
            )
        ).alias("gram"),
    )


def run(spark, sf_dir, use_bloom):
    t0 = time.perf_counter()
    grams = grams_of(spark, sf_dir)
    bucket = split_bucket(F.col("doc_id"))
    train = tracked_persist(grams.where(bucket < TRAIN_PERMILLE).select("gram").distinct())
    test = grams.where(bucket >= VALID_PERMILLE)
    if use_bloom:
        test = (
            test.join(F.broadcast(bloom_build(train)))
            .where(bloom_might_contain("gram"))
            .drop("bf")
        )
    n_hits = test.join(train, "gram").count()
    wall = time.perf_counter() - t0
    release_persisted()
    return n_hits, wall


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bloom-prune-bench", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

    grams = grams_of(spark, sf_dir)
    bucket = split_bucket(F.col("doc_id"))
    train = tracked_persist(grams.where(bucket < TRAIN_PERMILLE).select("gram").distinct())
    test = grams.where(bucket >= VALID_PERMILLE)
    rows_total = test.count()
    rows_kept = (
        test.join(F.broadcast(bloom_build(train)))
        .where(bloom_might_contain("gram"))
        .count()
    )
    n_train_vocab = train.count()
    release_persisted()

    hits_off, wall_off = run(spark, sf_dir, use_bloom=False)
    hits_on, wall_on = run(spark, sf_dir, use_bloom=True)
    assert hits_on == hits_off, (hits_on, hits_off)  # bloom is semantics-free

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "train_vocab": n_train_vocab,
                "test_gram_rows": rows_total,
                "rows_into_join_with_bloom": rows_kept,
                "probe_shuffle_reduction_pct": round(100 * (1 - rows_kept / rows_total), 1),
                "join_hits": hits_on,
                "wall_no_bloom_s": round(wall_off, 2),
                "wall_bloom_s": round(wall_on, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
