#!/usr/bin/env python
"""Corpus-build capstone scaling probe (SCALE.md round 11; the round-5
10x-replication methodology applied to q_llm_corpus_build).

Replicates the sf0.1 documents 10x with SHIFTED doc_ids and a
per-replica suffix token appended to the text, then runs the full
eight-stage capstone on both corpora. The suffix makes every replica
content-unique, so exact dedup keeps all 10x rows AND each document
becomes a 10-clique of near-duplicates (J >> 0.5 under 3-shingles) —
a near-dup-heavy corpus that stresses exactly the stages that matter:
the signature pass, the banded self-join (10-20-row band buckets, so
candidates grow ~linearly with docs x clique, never all-pairs), the
verify join, and the greedy drop (which removes ~90% of the corpus —
the realistic crawl-dedup shape).

Timing protocol: one cold + one warm run per corpus, warm reported;
each run builds its OWN index directory (no artifact reuse between
runs — the measured quantity includes the one-time signature pass,
which is the pipeline's dominant scaling term).

Run: python scripts/corpus_scale_probe.py   (~5-10 min on local[32]).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.registry import all_queries, release_persisted
from dynamodb_pitr_restore_cdc_spark.session import get_spark
from dynamodb_pitr_restore_cdc_spark.sources import table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10
SHIFT = 10_000_000


def main() -> None:
    spark = get_spark("corpus-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_queries()["q_llm_corpus_build"]

    big = os.path.join(tempfile.gettempdir(), "corpus_scale_probe_sf")
    shutil.rmtree(big, ignore_errors=True)
    os.makedirs(big)
    docs = table(spark, SF_DIR, "documents")
    reps = None
    for i in range(REPLICAS):
        r = docs.select(
            (F.col("doc_id") + i * SHIFT).alias("doc_id"),
            "lang",
            "source",
            F.concat(F.col("text"), F.lit(f" r{i}")).alias("text"),
        )
        reps = r if reps is None else reps.unionAll(r)
    reps.write.mode("overwrite").parquet(os.path.join(big, "documents.parquet"))
    n0 = docs.count()
    n1 = spark.read.parquet(os.path.join(big, "documents.parquet")).count()
    print(f"base docs={n0}  replicated docs={n1}")

    def run(sf: str) -> float:
        t0 = time.perf_counter()
        spec.builder(spark, sf).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_persisted()
        return dt

    base = [run(SF_DIR) for _ in range(2)]
    scaled = [run(big) for _ in range(2)]
    print(
        f"corpus_build base ({n0} docs): cold={base[0]:.1f}s warm={base[1]:.1f}s\n"
        f"corpus_build 10x ({n1} docs): cold={scaled[0]:.1f}s warm={scaled[1]:.1f}s\n"
        f"warm ratio at 10x data: {scaled[1] / base[1]:.1f}x"
    )
    shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
