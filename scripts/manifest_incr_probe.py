#!/usr/bin/env python
"""Incremental pack-manifest maintenance scaling probe (SCALE.md
round 12; evidences q_llm_pack_manifest_incremental's O(batch) claim).

At 1x and REPLICAS x the sf0.1 documents corpus (replication shape
shared with corpus_scale_probe.py: shifted ids + per-replica suffix
token — content-unique rows forming near-dup cliques), with a
FIXED-SIZE crawl batch (the BATCH_DOCS highest doc_ids of ONE
language), measure:

- apply_epoch: the incremental maintenance of the standing state
  (batch stages 1-6 + touched-language stage-7/8 recompute) — should
  stay ~flat as the corpus grows, because nothing in it re-signatures
  or re-grams standing text;
- full rebuild: stages 1-8 from scratch over the final corpus — grows
  with the corpus (the cadence the incremental path replaces).

Both lanes' manifests are asserted identical per corpus before any
timing (maintenance ≡ rebuild, the registered oracle's claim,
re-proven at every probed scale).

Run: python scripts/manifest_incr_probe.py   (~10-15 min on local[32];
SPARK_GRAFT_SF_DIR / MANIFEST_REPLICAS override).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.llm import manifest_maintenance as mm
from dynamodb_pitr_restore_cdc_spark.llm.curation import (
    VALID_PERMILLE,
    five_grams,
    quality_exact_dedup,
    split_bucket,
)
from dynamodb_pitr_restore_cdc_spark.llm.index_maintenance import LshIndex
from dynamodb_pitr_restore_cdc_spark.registry import (
    release_persisted,
    tracked_persist,
)
from dynamodb_pitr_restore_cdc_spark.session import get_spark
from dynamodb_pitr_restore_cdc_spark.sources import table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("MANIFEST_REPLICAS", "10"))
SHIFT = 10_000_000
BATCH_DOCS = 500  # fixed-size crawl batch at every corpus scale
BATCH_LANG = "en"


def replicate(spark, docs, n, out):
    reps = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .crossJoin(F.broadcast(spark.range(n).select(F.col("id").alias("rep"))))
        .select(
            (F.col("doc_id") + F.col("rep") * SHIFT).alias("doc_id"),
            "lang",
            "source",
            F.concat(F.col("text"), F.lit(" r"), F.col("rep")).alias("text"),
        )
    )
    reps.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


def probe(spark, docs, work, tag):
    # the crawl batch: the BATCH_DOCS highest ids of ONE language, so
    # the touched-language recompute is a strict corpus subset
    lang_ids = docs.where(F.col("lang") == BATCH_LANG).select("doc_id")
    cut = (
        lang_ids.orderBy(F.col("doc_id").desc())
        .limit(BATCH_DOCS)
        .agg(F.min("doc_id"))
        .first()[0]
        - 1
    )
    corpus = docs.where(
        (F.col("doc_id") <= cut) | (F.col("lang") == BATCH_LANG)
    ).localCheckpoint(eager=True)
    e0 = corpus.where(F.col("doc_id") <= cut)
    e1 = corpus.where(F.col("doc_id") > cut)
    n0, n1 = e0.count(), e1.count()

    state = mm.build_epoch0_state(spark, e0, os.path.join(work, f"ix-{tag}"))
    t0 = time.perf_counter()
    incr = mm.apply_epoch(spark, state, e1)
    incr_rows = sorted(map(tuple, incr.collect()))
    t_incr = time.perf_counter() - t0

    # full rebuild over the final corpus (frozen epoch-0 bench), fresh
    # index — what a non-incremental pipeline would run per crawl
    t0 = time.perf_counter()
    dedup_all = tracked_persist(quality_exact_dedup(corpus))
    idx = LshIndex(spark, os.path.join(work, f"ixfull-{tag}"))
    idx.init(dedup_all.select("doc_id", "text"))
    drops = (
        idx.pairs(dedup_all.select("doc_id", "text"))
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    survivors = dedup_all.join(drops, "doc_id", "left_anti")
    bench = (
        five_grams(
            corpus.where(
                (F.col("doc_id") <= cut)
                & (split_bucket(F.col("doc_id")) >= VALID_PERMILLE)
            )
        )
        .select("gram")
        .distinct()
    )
    rebuilt = mm.budget_and_pack(mm.stage_4to6_delta(survivors, bench))
    rebuilt_rows = sorted(map(tuple, rebuilt.collect()))
    t_rebuild = time.perf_counter() - t0
    release_persisted()
    assert incr_rows == rebuilt_rows and incr_rows, "maintenance != rebuild"
    print(
        f"{tag}: corpus={n0 + n1} docs, batch={n1} docs -> "
        f"apply_epoch={t_incr:.1f}s, full rebuild={t_rebuild:.1f}s "
        f"(manifests identical, {len(incr_rows)} rows)"
    )
    return t_incr, t_rebuild


def main() -> None:
    spark = get_spark("manifest-incr-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix=f"manifestprobe-{os.getpid()}-")
    try:
        base_docs = table(spark, SF_DIR, "documents").select(
            "doc_id", "lang", "source", "text"
        )
        i1, r1 = probe(spark, base_docs, work, "1x")
        big = replicate(
            spark, base_docs, REPLICAS, os.path.join(work, "docs10x")
        )
        i10, r10 = probe(spark, big, work, f"{REPLICAS}x")
        print(
            f"scaling {REPLICAS}x corpus, fixed batch: apply_epoch "
            f"{i1:.1f}s -> {i10:.1f}s ({i10 / i1:.1f}x), rebuild "
            f"{r1:.1f}s -> {r10:.1f}s ({r10 / r1:.1f}x)"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
