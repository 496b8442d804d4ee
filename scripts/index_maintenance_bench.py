#!/usr/bin/env python
"""Incremental-vs-rebuild evidence for the CDC-maintained LSH index
(round-10 feature; SCALE.md): at a living corpus, per-batch index
maintenance must cost O(batch) — signatures computed for the arriving
docs only, one blind-append commit — while the round-3 design
re-signatures the whole corpus per refresh. Measures both, plus the
changefeed-scoped delta-pair refresh vs the full band self-join.

Run: python scripts/index_maintenance_bench.py  (~2-4 min on
local[32]; SPARK_GRAFT_SF_DIR overrides the corpus, default sf0.1).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.llm.dedup import to_band_buckets
from dynamodb_pitr_restore_cdc_spark.llm.index_maintenance import LshIndex
from dynamodb_pitr_restore_cdc_spark.registry import release_persisted
from dynamodb_pitr_restore_cdc_spark.session import get_spark
from dynamodb_pitr_restore_cdc_spark.sources import table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH_DOCS = 100


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def main() -> None:
    spark = get_spark("index-maintenance-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    n = docs.count()
    cut = docs.agg(F.expr(f"percentile(doc_id, {1 - BATCH_DOCS / n})")).first()[0]
    loaded = docs.where(F.col("doc_id") <= cut)
    arriving = docs.where(F.col("doc_id") > cut).localCheckpoint(eager=True)
    n_batch = arriving.count()

    base = os.path.join(tempfile.gettempdir(), f"idxbench-{uuid.uuid4().hex[:8]}")
    try:
        idx = LshIndex(spark, os.path.join(base, "t"))
        _, t_init = timed(lambda: idx.init(loaded, seq=1))
        v0 = idx.version()

        # the round-3 shape: a refresh re-signatures the WHOLE corpus
        _, t_rebuild = timed(lambda: to_band_buckets(docs).count())

        # the maintained shape: signatures for the BATCH only + one
        # blind-append commit
        _, t_upsert = timed(lambda: idx.upsert(arriving, seq=2))

        # pair refresh: changefeed-scoped (changed x index) vs full
        # self-join — both read the same folded index state
        _, t_delta = timed(
            lambda: idx.delta_pairs(v0, docs).count()
        )
        release_persisted()
        _, t_full = timed(lambda: idx.pairs(docs).count())
        release_persisted()

        # the quantities that SCALE (wall time at fixture size is
        # floored by Spark job overhead, ~1-2 s per action): rows
        # through the signature UDF per refresh, and candidate rows
        # into the band join per pair refresh
        bands = idx.band_rows().localCheckpoint(eager=True)
        full_cand = (
            bands.alias("a")
            .join(
                bands.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .count()
        )
        changed_bands = bands.join(
            arriving.select("doc_id"), "doc_id", "left_semi"
        )
        delta_cand = (
            changed_bands.alias("a")
            .join(
                bands.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            .count()
        )
        print(
            f"corpus={n} docs, batch={n_batch}: init(load {n - n_batch})="
            f"{t_init:.1f}s  corpus-resignature={t_rebuild:.1f}s/"
            f"{n} rows  incremental-upsert={t_upsert:.1f}s/{n_batch} rows "
            f"({n / n_batch:.0f}x fewer rows signatured per batch)  "
            f"delta-pairs={t_delta:.1f}s/{delta_cand} cand vs "
            f"full-pairs={t_full:.1f}s/{full_cand} cand"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
