#!/usr/bin/env python
"""Corpus-build capstone scaling probe (SCALE.md rounds 11-12; the
round-5 10x-replication methodology applied to q_llm_corpus_build).

Replicates the sf0.1 documents SPARK_GRAFT_REPLICAS times (default 10;
round 12 runs 100 = ~500k docs) with SHIFTED doc_ids and a per-replica
suffix token appended to the text, then runs the full eight-stage
capstone on both corpora. The suffix makes every replica
content-unique, so exact dedup keeps all replicated rows AND each
document becomes an R-clique of near-duplicates (J >> 0.5 under
3-shingles) — a near-dup-heavy corpus that stresses exactly the stages
that matter: the signature pass, the banded self-join (clique-sized
band buckets, so candidates grow ~docs x clique, never all-pairs), the
verify join, and the greedy drop (which removes (R-1)/R of the corpus
— the realistic crawl-dedup shape).

Besides the end-to-end ratio the probe times the capstone's scaling
stages separately on the replicated corpus (each on a fresh index
directory): quality+exact dedup, the signature pass (index init), and
the banded pair generation + verify — the breakdown that names the
next bottleneck.

Timing protocol: one cold + one warm run per corpus, warm reported;
each run builds its OWN index directory (no artifact reuse between
runs — the measured quantity includes the one-time signature pass,
which is the pipeline's dominant scaling term).

Run: python scripts/corpus_scale_probe.py   (~5-10 min at 10x,
~20-40 min at SPARK_GRAFT_REPLICAS=100, local[32]).
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
REPLICAS = int(os.environ.get("SPARK_GRAFT_REPLICAS", "10"))
# the full-pairs drop-set lane OOMs the JVM past ~300x (SCALE.md
# round 13): above this the probe times only the lanes that survive
PLAIN_LANE_MAX_REPLICAS = 100
# Replica id stride.  curation.mult_hash32 (round 15) removed the old
# int64 overflow wall at doc_id ≈ 3.47e9 (found by THIS probe at 1000x
# with the old 1e7 stride), but the hash's id domain is mod 2^32 —
# replicas whose ids straddle a 2^32 boundary would alias split/sample
# buckets, so the stride still keeps REPLICAS * SHIFT under 2^32
# (1e5 → 42,949x safe).
SHIFT = 100_000


def main() -> None:
    spark = get_spark("corpus-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_queries()["q_llm_corpus_build"]

    big = os.path.join(tempfile.gettempdir(), f"corpus_scale_probe_sf-{os.getpid()}")
    shutil.rmtree(big, ignore_errors=True)
    os.makedirs(big)
    docs = table(spark, SF_DIR, "documents")
    # A base corpus with doc_id >= SHIFT would alias replica id spaces
    # (colliding doc_ids silently corrupt dedup semantics) — fail loud
    # instead (round-14 advice).
    max_id = docs.agg(F.max("doc_id")).first()[0]
    assert max_id < SHIFT, (
        f"base corpus max doc_id {max_id} >= replica stride {SHIFT}: "
        "replicated ids would collide; raise SHIFT (stay under "
        "2^32/REPLICAS so mult_hash32's 32-bit id domain is unique)"
    )
    # replicate via a range crossJoin (a REPLICAS-branch union plan is
    # quadratic to analyze at 100x) and repartition the compact rows
    # BEFORE the fan-out so the write isn't one input split (the
    # round-5 one-split gotcha)
    reps = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .crossJoin(F.broadcast(spark.range(REPLICAS).select(F.col("id").alias("rep"))))
        .select(
            (F.col("doc_id") + F.col("rep") * SHIFT).alias("doc_id"),
            "lang",
            "source",
            F.concat(F.col("text"), F.lit(" r"), F.col("rep")).alias("text"),
        )
    )
    reps.write.mode("overwrite").parquet(os.path.join(big, "documents.parquet"))
    n0 = docs.count()
    n1 = spark.read.parquet(os.path.join(big, "documents.parquet")).count()
    print(f"base docs={n0}  replicated docs={n1}  ({REPLICAS}x)")

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
        f"corpus_build {REPLICAS}x ({n1} docs): cold={scaled[0]:.1f}s "
        f"warm={scaled[1]:.1f}s\n"
        f"warm ratio at {REPLICAS}x data: {scaled[1] / base[1]:.1f}x "
        f"({scaled[1] / n1 * 1000:.2f} ms/doc vs {base[1] / n0 * 1000:.2f} ms/doc)"
    )

    # ---- stage breakdown on the replicated corpus ---------------------
    from dynamodb_pitr_restore_cdc_spark.llm.curation import quality_exact_dedup
    from dynamodb_pitr_restore_cdc_spark.llm.index_maintenance import LshIndex
    from dynamodb_pitr_restore_cdc_spark.registry import tracked_persist

    bdocs = spark.read.parquet(os.path.join(big, "documents.parquet"))
    t0 = time.perf_counter()
    deduped = tracked_persist(quality_exact_dedup(bdocs))
    n_dedup = deduped.count()
    t_dedup = time.perf_counter() - t0

    ixdir = os.path.join(big, "ix")
    t0 = time.perf_counter()
    idx = LshIndex(spark, ixdir)
    idx.init(deduped.select("doc_id", "text"))
    t_sig = time.perf_counter() - t0

    corpus = deduped.select("doc_id", "text")
    # the full PAIR LIST is the documented quadratic consumer-contract
    # boundary (CLAUDE.md: greedy consumers read the DROP SET, never
    # the pair list) — at clique corpora past ~100x its OUTPUT is what
    # explodes, so the stage breakdown skips it with the plain lane
    plain_env = os.environ.get("CORPUS_PROBE_PLAIN")
    run_plain = (
        REPLICAS <= PLAIN_LANE_MAX_REPLICAS
        if plain_env is None
        else plain_env == "1"
    )
    pairs_desc = "pair list SKIPPED (quadratic at clique corpora)"
    if run_plain:
        t0 = time.perf_counter()
        n_pairs = idx.pairs(corpus).count()
        t_pairs = time.perf_counter() - t0
        release_persisted()
        pairs_desc = f"banded pairs + verify {t_pairs:.1f}s ({n_pairs} pairs)"
    print(
        f"stage breakdown at {REPLICAS}x: quality+exact_dedup {t_dedup:.1f}s "
        f"({n_dedup} rows) | signature pass + index init {t_sig:.1f}s | "
        + pairs_desc
    )

    # ---- drop-set lanes (round 13: the clique-quadratic mitigation) ---
    # what the capstone actually consumes is the greedy keep-lowest DROP
    # SET; time the plain (full-pairs) lane against the two-phase
    # bucket-minimum lane and assert the sets byte-identical at scale.
    # The plain lane OOMs the JVM past ~300x (SCALE.md round 13), so it
    # is skipped above PLAIN_LANE_MAX_REPLICAS (override via
    # CORPUS_PROBE_PLAIN=1 to force it, =0 to skip at any scale) —
    # otherwise the documented 300x two-phase measurement could not be
    # reproduced by running this script unmodified (round-13 advice).
    plain: set | None = None
    if run_plain:
        t0 = time.perf_counter()
        plain = {
            r.doc_id
            for r in idx.drop_set(corpus, force_two_phase=False).collect()
        }
        t_plain = time.perf_counter() - t0
        release_persisted()
    t0 = time.perf_counter()
    two = {r.doc_id for r in idx.drop_set(corpus, force_two_phase=True).collect()}
    t_two = time.perf_counter() - t0
    release_persisted()
    if plain is not None:
        assert plain == two, (
            f"drop-set lanes diverged: plain-only={sorted(plain - two)[:5]} "
            f"two-only={sorted(two - plain)[:5]}"
        )
    t0 = time.perf_counter()
    auto = {r.doc_id for r in idx.drop_set(corpus).collect()}
    t_auto = time.perf_counter() - t0
    release_persisted()
    assert auto == two
    plain_desc = (
        f"plain full-pairs verify {t_plain:.1f}s "
        f"({t_plain / max(t_two, 1e-9):.1f}x two-phase) | "
        if plain is not None
        else "plain lane SKIPPED ("
        + (
            "CORPUS_PROBE_PLAIN=0"
            if plain_env == "0"
            else f"> {PLAIN_LANE_MAX_REPLICAS}x; CORPUS_PROBE_PLAIN=1 forces"
        )
        + ") | "
    )
    print(
        f"drop-set at {REPLICAS}x ({len(two)} dropped"
        + (", lanes identical" if plain is not None else "")
        + f"): {plain_desc}two-phase bucket-min {t_two:.1f}s | "
        f"auto-gate lane {t_auto:.1f}s"
    )
    shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
