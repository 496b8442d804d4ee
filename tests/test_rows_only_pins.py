"""Standing CI pins for the rows-only registry entries (2 as of round
14) plus the simhash family's in-process twins.

The driver's rotation deliberately parks rows-only queries (no DuckDB
oracle) last, so they may never earn a fresh driver row — these tests
are their permanent local gate (round-9 verdict, item 5): each gets a
fixture-derived row-count law plus an independent semantic twin
computed in-test, so a silent break can't hide behind staleness.

- q_agg_approx_distinct / q_agg_hll_merge: sketch BINARIES are
  engine-specific (no oracle), but estimates are bounded — assert
  against Spark-exact ground truth.  STILL rows-only.
- q_llm_simhash / q_llm_simhash_pairs: ORACLED since round 14 (the
  crc32 byte-table fold + splitmix64 are re-derived in DuckDB —
  dedup._SIMHASH_SKETCH_CTES); their pins stay as an independent
  third implementation of the banded-pair pipeline.
"""

from collections import defaultdict

from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.registry import all_queries, release_persisted
from dynamodb_pitr_restore_cdc_spark.sources import table

SPECS = all_queries()


def test_approx_distinct_pinned(spark, sf_dir):
    got = {
        r.l_returnflag: r
        for r in SPECS["q_agg_approx_distinct"].builder(spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: r
        for r in table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("d"), F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)  # row-count law: one row per flag
    for flag, r in got.items():
        assert r.n_rows == exact[flag].n  # the exact column IS exact
        d = exact[flag].d
        # rsd=0.02: 3 sigma ≈ 6% relative error (plus an absolute floor
        # for tiny fixture groups)
        assert abs(r.approx_parts - d) <= max(3, 0.06 * d), (flag, r, d)


def test_hll_merge_pinned(spark, sf_dir):
    rows = SPECS["q_agg_hll_merge"].builder(spark, sf_dir).collect()
    assert len(rows) == 1  # row-count law: one merged estimate
    r = rows[0]
    o = table(spark, sf_dir, "orders")
    exact_d, total, statuses = o.agg(
        F.countDistinct("o_custkey"),
        F.count("*"),
        F.countDistinct("o_orderstatus"),
    ).first()
    assert r.total_rows == total
    assert r.n_sketches == statuses
    # merged-sketch estimate within HLL default accuracy of the truth
    assert abs(r.merged_distinct_custkeys - exact_d) <= max(3, 0.06 * exact_d)


def test_simhash_pinned(spark, sf_dir):
    rows = SPECS["q_llm_simhash"].builder(spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs  # row-count law: one hash per document
    assert len({r.doc_id for r in rows}) == n_docs
    # deterministic run-to-run (the whole point of a content sketch)
    again = SPECS["q_llm_simhash"].builder(spark, sf_dir).collect()
    assert {(r.doc_id, r.simhash) for r in rows} == {
        (r.doc_id, r.simhash) for r in again
    }


def test_simhash_pairs_pinned(spark, sf_dir):
    """Exact in-process twin of the banded-pair pipeline: candidates =
    pairs sharing any 16-bit band of the published hashes, verified at
    popcount(xor) ≤ 16 — the engine result must match it row for row
    (including the hamming column), so the pair COUNT is pinned to the
    fixture by construction."""
    from dynamodb_pitr_restore_cdc_spark.llm.dedup import (
        SIMHASH_BANDS,
        SIMHASH_MAX_HAMMING,
    )

    sh = {
        r.doc_id: r.simhash
        for r in SPECS["q_llm_simhash"].builder(spark, sf_dir).collect()
    }
    buckets = defaultdict(list)
    for d, h in sh.items():
        for b in range(SIMHASH_BANDS):
            buckets[(b, (h >> (16 * b)) & 0xFFFF)].append(d)
    cands = set()
    for docs in buckets.values():
        docs.sort()
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                cands.add((docs[i], docs[j]))
    expected = set()
    for a, b in cands:
        ham = bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")
        if ham <= SIMHASH_MAX_HAMMING:
            expected.add((a, b, ham))
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in SPECS["q_llm_simhash_pairs"].builder(spark, sf_dir).collect()
    }
    release_persisted()
    assert expected, "fixture produced no near-dup pairs: pin is vacuous"
    assert got == expected
