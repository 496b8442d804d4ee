"""LshIndex invariants the oracled drills don't isolate: out-of-order
maintenance (a stale signature batch must LOSE to an already-applied
newer one — the sink's per-key max-seq fold applied to index state)
and delta-pair scoping."""

import pandas as pd
from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.llm.index_maintenance import LshIndex
from dynamodb_pitr_restore_cdc_spark.registry import release_persisted


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        schema="doc_id long, text string",
    )


BASE = "the quick brown fox jumps over the lazy dog again and again today"
OTHER = "completely different words live in this document nothing shared here at all"


def test_stale_upsert_loses_and_removal_retracts(spark, tmp_path):
    corpus_v2 = _docs(
        spark,
        [(1, BASE), (2, BASE), (3, OTHER)],  # 1-2 near-dups at seq 2
    )
    idx = LshIndex(spark, str(tmp_path / "idx"))
    idx.init(_docs(spark, [(1, BASE), (2, OTHER), (3, OTHER)]), seq=1)
    # doc 2 edited to BASE at seq 3 → (1,2) becomes a pair
    idx.upsert(_docs(spark, [(2, BASE)]), seq=3)
    # a STALE replay of the original doc 2 (seq 2 < 3) must lose: the
    # pair set stays
    idx.upsert(_docs(spark, [(2, OTHER)]), seq=2)
    pairs = {(r.doc_a, r.doc_b) for r in idx.pairs(corpus_v2).collect()}
    release_persisted()
    assert pairs == {(1, 2)}
    # retraction removes every pair touching the doc
    idx.remove(_docs(spark, [(2, "")]).select("doc_id"), seq=4)
    pairs = {(r.doc_a, r.doc_b) for r in idx.pairs(corpus_v2).collect()}
    release_persisted()
    assert pairs == set()


def test_delta_pairs_scoped_to_changed_docs(spark, tmp_path):
    # 1-2 pair exists from init; 3 is edited to join them — the delta
    # query must report 3's new pairs but NOT re-emit the untouched 1-2
    corpus = _docs(spark, [(1, BASE), (2, BASE), (3, BASE)])
    idx = LshIndex(spark, str(tmp_path / "idx"))
    idx.init(_docs(spark, [(1, BASE), (2, BASE), (3, OTHER)]), seq=1)
    v0 = idx.version()
    idx.upsert(_docs(spark, [(3, BASE)]), seq=2)
    delta = {
        (r.doc_a, r.doc_b) for r in idx.delta_pairs(v0, corpus).collect()
    }
    release_persisted()
    assert delta == {(1, 3), (2, 3)}
    full = {(r.doc_a, r.doc_b) for r in idx.pairs(corpus).collect()}
    release_persisted()
    assert full == {(1, 2), (1, 3), (2, 3)}


def test_ivf_index_fold_and_fresh_handle(spark, tmp_path):
    """IvfIndex fold invariants the registered drill can't isolate (its
    init/upsert key sets are disjoint): an upsert of an EXISTING vec_id
    must replace its cell, a stale lower-seq replay must lose, and a
    FRESH handle on the durable path must search/maintain via the
    persisted quantizer (no in-memory centroid dependency)."""
    import pandas as pd

    from dynamodb_pitr_restore_cdc_spark.llm.index_maintenance import IvfIndex

    rng_rows = []
    # 12 deterministic 64-dim vectors: ids 1..8 seed the 8 centroids
    for i in range(12):
        rng_rows.append((i, [float((i * 37 + d * 11) % 100) / 100 for d in range(64)]))
    vecs = spark.createDataFrame(
        pd.DataFrame(rng_rows, columns=["vec_id", "embedding"]),
        schema="vec_id long, embedding array<double>",
    )
    from dynamodb_pitr_restore_cdc_spark.llm.kmeans import quantize_expr

    q = vecs.select("vec_id", quantize_expr(F.col("embedding")).alias("qv"))
    idx = IvfIndex(spark, str(tmp_path / "idx"))
    idx.init(q, seq=1)
    state0 = {r.vec_id: r.cid for r in idx.sink.visible().collect()}
    # move vec 11 to vec 2's vector → its cell must become vec 2's
    moved = q.where(F.col("vec_id") == 2).select(
        F.lit(11).cast("long").alias("vec_id"), "qv"
    )
    idx.upsert(moved, seq=2)
    state1 = {r.vec_id: r.cid for r in idx.sink.visible().collect()}
    assert state1[11] == state0[2]
    assert state1[11] != state0[11] or state0[11] == state0[2]
    # stale replay of the ORIGINAL vec 11 (seq 1 < 2) must lose
    idx2 = IvfIndex(spark, str(tmp_path / "idx"))  # fresh handle: the
    # persisted quantizer must serve assignment without init()
    idx2.upsert(q.where(F.col("vec_id") == 11), seq=1)
    state2 = {r.vec_id: r.cid for r in idx2.sink.visible().collect()}
    assert state2[11] == state0[2], "stale replay resurrected the old cell"
    # removal tombstones the row
    idx2.remove(q.where(F.col("vec_id") == 11).select("vec_id"), seq=3)
    assert 11 not in {r.vec_id for r in idx2.sink.visible().collect()}


def test_ivf_index_never_trained_fails_loudly(spark, tmp_path):
    import pytest

    from dynamodb_pitr_restore_cdc_spark.llm.index_maintenance import IvfIndex

    idx = IvfIndex(spark, str(tmp_path / "fresh"))
    with pytest.raises(ValueError, match="no trained quantizer"):
        idx._centroids()
