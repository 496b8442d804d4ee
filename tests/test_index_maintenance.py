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
