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


class _SyntheticBands(LshIndex):
    """drop_set test double: hand-placed band rows, real _verify.
    Bypasses LshIndex.__init__ (no sink) — drop_set touches only
    band_rows() and _verify()."""

    def __init__(self, spark, rows):
        self.spark = spark
        self._rows = rows

    def band_rows(self):
        return self.spark.createDataFrame(
            pd.DataFrame(self._rows, columns=["doc_id", "band", "bucket"]),
            schema="doc_id long, band int, bucket long",
        )


def _drop_ids(idx, corpus, **kw):
    out = {r.doc_id for r in idx.drop_set(corpus, **kw).collect()}
    release_persisted()
    return out


def test_drop_set_two_phase_equals_plain_on_fixture(spark, sf_dir, tmp_path):
    """The auto-gate's two lanes must return byte-identical drop sets
    on the real fixture corpus (forced both ways — the registered
    fixture always takes the plain lane by the gate)."""
    from dynamodb_pitr_restore_cdc_spark.sources import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = LshIndex(spark, str(tmp_path / "dropset"))
    idx.init(docs)
    plain = _drop_ids(idx, docs, force_two_phase=False)
    two = _drop_ids(idx, docs, force_two_phase=True)
    # ...and the old consumer expression (pairs → doc_b) is the truth
    want = {
        r.doc_b for r in idx.pairs(docs).select("doc_b").distinct().collect()
    }
    release_persisted()
    assert plain == two == want and want


def test_drop_set_phase2_catches_min_edge_failures(spark):
    """The planted case phase 1 alone would get WRONG: docs 1,2,3 share
    one band bucket; the bucket minimum (1) is a near-dup of NOTHING,
    but 3 is a near-dup of 2 — so 3 must drop via the non-minimum edge
    (2,3), which only phase 2 verifies. A keep-lowest shortcut that
    stopped at bucket-minimum edges would keep 3."""
    A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    B = "the quick brown fox jumps over the lazy dog again and again today"
    C = B + " tail"
    corpus = _docs(spark, [(1, A), (2, B), (3, C)])
    idx = _SyntheticBands(
        spark, [(1, 0, 42), (2, 0, 42), (3, 0, 42)]
    )
    assert _drop_ids(idx, corpus, force_two_phase=True) == {3}
    assert _drop_ids(idx, corpus, force_two_phase=False) == {3}


def test_drop_set_clique_drops_in_phase_one(spark):
    """A pure near-dup clique resolves entirely in phase 1 (every
    member verifies against the bucket minimum) and phase 2 has no
    higher-side candidates left — the O(c)-per-bucket case the
    mitigation exists for."""
    B = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = _docs(spark, [(i, B + f" v{i % 2}") for i in range(1, 6)])
    idx = _SyntheticBands(spark, [(i, 0, 7) for i in range(1, 6)])
    assert _drop_ids(idx, corpus, force_two_phase=True) == {2, 3, 4, 5}
    assert _drop_ids(idx, corpus, force_two_phase=False) == {2, 3, 4, 5}


def test_drop_set_dropped_doc_still_witnesses(spark):
    """A doc dropped in phase 1 must STILL serve as the lower witness
    that drops a later doc it shares a DIFFERENT bucket with (the
    lower side of phase 2 is the full band set on purpose): 2 drops
    via (1,2) in bucket 7; 3 shares only bucket 8 with 2 — (2,3) must
    still drop 3 even though 2 is already gone."""
    B = "the quick brown fox jumps over the lazy dog again and again today"
    A2 = B + " x"
    A3 = B + " y"
    corpus = _docs(spark, [(1, B), (2, A2), (3, A3)])
    idx = _SyntheticBands(
        spark, [(1, 0, 7), (2, 0, 7), (2, 1, 8), (3, 1, 8)]
    )
    assert _drop_ids(idx, corpus, force_two_phase=True) == {2, 3}
    assert _drop_ids(idx, corpus, force_two_phase=False) == {2, 3}


def test_drop_set_eligibility_restricts_both_endpoints(spark):
    """eligible must remove a doc as BOTH drop target and lower
    witness — the streaming capstone's both-sides-deduped semantics:
    with 2 ineligible, 3's only witness path through 2 disappears in
    both lanes."""
    B = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = _docs(spark, [(1, B), (2, B + " x"), (3, B + " y")])
    # 1-2 share bucket 7, 2-3 share bucket 8; 1 and 3 share nothing
    bands = [(1, 0, 7), (2, 0, 7), (2, 1, 8), (3, 1, 8)]
    eligible = _docs(spark, [(1, ""), (3, "")]).select("doc_id")
    for force in (True, False):
        idx = _SyntheticBands(spark, bands)
        got = _drop_ids(
            idx, corpus, eligible=eligible, force_two_phase=force
        )
        assert got == set(), got


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.data())
def test_drop_set_lanes_equal_property(spark, data):
    """Adversarial band structures: for RANDOM (doc, band, bucket)
    assignments over texts with a mix of near-dup and unrelated
    content (plus a random eligibility subset), the two-phase lane
    must equal the plain full-pairs lane exactly. This sweeps the
    shapes the planted tests fix one at a time: min-edge failures,
    cross-bucket witnesses, dropped-doc witnesses, eligibility holes."""
    n = data.draw(st.integers(2, 8))
    base = "the quick brown fox jumps over the lazy dog again and again today"
    # each doc is either a near-variant of base (1-token suffix) or one
    # of two unrelated texts — random mixes give buckets where some,
    # all, or none of the members verify
    pool = [
        base,
        base + " x",
        base + " y",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven twelve",
    ]
    corpus_rows = [
        (i, data.draw(st.sampled_from(pool))) for i in range(1, n + 1)
    ]
    bands = [
        (i, b, data.draw(st.integers(0, 2)))
        for i in range(1, n + 1)
        for b in range(data.draw(st.integers(1, 2)))
    ]
    elig_ids = [i for i in range(1, n + 1) if data.draw(st.booleans())]
    corpus = _docs(spark, corpus_rows)
    idx = _SyntheticBands(spark, bands)
    eligible = (
        _docs(spark, [(i, "") for i in elig_ids]).select("doc_id")
        if elig_ids and data.draw(st.booleans())
        else None
    )
    plain = _drop_ids(idx, corpus, eligible=eligible, force_two_phase=False)
    two = _drop_ids(idx, corpus, eligible=eligible, force_two_phase=True)
    assert plain == two


def test_dropset_gate_fixture_plain_clique_two_phase(spark, sf_dir):
    """Pin the gate DECISION: the registered fixture's band fan-out
    must stay on the plain lane (the driver lifecycle r01-r12 rows
    verified), while a 100-clique-shaped band table must cross to
    two-phase — the decision, not just the lanes' equality."""
    from dynamodb_pitr_restore_cdc_spark.llm.dedup import (
        band_buckets,
        dropset_gate,
    )

    two, est_pairs, est_min = dropset_gate(band_buckets(spark, sf_dir))
    assert not two, (est_pairs, est_min)
    # synthetic probe regime: 700 (band, bucket) groups of 100 docs
    # each → est_pairs = 700·4950 = 3.47M ≥ 200k and ≥ 4× (700·99)
    clique = spark.range(70_000).selectExpr(
        "cast(id as long) as doc_id",
        "cast(id % 16 as int) as band",
        "cast(id div 1600 as long) as bucket",
    )
    two, est_pairs, est_min = dropset_gate(clique)
    assert two and est_pairs >= 4 * est_min, (est_pairs, est_min)
