"""Object-store fault injection against the versioned sink's commit
protocol.

`LocalPointerStore` can only lose a CAS cleanly; a real object store
(S3 conditional put, DynamoDB conditional write, catalog CAS) also
fails DIRTY: requests that never arrive, responses lost after the
server applied the swap, and spurious condition failures. The
`InMemoryConditionalPointerStore` simulates exactly those modes, and
these tests pin the protocol's answer to each one:

- definitely-not-applied failures are retried same-CAS, bounded;
- unknown outcomes are resolved by a strong read, NEVER blind-retried
  (a blind retry of a CAS that already won would lose to itself and
  double-commit the batch);
- an ambiguous winner buried by a successor's commit is recognized
  via the roll-forward-published root manifest (content identity);
- every failure path ends in either a correct commit or a typed error
  with no visible state change.

Reference parity: the reference sidesteps all of this with a FIFO
queue and a single consumer (`cdk-stack.ts:47`); an engine committing
directly against an object store must solve it in the pointer swap.
"""

import os

import pytest
from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.operators.cdc import changelog, fold_changelog
from dynamodb_pitr_restore_cdc_spark.streaming.versioned_sink import (
    CommitStateUnknownError,
    InMemoryConditionalPointerStore,
    PointerStoreUnavailableError,
    VersionedCdcSink,
)

from .conftest import SF_SMOKE


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _changelog(spark):
    return changelog(spark, SF_SMOKE).select("seq_no", "op", "key", "payload_value")


def _sink(spark, tmp_path, store, name="sink", **kw):
    return VersionedCdcSink(
        spark, str(tmp_path / name), n_buckets=8, pointer_store=store, **kw
    )


def _three_way_split(cl):
    """(base, mid, tail) thirds of the changelog by seq_no."""
    max_seq = cl.agg(F.max("seq_no")).first()[0]
    c1, c2 = max_seq // 3, (2 * max_seq) // 3
    return (
        cl.where(F.col("seq_no") <= c1),
        cl.where((F.col("seq_no") > c1) & (F.col("seq_no") <= c2)),
        cl.where(F.col("seq_no") > c2),
    )


# -- store unit behavior ----------------------------------------------------


def test_store_conditional_put_semantics():
    s = InMemoryConditionalPointerStore()
    assert s.read() is None
    assert s.put_if(None, "1:aaa")
    assert not s.put_if(None, "1:bbb")
    assert not s.put_if("1:zzz", "2:bbb")
    assert s.put_if("1:aaa", "2:bbb")
    assert s.read() == "2:bbb"
    assert s.losses == 2


def test_store_fault_modes_fire_once_in_order():
    s = InMemoryConditionalPointerStore()
    s.inject("spurious-loss")
    assert not s.put_if(None, "1:aaa")
    assert s.read() is None  # value untouched
    s.inject("unavailable")
    with pytest.raises(PointerStoreUnavailableError):
        s.put_if(None, "1:aaa")
    assert s.read() is None
    s.inject("unknown-applied")
    with pytest.raises(CommitStateUnknownError):
        s.put_if(None, "1:aaa")
    assert s.read() == "1:aaa"  # applied despite the lost response
    s.inject("unknown-lost")
    with pytest.raises(CommitStateUnknownError):
        s.put_if("1:aaa", "2:bbb")
    assert s.read() == "1:aaa"  # NOT applied
    assert s.put_if("1:aaa", "2:bbb")  # faults exhausted: normal again
    assert s.faults_fired == 4


# -- protocol under injected faults ----------------------------------------


def test_spurious_cas_loss_retries_without_remerge(spark, tmp_path):
    """A spurious condition failure (nothing actually changed) must be
    absorbed by the optimistic loop's re-read — same view, so NO
    re-merge — and the immediate retry wins."""
    cl = _changelog(spark)
    base, mid, _ = _three_way_split(cl)
    store = InMemoryConditionalPointerStore()
    sink = _sink(spark, tmp_path, store)
    sink.init(fold_changelog(base))
    store.inject("spurious-loss")
    sink.apply_batch(mid)
    assert store.losses == 1
    assert sink.latest_version() == 2
    assert _rows(sink.visible()) == _rows(fold_changelog(base.unionAll(mid)))
    # one loss + one win for the v2 commit; a re-merge would have shown
    # up as extra attempts beyond init's single CAS
    assert store.attempts == 3


def test_transient_unavailability_is_retried_in_place(spark, tmp_path):
    """Definitely-not-applied failures retry the SAME CAS: two outages
    in a row still commit on the third try, with no extra version."""
    cl = _changelog(spark)
    base, mid, _ = _three_way_split(cl)
    store = InMemoryConditionalPointerStore()
    sink = _sink(spark, tmp_path, store)
    sink.init(fold_changelog(base))
    store.inject("unavailable")
    store.inject("unavailable")
    sink.apply_batch(mid)
    assert sink.latest_version() == 2
    assert _rows(sink.visible()) == _rows(fold_changelog(base.unionAll(mid)))


def test_sustained_unavailability_surfaces_typed_and_clean(spark, tmp_path):
    """Store down past the retry budget: the typed error escapes, no
    version is created, no staged litter survives, and a later retry
    of the same batch commits normally."""
    cl = _changelog(spark)
    base, mid, _ = _three_way_split(cl)
    store = InMemoryConditionalPointerStore()
    sink = _sink(spark, tmp_path, store)
    sink.init(fold_changelog(base))
    before = _rows(sink.visible())
    for _ in range(VersionedCdcSink._MAX_STORE_RETRIES + 1):
        store.inject("unavailable")
    with pytest.raises(PointerStoreUnavailableError):
        sink.apply_batch(mid)
    assert sink.latest_version() == 1
    assert _rows(sink.visible()) == before
    assert os.listdir(os.path.join(sink.path, "manifests", "roots")) == []
    sink.apply_batch(mid)  # the store recovered; same batch, clean commit
    assert sink.latest_version() == 2
    assert _rows(sink.visible()) == _rows(fold_changelog(base.unionAll(mid)))


def test_ambiguous_applied_commit_is_recognized_as_win(spark, tmp_path):
    """Response lost AFTER the server applied the swap: the resolution
    read sees our own pointer value — the commit must count as a win
    exactly once (no duplicate version, root published)."""
    cl = _changelog(spark)
    base, mid, _ = _three_way_split(cl)
    store = InMemoryConditionalPointerStore()
    sink = _sink(spark, tmp_path, store)
    sink.init(fold_changelog(base))
    store.inject("unknown-applied")
    sink.apply_batch(mid)
    assert sink.latest_version() == 2
    assert os.path.exists(sink._root_path(2))  # published, not just staged
    assert _rows(sink.visible()) == _rows(fold_changelog(base.unionAll(mid)))


def test_ambiguous_lost_commit_resolves_to_retry_and_wins(spark, tmp_path):
    """Response lost and the server did NOT apply: the resolution read
    sees the expected value unchanged — provably not applied — and the
    protocol retries the same CAS, which then wins. One version, no
    double-merge."""
    cl = _changelog(spark)
    base, mid, _ = _three_way_split(cl)
    store = InMemoryConditionalPointerStore()
    sink = _sink(spark, tmp_path, store)
    sink.init(fold_changelog(base))
    store.inject("unknown-lost")
    sink.apply_batch(mid)
    assert sink.latest_version() == 2
    assert _rows(sink.visible()) == _rows(fold_changelog(base.unionAll(mid)))


def test_ambiguous_winner_buried_by_rival_still_wins(spark, tmp_path):
    """THE race: A's put applies but the response is lost; before A can
    resolve, rival B reads A's pointer (roll-forward-publishing A's
    staged root), merges on top, and commits version 3. A's resolution
    read then sees NEITHER its own value NOR the expected one — it must
    recognize its buried v2 via the published root's content identity
    and report success, not re-commit the batch as v4."""
    cl = _changelog(spark)
    base, mid, tail = _three_way_split(cl)
    store = InMemoryConditionalPointerStore()
    a = _sink(spark, tmp_path, store)
    b = VersionedCdcSink(spark, a.path, n_buckets=8, pointer_store=store)
    a.init(fold_changelog(base))

    store.inject("unknown-applied", before=lambda: b.apply_batch(tail))
    a.apply_batch(mid)

    assert a.latest_version() == 3  # A's buried v2 + B's v3; NOT v4
    # A's v2 exists (published by B's roll-forward + A's own replace)
    # and time-travels to exactly base+mid
    assert _rows(a.visible(2)) == _rows(fold_changelog(base.unionAll(mid)))
    assert _rows(a.visible()) == _rows(fold_changelog(cl))


def test_ambiguous_loss_with_rival_winner_remerges(spark, tmp_path):
    """Dual of the buried-winner case: A's put did NOT apply, and rival
    B commits v2 while A's response is lost. A's resolution read sees
    B's value, finds v2's published root is NOT the one A staged, takes
    the loss, and the outer loop re-merges A's batch on top of B —
    final state is the serial application of both."""
    cl = _changelog(spark)
    base, mid, tail = _three_way_split(cl)
    store = InMemoryConditionalPointerStore()
    a = _sink(spark, tmp_path, store)
    b = VersionedCdcSink(spark, a.path, n_buckets=8, pointer_store=store)
    a.init(fold_changelog(base))

    store.inject("unknown-lost", before=lambda: b.apply_batch(mid))
    a.apply_batch(tail)

    assert a.latest_version() == 3  # init, B's v2, A's re-merged v3
    assert _rows(a.visible()) == _rows(fold_changelog(cl))


def test_roll_forward_publishes_crash_window_root(spark, tmp_path):
    """A winner that crashed between CAS and publication leaves only
    the staged root; the next reader resolving that version must both
    serve it AND re-publish v<N>.json (roll-forward), healing the
    crash window for everyone after."""
    cl = _changelog(spark)
    base, mid, _ = _three_way_split(cl)
    store = InMemoryConditionalPointerStore()
    sink = _sink(spark, tmp_path, store)
    sink.init(fold_changelog(base))
    sink.apply_batch(mid)
    # simulate the crash window: un-publish v2 back to its staged form
    token = store.read().split(":", 1)[1]
    os.rename(sink._root_path(2), sink._staged_root_path(token))
    assert _rows(sink.visible(2)) == _rows(fold_changelog(base.unionAll(mid)))
    assert os.path.exists(sink._root_path(2))  # healed
