"""VersionedCdcSink optimistic concurrency + retention robustness.

The CAS commit protocol's contract: under concurrent writers the final
table state equals SOME serial application of the batches (exactly the
guarantee the reference derives from single-consumer FIFO delivery,
`cdk-stack.ts:47`), disjoint-bucket losers REBASE without rewriting
data, overlapping-bucket losers RE-MERGE, and a writer that can never
win gives up with a typed error leaving no visible state change.
"""

import os

import pytest
from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.operators.cdc import changelog, fold_changelog
from dynamodb_pitr_restore_cdc_spark.streaming.versioned_sink import (
    CommitConflictError,
    LocalPointerStore,
    VersionedCdcSink,
)

from .conftest import SF_SMOKE


def _rows(df):
    return sorted(map(tuple, df.collect()))


class RecordingPointerStore(LocalPointerStore):
    """LocalPointerStore that counts CAS attempts and outcomes."""

    def __init__(self, path):
        super().__init__(path)
        self.attempts = 0
        self.losses = 0

    def put_if(self, expected, new):
        self.attempts += 1
        ok = super().put_if(expected, new)
        if not ok:
            self.losses += 1
        return ok


class AlwaysLosesPointerStore(LocalPointerStore):
    def put_if(self, expected, new):
        return False


def _changelog(spark):
    return changelog(spark, SF_SMOKE).select("seq_no", "op", "key", "payload_value")


def _two_writers(spark, tmp_path, n_buckets=8):
    """Two sink handles over ONE table path, as two processes would
    hold them; A gets the instrumented pointer store."""
    path = str(tmp_path / "sink")
    store_a = RecordingPointerStore(os.path.join(path, "LATEST"))
    a = VersionedCdcSink(spark, path, n_buckets=n_buckets, pointer_store=store_a)
    b = VersionedCdcSink(spark, path, n_buckets=n_buckets)
    return a, b, store_a


def test_local_pointer_store_cas():
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        s = LocalPointerStore(os.path.join(d, "LATEST"))
        assert s.read() is None
        assert s.put_if(None, "1:aaa")
        assert not s.put_if(None, "1:bbb")  # already created
        assert s.read() == "1:aaa"
        assert not s.put_if("1:zzz", "2:bbb")  # stale expected
        assert s.put_if("1:aaa", "2:bbb")
        assert s.read() == "2:bbb"


def test_empty_or_garbage_latest_reads_as_version_zero(spark, tmp_path):
    # an interrupted first commit can leave a zero-byte LATEST; that
    # must read as "uninitialized", not ValueError-on-every-call
    sink = VersionedCdcSink(spark, str(tmp_path / "sink"))
    latest = os.path.join(str(tmp_path / "sink"), "LATEST")
    open(latest, "w").close()
    assert sink.latest_version() == 0
    with open(latest, "w") as fh:
        fh.write("not-a-version")
    assert sink.latest_version() == 0


def test_concurrent_disjoint_writers_rebase(spark, tmp_path):
    """B commits between A's merge and A's CAS, touching DISJOINT
    buckets. A must lose once, rebase (keep its already-written data
    token), and win the retry; the final state equals the serial
    application of both batches."""
    cl = _changelog(spark)
    max_seq = cl.agg(F.max("seq_no")).first()[0]
    c1 = max_seq // 2
    a, b, store_a = _two_writers(spark, tmp_path)

    a.init(fold_changelog(cl.where(F.col("seq_no") <= c1)))
    tail = cl.where(F.col("seq_no") > c1)
    bucket = F.pmod(F.hash("key"), F.lit(a.n_buckets))
    batch_a = tail.where(bucket < 4)
    batch_b = tail.where(bucket >= 4)

    fired = []

    def interleave():
        if not fired:  # one-shot: only ambush the first CAS
            fired.append(True)
            a._pre_commit_hook = None
            b.apply_batch(batch_b)

    a._pre_commit_hook = interleave
    a.apply_batch(batch_a)

    assert store_a.losses == 1  # A lost exactly once, then rebased in
    assert a.latest_version() == 3  # init + B + A
    assert _rows(a.visible()) == _rows(fold_changelog(cl))
    # rebase proof: A's touched buckets all carry ONE data token, and B's
    # entries survived untouched in the final manifest
    m2, m3 = a._manifest(2), a._manifest(3)
    a_buckets = {r.b for r in batch_a.select(bucket.alias("b")).distinct().collect()}
    assert len({m3[x] for x in a_buckets if x in m3}) <= 1
    b_buckets = {r.b for r in batch_b.select(bucket.alias("b")).distinct().collect()}
    for x in b_buckets:
        if x in m2:
            assert m3[x] == m2[x]


def test_concurrent_overlapping_writers_remerge(spark, tmp_path):
    """B's interleaved commit rewrites buckets A also touches: A's
    staged merge is stale and must be REDONE against B's state. The
    per-key max-seq merge makes any serial order equal the full fold."""
    cl = _changelog(spark)
    max_seq = cl.agg(F.max("seq_no")).first()[0]
    c1, c2 = max_seq // 3, (2 * max_seq) // 3
    a, b, store_a = _two_writers(spark, tmp_path)

    a.init(fold_changelog(cl.where(F.col("seq_no") <= c1)))
    batch_a = cl.where(F.col("seq_no") > c2)
    batch_b = cl.where((F.col("seq_no") > c1) & (F.col("seq_no") <= c2))

    fired = []

    def interleave():
        if not fired:
            fired.append(True)
            a._pre_commit_hook = None
            b.apply_batch(batch_b)

    a._pre_commit_hook = interleave
    a.apply_batch(batch_a)

    assert store_a.losses == 1
    assert a.latest_version() == 3
    assert _rows(a.visible()) == _rows(fold_changelog(cl))
    # and no leftover data-token dirs beyond the three live commits +
    # A's discarded first attempt (eagerly removed on re-merge)
    live = {t for v in (1, 2, 3) for t in a._manifest(v).values()}
    on_disk = set(os.listdir(os.path.join(a.path, "data")))
    assert on_disk == live


def test_cas_exhaustion_raises_and_leaves_no_state(spark, tmp_path):
    cl = _changelog(spark)
    max_seq = cl.agg(F.max("seq_no")).first()[0]
    path = str(tmp_path / "sink")
    sink = VersionedCdcSink(spark, path, n_buckets=8, max_commit_retries=2)
    sink.init(fold_changelog(cl.where(F.col("seq_no") <= max_seq // 2)))
    before = _rows(sink.visible())
    sink.pointer = AlwaysLosesPointerStore(os.path.join(path, "LATEST"))
    with pytest.raises(CommitConflictError):
        sink.apply_batch(cl.where(F.col("seq_no") > max_seq // 2))
    sink.pointer = LocalPointerStore(os.path.join(path, "LATEST"))
    assert sink.latest_version() == 1
    assert _rows(sink.visible()) == before


def test_expire_widening_after_deeper_expire_is_graceful(spark, tmp_path):
    # expire(keep_last=1) then expire(keep_last=3): versions already
    # swept must be skipped, not re-resolved into FileNotFoundError
    cl = _changelog(spark)
    max_seq = cl.agg(F.max("seq_no")).first()[0]
    c1, c2 = max_seq // 3, (2 * max_seq) // 3
    sink = VersionedCdcSink(spark, str(tmp_path / "sink"), n_buckets=8)
    sink.init(fold_changelog(cl.where(F.col("seq_no") <= c1)))
    sink.apply_batch(cl.where((F.col("seq_no") > c1) & (F.col("seq_no") <= c2)))
    sink.apply_batch(cl.where(F.col("seq_no") > c2))
    assert sink.expire_versions(keep_last=1) == [1, 2]
    assert sink.expire_versions(keep_last=3) == []  # no raise, no-op
    assert _rows(sink.visible()) == _rows(fold_changelog(cl))


def test_pinned_version_survives_expire(spark, tmp_path):
    """The reader-vs-expire race, fenced: a reader pins the version it
    resolved; expiry treats pinned versions as retained, so the
    in-flight read completes; once unpinned the next expire sweeps."""
    cl = _changelog(spark)
    max_seq = cl.agg(F.max("seq_no")).first()[0]
    c1, c2 = max_seq // 3, (2 * max_seq) // 3
    sink = VersionedCdcSink(spark, str(tmp_path / "sink"), n_buckets=8)
    sink.init(fold_changelog(cl.where(F.col("seq_no") <= c1)))
    sink.apply_batch(cl.where((F.col("seq_no") > c1) & (F.col("seq_no") <= c2)))
    sink.apply_batch(cl.where(F.col("seq_no") > c2))

    want_v1 = _rows(fold_changelog(cl.where(F.col("seq_no") <= c1)))
    with sink.pinned(version=1) as v:
        df = sink.visible(v)  # resolved while pinned
        assert sink.expire_versions(keep_last=1) == [2]  # v1 pinned, v2 swept
        assert _rows(df) == want_v1  # the in-flight read survives
    assert sink.expire_versions(keep_last=1) == [1]
    assert sink.latest_version() == 3
    assert _rows(sink.visible()) == _rows(fold_changelog(cl))


def test_orphan_sweep_removes_cas_loser_debris(spark, tmp_path):
    # a crashed attempt = data token + staged root with no manifest
    # reference; sweep_orphans removes it, never touching live tokens
    cl = _changelog(spark)
    max_seq = cl.agg(F.max("seq_no")).first()[0]
    sink = VersionedCdcSink(spark, str(tmp_path / "sink"), n_buckets=8)
    sink.init(fold_changelog(cl.where(F.col("seq_no") <= max_seq // 2)))
    sink.apply_batch(cl.where(F.col("seq_no") > max_seq // 2))
    # plant debris
    os.makedirs(os.path.join(sink.path, "data", "orphantok", "bucket=0"))
    with open(sink._shard_path("orphantok"), "w") as fh:
        fh.write('{"buckets": {}}')
    before = _rows(sink.visible())
    sink.expire_versions(keep_last=10, sweep_orphans=True)
    assert not os.path.exists(os.path.join(sink.path, "data", "orphantok"))
    assert not os.path.exists(sink._shard_path("orphantok"))
    assert _rows(sink.visible()) == before


def test_manifest_sharding_commits_touch_few_shards(spark, tmp_path):
    """With shard_size << n_buckets, a narrow batch's commit writes new
    shard files ONLY for the shards containing its touched buckets; all
    other shard tokens are inherited verbatim in the new root."""
    cl = _changelog(spark)
    max_seq = cl.agg(F.max("seq_no")).first()[0]
    sink = VersionedCdcSink(
        spark, str(tmp_path / "sink"), n_buckets=64, shard_size=8
    )
    sink.init(fold_changelog(cl.where(F.col("seq_no") <= (98 * max_seq) // 100)))
    narrow = cl.where(F.col("seq_no") > (98 * max_seq) // 100)
    sink.apply_batch(narrow)

    r1, r2 = sink._root(1), sink._root(2)
    touched_sids = {
        r.b // sink.shard_size
        for r in narrow.select(
            F.pmod(F.hash("key"), F.lit(sink.n_buckets)).alias("b")
        ).distinct().collect()
    }
    changed = {s for s in set(r1) | set(r2) if r1.get(s) != r2.get(s)}
    assert changed == touched_sids
    assert changed < set(r2)  # real inheritance happened
    assert _rows(sink.visible()) == _rows(fold_changelog(cl))
