"""Shared-sink immutability: the r12 q_cdc_history crash, pinned.

Round-12's one red driver row: q_cdc_time_travel ran
expire_versions(keep_last=2) on the SESSION-SHARED 3-commit sink
artifact, deleting v1's manifest; q_cdc_history, 6 window slots later
in the SAME driver session, read visible(version=1) →
FileNotFoundError. The local parity suite runs alphabetically
(history < time_travel), so twelve rounds of green local runs never
executed the mutating query first — this test does, in driver order,
inside one session, and additionally asserts the shared artifact's v1
manifest physically survives the time-travel query.
"""

import os

from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.registry import release_persisted
from dynamodb_pitr_restore_cdc_spark.streaming import versioned_sink as VS


def test_time_travel_before_history_one_session(spark, sf_dir):
    """Driver-order regression: the mutator runs FIRST, the v1 reader
    second — exactly the r12 window order that crashed."""
    tt = VS.q_cdc_time_travel(spark, sf_dir)
    n_tt = tt.count()
    assert n_tt > 0

    # the shared artifact must still hold ALL THREE manifests: the
    # expire happened on a private clone, never on the shared replay
    sink, _, _ = VS.shared_sink(spark, sf_dir)
    for v in (1, 2, 3):
        assert os.path.exists(sink._root_path(v)), (
            f"shared sink lost v{v}.json after q_cdc_time_travel — "
            "a consumer mutated the session-shared artifact"
        )

    # ...and the private clone really did expire v1 (the COW proof the
    # time-travel query exists for is still being proven)
    clone = VS.expired_shared_sink(spark, sf_dir)
    assert not os.path.exists(clone._root_path(1))
    assert os.path.exists(clone._root_path(2))

    # q_cdc_history now runs clean in the same session and reports all
    # three versions with consistent accounting
    hist = VS.q_cdc_history(spark, sf_dir).orderBy("version").collect()
    release_persisted()
    assert [r.version for r in hist] == [1, 2, 3]
    assert all(r.n_rows > 0 for r in hist)
    # v1's history row is its own fold: every visible row an INSERT
    assert hist[0].n_inserts == hist[0].n_rows
    assert hist[0].n_updates == 0 and hist[0].n_deletes == 0


def test_expired_clone_shares_data_bytes(spark, sf_dir):
    """The clone is hardlinks, not a copy: surviving data files in the
    clone are the SAME inodes as the shared sink's (metadata-only
    branch — the property that keeps the private-expire fix O(file
    count) and therefore viable at 100 TB)."""
    sink, _, _ = VS.shared_sink(spark, sf_dir)
    clone = VS.expired_shared_sink(spark, sf_dir)

    def inodes(root):
        out = {}
        droot = os.path.join(root, "data")
        for dirpath, _, files in os.walk(droot):
            for f in files:
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, droot)] = os.stat(p).st_ino
        return out

    src, dst = inodes(sink.path), inodes(clone.path)
    shared = set(src) & set(dst)
    assert shared, "clone holds no data files in common with the source"
    assert all(src[k] == dst[k] for k in shared)
    # the expire dropped v1-only files from the clone but not the source
    assert set(src) - set(dst), "expire removed nothing from the clone"

    # clone reads stay correct: v2 on the clone == v2 on the source
    a = sorted(map(tuple, clone.visible(version=2).collect()))
    b = sorted(map(tuple, sink.visible(version=2).collect()))
    assert a == b and a


def test_clone_expire_does_not_disturb_source_reads(spark, sf_dir):
    """End-to-end value check across the boundary: after the clone's
    expire, the shared sink still answers v1/v2/v3 reads with the
    changelog-prefix folds (the contract every other consumer relies
    on)."""
    from dynamodb_pitr_restore_cdc_spark.operators.cdc import (
        changelog,
        fold_changelog,
    )

    VS.q_cdc_time_travel(spark, sf_dir).count()  # force the clone path
    sink, c1, _ = VS.shared_sink(spark, sf_dir)
    cl = changelog(spark, sf_dir).select("seq_no", "op", "key", "payload_value")
    want = sorted(
        map(
            tuple,
            fold_changelog(cl.where(F.col("seq_no") <= c1))
            .select("key", "last_seq", "payload_value")
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            sink.visible(version=1)
            .select("key", "last_seq", "payload_value")
            .collect(),
        )
    )
    release_persisted()
    assert got == want and got


def test_every_consumer_leaves_shared_artifact_untouched(spark, sf_dir):
    """The structural form of the round-13 audit: execute EVERY
    registered consumer of the shared sink, in registry (driver)
    order, and assert the artifact's file tree is byte-stable across
    each one — not just the two queries the r12 crash involved. A new
    consumer that mutates in place fails here with its name."""
    from dynamodb_pitr_restore_cdc_spark.registry import all_queries

    consumers = [
        "q_cdc_time_travel",
        "q_cdc_changefeed",
        "q_cdc_incremental_agg",
        "q_cdc_point_lookup",
        "q_cdc_alerting",
        "q_cdc_restore_drill",
        "q_cdc_branch_merge",
        "q_cdc_history",
    ]
    specs = all_queries()
    ordered = [n for n in specs if n in consumers]
    assert set(ordered) == set(consumers)

    sink, _, _ = VS.shared_sink(spark, sf_dir)

    def tree(root):
        out = {}
        for dirpath, _, files in os.walk(root):
            for f in files:
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
        return out

    before = tree(sink.path)
    assert before, "shared sink built empty"
    for name in ordered:
        specs[name].builder(spark, sf_dir).collect()
        release_persisted()
        after = tree(sink.path)
        assert after == before, (
            f"{name} mutated the session-shared sink artifact: "
            f"added={sorted(set(after) - set(before))[:5]} "
            f"removed={sorted(set(before) - set(after))[:5]} "
            f"changed={[k for k in after.keys() & before.keys() if after[k] != before[k]][:5]}"
        )
