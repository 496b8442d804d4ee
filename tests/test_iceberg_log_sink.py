"""Iceberg-spec mechanics of IcebergLogSink (what the seam suite can't
see: metadata-tree layout, put-if-absent commits via version files,
manifest reuse, bounds-based pruning, snapshot expiry + GC, the
version-hint recovery paths)."""

import json
import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.streaming.iceberg_log_sink import (
    META_DIR,
    IcebergLogSink,
)


def _batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "seq_no", "op", "payload_value"]),
        schema="key long, seq_no long, op string, payload_value double",
    )


def _snapshot(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "last_seq", "payload_value"]),
        schema="key long, last_seq long, payload_value double",
    )


@pytest.fixture()
def sink(spark, tmp_path):
    s = IcebergLogSink(spark, str(tmp_path / "tbl"), n_buckets=4)
    # keys 0..7 cover several of the 4 buckets
    s.init(_snapshot(spark, [(k, 0, float(k)) for k in range(8)]))
    return s


def _meta(sink):
    return sink._current_meta()


def _cursnap(sink):
    m = _meta(sink)
    return next(
        s for s in m["snapshots"] if s["snapshot-id"] == m["current-snapshot-id"]
    )


def test_metadata_tree_layout(sink):
    m = _meta(sink)
    assert m["format-version"] == 2
    assert m["partition-spec"][0]["transform"] == "bucket[4]"
    snap = _cursnap(sink)
    assert snap["sequence-number"] == 1
    assert snap["summary"]["operation"] == "append"
    for ml in sink._manifest_list(snap):
        p = ml["partitions"]["bucket"]
        assert 0 <= p["lower"] <= p["upper"] <= 3
        for e in sink._read_ndjson(ml["manifest_path"]):
            df = e["data_file"]
            assert e["status"] == "ADDED"
            assert df["record_count"] >= 1
            assert "key" in df["lower_bounds"] and "last_seq" in df["upper_bounds"]
            # directory-partitioned writes put exactly one bucket per file
            assert f"bucket={df['partition']['bucket']}" in df["file_path"]


def test_merge_prunes_and_reuses_manifests(sink, spark):
    files_before = {
        e["data_file"]["file_path"]: e["data_file"]["partition"]["bucket"]
        for e in sink._entries(_cursnap(sink))
    }
    # one-key batch: its bucket is the ONLY one the MERGE may touch
    sink.apply_batch(_batch(spark, [(3, 10, "MODIFY", 3.5)]))
    b3 = F.pmod(F.hash(F.lit(3).cast("long")), F.lit(4))
    touched = spark.range(1).select(b3.alias("b")).first().b
    after = {
        e["data_file"]["file_path"]: e["data_file"]["partition"]["bucket"]
        for e in sink._entries(_cursnap(sink))
    }
    removed = set(files_before) - set(after)
    assert removed and all(files_before[p] == touched for p in removed)
    added = set(after) - set(files_before)
    assert added and all(after[p] == touched for p in added)
    # a second merge on a DIFFERENT bucket must reuse the first merge's
    # manifest by identical path (init's single manifest necessarily
    # gets rewritten both times — it holds every bucket)
    ml_mid = {ml["manifest_path"] for ml in sink._manifest_list(_cursnap(sink))}
    sink.apply_batch(_batch(spark, [(0, 11, "MODIFY", 0.5)]))
    b0 = F.pmod(F.hash(F.lit(0).cast("long")), F.lit(4))
    touched0 = spark.range(1).select(b0.alias("b")).first().b
    assert touched0 != touched  # keys 0 and 3 land in different buckets
    ml_after = {ml["manifest_path"] for ml in sink._manifest_list(_cursnap(sink))}
    assert ml_mid & ml_after, "commit must not rewrite untouched manifests"


def test_data_files_are_immutable(sink, spark):
    sigs = {
        e["data_file"]["file_path"]: os.path.getmtime(
            os.path.join(sink.path, e["data_file"]["file_path"])
        )
        for e in sink._entries(_cursnap(sink))
    }
    sink.apply_batch(_batch(spark, [(1, 10, "MODIFY", 9.9)]))
    for p, mtime in sigs.items():
        full = os.path.join(sink.path, p)
        assert os.path.exists(full)
        assert os.path.getmtime(full) == mtime  # never rewritten in place


def test_commit_is_put_if_absent(sink):
    with pytest.raises(FileExistsError):
        sink._commit_meta(1, {"snapshots": []})


def test_stale_and_corrupt_version_hint_recover(sink, spark):
    sink.apply_batch(_batch(spark, [(1, 10, "MODIFY", 1.5)]))
    hint = os.path.join(sink.path, META_DIR, "version-hint.text")
    with open(hint, "w") as fh:
        fh.write("1")  # stale: crash between link and hint rename
    assert sink._latest_meta_num() == 2  # forward probe recovers
    with open(hint, "w") as fh:
        fh.write('{"ver')  # torn mid-write
    assert sink._latest_meta_num() == 2  # listing fallback recovers
    rows = {r.key: r.payload_value for r in sink.visible().collect()}
    assert rows[1] == 1.5


def test_expiry_gc_and_expired_reads_fail_loudly(sink, spark):
    sink.apply_batch(_batch(spark, [(1, 10, "MODIFY", 1.5)]))
    sink.apply_batch(_batch(spark, [(2, 20, "REMOVE", None)]))
    before = sorted((r.key, r.payload_value) for r in sink.visible().collect())
    meta_before = _meta(sink)
    dead_lists = [
        s["manifest-list"]
        for s in meta_before["snapshots"]
        if s["sequence-number"] < 3
    ]
    assert sink.expire_versions(keep_last=1, orphan_grace_s=0.0) == [1, 2]
    after = sorted((r.key, r.payload_value) for r in sink.visible().collect())
    assert after == before
    assert len(_meta(sink)["snapshots"]) == 1
    for rel in dead_lists:  # expired snapshots' manifest lists are GC'd
        assert not os.path.exists(os.path.join(sink.path, rel))
    with pytest.raises(ValueError, match="expired"):
        sink.snapshot(1)
    with pytest.raises(ValueError, match="out of range"):
        sink.snapshot(9)


def test_gc_deletes_only_unreferenced_data_files(sink, spark):
    v1_files = {e["data_file"]["file_path"] for e in sink._entries(_cursnap(sink))}
    sink.apply_batch(_batch(spark, [(3, 10, "MODIFY", 3.5)]))
    v2_files = {e["data_file"]["file_path"] for e in sink._entries(_cursnap(sink))}
    replaced = v1_files - v2_files
    survivors = v1_files & v2_files
    assert replaced and survivors  # untouched buckets' files carry over
    sink.expire_versions(keep_last=1, sweep_orphans=True, orphan_grace_s=0.0)
    for p in replaced:
        assert not os.path.exists(os.path.join(sink.path, p))
    for p in survivors:
        assert os.path.exists(os.path.join(sink.path, p))


def test_second_expiry_cycle_expires_loudly(sink, spark):
    sink.apply_batch(_batch(spark, [(1, 10, "MODIFY", 1.1)]))
    sink.apply_batch(_batch(spark, [(1, 11, "MODIFY", 1.2)]))
    sink.expire_versions(keep_last=1)  # drops 1-2
    sink.apply_batch(_batch(spark, [(1, 12, "MODIFY", 1.3)]))
    sink.apply_batch(_batch(spark, [(1, 13, "MODIFY", 1.4)]))
    assert sink.expire_versions(keep_last=1) == [3, 4]
    for v in (1, 2, 3, 4):
        with pytest.raises(ValueError, match="expired"):
            sink.snapshot(v)
    assert sorted(
        (r.key, r.payload_value) for r in sink.visible().collect()
    )[1] == (1, 1.4)


def test_rewrite_uses_bounds_and_converges(sink, spark):
    sink.apply_batch(_batch(spark, [(5, 10, "REMOVE", None)]))
    sink.compact(reorder_horizon_seq=11)
    assert sink.snapshot().where(F.col("op") == "REMOVE").count() == 0
    v_after = sink.latest_version()
    # second pass: bounds prove every file clean -> no new snapshot
    sink.compact(reorder_horizon_seq=11)
    assert sink.latest_version() == v_after
    # fresh (unsettled) tombstone: bounds admit the file forever, the
    # exact emptiness check must suppress the no-op snapshot
    sink.apply_batch(_batch(spark, [(0, 50, "REMOVE", None)]))
    v = sink.latest_version()
    sink.compact(reorder_horizon_seq=10)
    assert sink.latest_version() == v


def test_crashed_write_attempt_does_not_wedge(sink, spark):
    # simulate a crash between data write and metadata publication:
    # the attempt-scoped data dir must not collide with the retry
    seq = sink.latest_version() + 1
    orphan = sink._write_data(
        _batch(spark, [(1, 10, "MODIFY", 5.0)])
        .withColumnRenamed("seq_no", "last_seq")
        .withColumn("bucket", sink._bucket(F.col("key"))),
        seq,
    )  # files exist, commit never happens
    assert orphan
    orphans = [os.path.join(sink.path, e["data_file"]["file_path"]) for e in orphan]
    sink.apply_batch(_batch(spark, [(1, 10, "MODIFY", 5.0)]))  # retry works
    assert sink.latest_version() == seq
    rows = {r.key: r.payload_value for r in sink.visible().collect()}
    assert rows[1] == 5.0
    sink.apply_batch(_batch(spark, [(2, 11, "MODIFY", 6.0)]))
    sink.expire_versions(keep_last=1, sweep_orphans=True, orphan_grace_s=0.0)
    assert not any(os.path.exists(p) for p in orphans)  # debris reclaimed
    for e in sink._entries(_cursnap(sink)):  # every live file survives
        assert os.path.exists(os.path.join(sink.path, e["data_file"]["file_path"]))


def test_lost_race_remerges_against_winner_state(sink, spark):
    # two writers target the same next metadata number; the loser must
    # re-read the winner's state before retrying — a stale retry would
    # drop the winner's files from its snapshot and resurrect rows
    winner = IcebergLogSink(spark, sink.path, n_buckets=4)
    v0 = sink.latest_version()
    orig, fired = sink._commit_meta, {}

    def racing_commit(n, meta):
        if not fired:
            fired["x"] = True  # interleave: winner publishes first
            winner.apply_batch(_batch(spark, [(1, 20, "MODIFY", 7.0)]))
        orig(n, meta)

    sink._commit_meta = racing_commit
    sink.apply_batch(
        _batch(spark, [(1, 21, "MODIFY", 8.0), (2, 21, "REMOVE", None)])
    )
    assert sink.latest_version() == v0 + 2  # winner then retried loser
    rows = sink.visible().collect()  # ROW list, not a dict — duplicates count
    assert [(r.key, r.payload_value) for r in rows if r.key == 1] == [(1, 8.0)]
    assert not [r for r in rows if r.key == 2]  # seq-21 REMOVE survived
    keys = [r.key for r in rows]
    assert len(keys) == len(set(keys))  # no resurrected duplicate anywhere


def test_rewrite_race_inside_state_read_still_retries(sink, spark):
    # the narrow window: a MERGE lands AFTER compact reads state but
    # BEFORE it commits. Because compact pins its metadata number
    # BEFORE the state read, the interloper claims that number and
    # compact must hit EEXIST and recompute candidates
    sink.apply_batch(_batch(spark, [(3, 30, "REMOVE", None)]))
    other = IcebergLogSink(spark, sink.path, n_buckets=4)
    orig_load, fired = sink._load_meta, {}

    def racing_load(n):
        out = orig_load(n)
        if not fired:
            fired["x"] = True
            other.apply_batch(_batch(spark, [(3, 31, "MODIFY", 3.5)]))
        return out

    sink._load_meta = racing_load
    sink.compact(reorder_horizon_seq=31)
    rows = sink.visible().collect()
    assert [(r.key, r.payload_value) for r in rows if r.key == 3] == [(3, 3.5)]
    keys = [r.key for r in rows]
    assert len(keys) == len(set(keys))
    for e in sink._entries(_cursnap(sink)):  # every live entry resolvable
        assert os.path.exists(os.path.join(sink.path, e["data_file"]["file_path"]))


def test_changefeed_between_identical_versions_is_empty(sink, spark):
    # round-7 review: changed-bucket set {} must yield an empty feed,
    # not a min()/max()-of-empty crash in the manifest prune
    assert sink.changes_between(1, 1).count() == 0
    sink.apply_batch(_batch(spark, [(3, 10, "MODIFY", 3.5)]))
    assert sink.changes_between(2, 2).count() == 0


def test_expiry_keeps_trailing_metadata_for_racing_writers(
    sink, spark, monkeypatch
):
    # round-7 review: a writer that pinned its base metadata number
    # just before an expiry commit must still be able to read it and
    # lose cleanly via EEXIST — so expiry keeps the trailing K files
    # (Iceberg's previous-versions-max) instead of deleting them all
    import dynamodb_pitr_restore_cdc_spark.streaming.iceberg_log_sink as mod

    monkeypatch.setattr(mod, "PREVIOUS_METADATA_KEPT", 2)
    for s in range(5):
        sink.apply_batch(_batch(spark, [(1, 10 + s, "MODIFY", float(s))]))
    sink.expire_versions(keep_last=1)  # meta 7 published
    kept = sorted(
        f for f in os.listdir(os.path.join(sink.path, META_DIR))
        if f.endswith(".metadata.json")
    )
    assert len(kept) == 2  # trailing K survive, older ones are gone
    # a stale-but-parsable hint pointing at a deleted file recovers
    with open(os.path.join(sink.path, META_DIR, "version-hint.text"), "w") as fh:
        fh.write("1")
    assert sink.latest_version() == 6  # listing fallback, not a crash
    # and a writer racing the expiry retries instead of crashing
    orig, fired = sink._load_meta, {}

    def racing_load(n):
        out = orig(n)
        if not fired:
            fired["x"] = True
            other = IcebergLogSink(spark, sink.path, n_buckets=4)
            other.expire_versions(keep_last=1)
        return out

    sink._load_meta = racing_load
    sink.apply_batch(_batch(spark, [(1, 99, "MODIFY", 9.9)]))
    rows = {r.key: r.payload_value for r in sink.visible().collect()}
    assert rows[1] == 9.9


def test_orphan_sweep_reclaims_metadata_debris(sink, spark):
    # round-7 review: manifests/manifest-lists written by an attempt
    # that never committed are debris exactly like orphan data files
    dead_manifest = sink._write_ndjson("manifest", [{"status": "ADDED",
        "data_file": {"file_path": "data/nope.parquet",
                      "partition": {"bucket": 0}, "record_count": 1,
                      "file_size_in_bytes": 1, "lower_bounds": {},
                      "upper_bounds": {}}}])
    dead_list = sink._write_ndjson("snap-000099", [])
    sink.apply_batch(_batch(spark, [(1, 10, "MODIFY", 1.5)]))
    sink.apply_batch(_batch(spark, [(2, 11, "MODIFY", 2.5)]))
    sink.expire_versions(keep_last=1, sweep_orphans=True, orphan_grace_s=0.0)
    assert not os.path.exists(os.path.join(sink.path, dead_manifest))
    assert not os.path.exists(os.path.join(sink.path, dead_list))
    for e in sink._entries(_cursnap(sink)):  # live tree intact
        assert os.path.exists(os.path.join(sink.path, e["data_file"]["file_path"]))
    rows = {r.key: r.payload_value for r in sink.visible().collect()}
    assert rows[1] == 1.5 and rows[2] == 2.5


def test_compact_with_custom_merge_key(spark, tmp_path):
    # round-8 review: compact hardcoded F.col("key") although init/
    # apply_batch accept a custom key — a table keyed on "id" crashed
    # with an unresolved-column error. The key now comes from the
    # partition-spec source field.
    s = IcebergLogSink(spark, str(tmp_path / "idtbl"), n_buckets=4)
    s.init(
        spark.createDataFrame(
            pd.DataFrame(
                [(k, 0, float(k)) for k in range(6)],
                columns=["id", "last_seq", "payload_value"],
            ),
            schema="id long, last_seq long, payload_value double",
        ),
        key="id",
    )
    s.apply_batch(
        spark.createDataFrame(
            pd.DataFrame(
                [(2, 5, "REMOVE", None), (9, 6, "INSERT", 9.0)],
                columns=["id", "seq_no", "op", "payload_value"],
            ),
            schema="id long, seq_no long, op string, payload_value double",
        ),
        key="id",
    )
    before = sorted((r.id, r.payload_value) for r in s.visible().collect())
    s.compact(reorder_horizon_seq=100)
    after = sorted((r.id, r.payload_value) for r in s.visible().collect())
    assert after == before
    assert not any(  # the settled tombstone really was reclaimed
        r.op == "REMOVE" for r in s.snapshot().collect()
    )


def test_orphan_sweep_grace_spares_inflight_attempt_files(sink, spark):
    # round-8 review: a concurrent writer's pre-CAS attempt files are
    # indistinguishable from crash debris — the default mtime grace
    # must spare them so the attempt can still publish after winning.
    seq = sink.latest_version() + 1
    attempt = sink._write_data(
        _batch(spark, [(1, 10, "MODIFY", 5.0)])
        .withColumnRenamed("seq_no", "last_seq")
        .withColumn("bucket", sink._bucket(F.col("key"))),
        seq,
    )  # files exist; the commit has not landed yet
    paths = [os.path.join(sink.path, e["data_file"]["file_path"]) for e in attempt]
    sink.apply_batch(_batch(spark, [(2, 11, "MODIFY", 6.0)]))
    sink.expire_versions(keep_last=1, sweep_orphans=True)  # default grace
    assert all(os.path.exists(p) for p in paths), "in-flight attempt swept"
    # once aged past the grace window the same files ARE debris
    sink.apply_batch(_batch(spark, [(2, 12, "MODIFY", 6.5)]))
    sink.expire_versions(keep_last=1, sweep_orphans=True, orphan_grace_s=0.0)
    assert not any(os.path.exists(p) for p in paths)


# -- merge-on-read ingest lane (round 9) ---------------------------------


def _pending(sink):
    return [e for e in sink._entries(_cursnap(sink)) if sink._is_pending(e)]


def test_append_writes_equality_delete_files_and_folds(sink, spark):
    # stale entry (seq 0 ties base, loses on... base has last_seq 0;
    # use seq below a later merge) + fresh upserts + a REMOVE
    sink.apply_batch(_batch(spark, [(1, 20, "MODIFY", 111.0)]))
    sink.append(
        _batch(
            spark,
            [
                (1, 10, "MODIFY", 999.0),   # stale: below the merged seq 20
                (2, 21, "MODIFY", 22.0),    # fresh upsert
                (3, 22, "REMOVE", None),    # fresh delete
                (9, 23, "INSERT", 9.0),     # brand-new key
            ],
        )
    )
    pend = _pending(sink)
    assert pend, "append left no pending files"
    contents = {e["data_file"]["content"] for e in pend}
    assert contents == {"data", "equality-deletes"}
    for e in pend:
        if e["data_file"]["content"] == "equality-deletes":
            assert e["data_file"]["equality_ids"] == ["key"]
    rows = {r.key: r.payload_value for r in sink.visible().collect()}
    assert rows[1] == 111.0, "stale append entry beat the merged row"
    assert rows[2] == 22.0 and rows[9] == 9.0
    assert 3 not in rows, "equality delete not applied at read time"
    # snapshot() is the STATE contract: one row per key even with
    # pending files (round-7 lesson: every read path, not just visible)
    snap = sink.snapshot().groupBy("key").count().where("count > 1")
    assert snap.count() == 0


def test_iceberg_compact_skips_buckets_with_pending_deltas(sink, spark):
    # the Delta round-8 resurrection hazard, under this protocol: key 1
    # deleted via MERGE (settled base tombstone), then a STALE append
    # entry for the same key lands as a pending file below that seq
    sink.apply_batch(_batch(spark, [(1, 5, "REMOVE", None)]))
    sink.append(_batch(spark, [(1, 3, "MODIFY", 3.0)]))
    assert 1 not in {r.key for r in sink.visible().collect()}
    seq_before = sink.latest_version()
    sink.compact(reorder_horizon_seq=100)  # every tombstone "settled"
    assert 1 not in {r.key for r in sink.visible().collect()}, (
        "deleted key resurrected by rewriteDataFiles"
    )
    assert sink.latest_version() == seq_before  # no pointless commit
    # retire the pending file, then the tombstone IS reclaimable
    sink.compact_mor(set(range(4)))
    sink.compact(reorder_horizon_seq=100)
    assert 1 not in {r.key for r in sink.visible().collect()}
    assert not any(
        r.op == "REMOVE" for r in sink.snapshot().collect()
    ), "settled tombstone not reclaimed after compact_mor"
    assert not _pending(sink)


def test_merge_retires_pending_files_in_touched_buckets(sink, spark):
    sink.append(_batch(spark, [(1, 10, "MODIFY", 1.5), (1, 11, "MODIFY", 1.6)]))
    assert _pending(sink)
    b1 = spark.range(1).select(
        F.pmod(F.hash(F.lit(1).cast("long")), F.lit(4)).alias("b")
    ).first().b
    # MERGE touching key 1's bucket folds its pending files into the
    # rewritten base — the bucket's merge-on-read debt is retired
    sink.apply_batch(_batch(spark, [(1, 12, "MODIFY", 1.7)]))
    left = {e["data_file"]["partition"]["bucket"] for e in _pending(sink)}
    assert b1 not in left
    rows = {r.key: r.payload_value for r in sink.visible().collect()}
    assert rows[1] == 1.7


def test_changes_between_folds_pending_sides(sink, spark):
    v1 = sink.latest_version()
    sink.append(_batch(spark, [(1, 10, "MODIFY", 5.0), (9, 11, "INSERT", 9.0)]))
    v2 = sink.latest_version()
    ch = {
        (r.key): (r.change_type) for r in sink.changes_between(v1, v2).collect()
    }
    assert ch[1] == "UPDATE" and ch[9] == "INSERT"
    sink.append(_batch(spark, [(9, 12, "REMOVE", None)]))
    ch2 = {
        (r.key): (r.change_type)
        for r in sink.changes_between(v2, sink.latest_version()).collect()
    }
    assert ch2 == {9: "DELETE"}


def test_append_custom_merge_key(spark, tmp_path):
    s = IcebergLogSink(spark, str(tmp_path / "idmor"), n_buckets=4)
    s.init(
        spark.createDataFrame(
            pd.DataFrame(
                [(k, 0, float(k)) for k in range(4)],
                columns=["id", "last_seq", "payload_value"],
            ),
            schema="id long, last_seq long, payload_value double",
        ),
        key="id",
    )
    s.append(
        spark.createDataFrame(
            pd.DataFrame(
                [(2, 5, "REMOVE", None), (7, 6, "INSERT", 7.0)],
                columns=["id", "seq_no", "op", "payload_value"],
            ),
            schema="id long, seq_no long, op string, payload_value double",
        ),
        key="id",
    )
    rows = {r.id: r.payload_value for r in s.visible().collect()}
    assert 2 not in rows and rows[7] == 7.0
    s.compact_mor(set(range(4)), key="id")
    s.compact(reorder_horizon_seq=100)
    rows2 = {r.id: r.payload_value for r in s.visible().collect()}
    assert rows2 == rows


def test_optimize_plan_prices_and_compact_mor_clears(sink, spark):
    # the policy twin: decisions come from manifest entries alone
    # (equality-delete record_count = remove count), executing the
    # COMPACT rows retires the debt, and visible() never changes
    for seq in (10, 11, 12):
        sink.append(
            _batch(
                spark,
                [(1, seq, "MODIFY", float(seq)), (2, seq, "REMOVE", None)],
            )
        )
    plan = {r.bucket: r for r in sink.optimize_plan(
        small_file_rows=100, min_small_files=3, tombstone_pct=15
    ).collect() if r.bucket >= 0}
    to_compact = {b for b, r in plan.items() if r.decision == "COMPACT"}
    assert to_compact, "three small pending files must trip the fan-in rule"
    # the remove count comes from equality-delete record_counts: the 3
    # REMOVE rows (and 6 total pending rows) must all be priced in
    assert sum(r.delta_removes for r in plan.values()) == 3
    assert sum(r.delta_records for r in plan.values()) == 6
    before = sorted((r.key, r.payload_value) for r in sink.visible().collect())
    sink.compact_mor(to_compact)
    after = sorted((r.key, r.payload_value) for r in sink.visible().collect())
    assert after == before
    replan = {r.bucket: r for r in sink.optimize_plan(
        small_file_rows=100, min_small_files=3, tombstone_pct=15
    ).collect() if r.bucket >= 0}
    for b in to_compact:
        assert replan[b].delta_files == 0 and replan[b].decision == "SKIP"


def test_optimize_plan_prices_manifest_repack(sink, spark):
    # round-10 verdict item 4 + round-14 LSM aging: fragmentation past
    # threshold must surface as a TABLE-scoped REPACK row, but ONLY the
    # COLD manifests (≥ REPACK_AGE_FLOOR_COMMITS commits since last
    # rewrite, or young-but-oversized) are priced and consolidated —
    # the hot fringe (the last 2 commits' small manifests) is reused by
    # path so the workload's hot files stay cheap to rewrite
    for seq in range(10, 18):  # 8 one-key appends: seqs 2..9
        sink.append(_batch(spark, [(1, seq, "MODIFY", float(seq))]))

    def plan_rows():
        return sink.optimize_plan(
            small_file_rows=100, min_small_files=3, tombstone_pct=15
        ).collect()

    repack = [r for r in plan_rows() if r.decision == "REPACK"]
    assert len(repack) == 1 and repack[0].bucket == -1
    # pricing sees the COLD subset: init (3 entries over 3 of the 4
    # buckets) + the first 6 appends — the seq-8/9 append manifests are
    # hot (age < 2, 1 entry ≤ target) and exempt; ideal = ceil(9/16)=1
    assert repack[0].base_files == 7
    assert repack[0].base_records == 9
    assert repack[0].delta_files == 1
    assert repack[0].delta_records == 16  # sqrt-packing floor
    before = sorted((r.key, r.payload_value) for r in sink.visible().collect())
    hot_paths = {
        m["manifest_path"]
        for m in sink._manifest_list(_cursnap(sink))
        if _cursnap(sink)["sequence-number"]
        - m.get("added_sequence_number", 0)
        < 2
    }
    assert len(hot_paths) == 2
    n_after = sink.rewrite_manifests()
    # 1 pack of the 9 cold entries + the 2 hot manifests reused by path
    assert n_after == 3
    after_list = sink._manifest_list(_cursnap(sink))
    assert hot_paths < {m["manifest_path"] for m in after_list}
    assert not [r for r in plan_rows() if r.decision == "REPACK"]
    # metadata-only: state unchanged, per-bucket decisions unchanged
    after = sorted((r.key, r.payload_value) for r in sink.visible().collect())
    assert after == before


def test_repack_pricing_is_cost_model_not_any_fragmentation():
    # pure summary arithmetic, no Spark: a repack rewrites EVERY live
    # entry, so the trigger prices the expected per-commit rewrite
    # width — it must IGNORE cheap fragmentation (wide-span but TINY
    # trickle-append manifests: the over-firing the first debt model
    # showed, 13 repacks in 12 commits at 10^4 buckets) and fire on
    # expensive shapes (bulk-load monolith; accumulated trickle debt;
    # a shattered manifest list)
    from dynamodb_pitr_restore_cdc_spark.streaming.iceberg_log_sink import (
        _repack_priced,
    )

    def m(lo, hi, n):
        return {
            "partitions": {"bucket": {"lower": lo, "upper": hi}},
            "added_files_count": n,
            "existing_files_count": 0,
        }

    # 100 packed disjoint manifests of 100 entries over 10^4 buckets:
    # E[cover] = 100 = target — no repack at ANY paid history (a repack
    # of a packed layout helps nothing, and its apply would no-op
    # without writing the history-resetting marker: decision livelock)
    packed = [m(i * 100, i * 100 + 99, 100) for i in range(100)]
    heavy = ((5_000, 1),) * 100
    assert not _repack_priced(packed, 10_000, target=100, history=heavy)
    # + a few wide TINY trickle manifests (20 entries spanning the
    # whole range).  The round-12 ski-rental charges MEASURED tax:
    # rewritten-entries minus removed-buckets x target per commit.
    trickles = [m(0, 9_999, 20) for _ in range(8)]
    frag = packed + trickles
    # young fragmentation, no tax paid yet: holds fire
    assert not _repack_priced(frag, 10_160, target=100, history=((0, 0),) * 8)
    # multi-bucket hot-key trickles (the 60-commit drill shape): each
    # commit REWROTE 90 entries but touched 20 buckets — a packed
    # layout would have cost 20 x 100 = 2000, so the measured excess is
    # NEGATIVE and the trigger never fires, at any horizon
    drill = ((90, 20),) * 500
    assert not _repack_priced(frag, 10_160, target=100, history=drill)
    # narrow single-bucket merges paying real tax (each rewrote 600
    # entries where packed would cost 100): fires once the accumulated
    # excess reaches the repack's own cost — 21 x 500 >= 10_160
    narrow = ((600, 1),) * 21
    assert _repack_priced(frag, 10_160, target=100, history=narrow)
    assert not _repack_priced(frag, 10_160, target=100, history=narrow[:-2])
    # regime change: the cheap-trickle era must not bank negative
    # credit against a later narrow-merge era — the CUSUM floor makes
    # the new regime fire on its own 21-commit schedule
    assert _repack_priced(frag, 10_160, target=100, history=drill + narrow)
    # bulk load in one monolith: E[rewrite] = the whole table, payback
    # within 2 commits is certain — fires immediately, no history needed
    assert _repack_priced([m(0, 9_999, 10_000)], 10_000, target=100)
    # shattered list (many near-empty manifests): count rule fires even
    # though E[cover] stays tiny
    shards = [m(i, i, 1) for i in range(64)]
    assert _repack_priced(shards, 64, target=16)
    # single-bucket-dominant layouts (round-12 advice): a width-1
    # manifest holding more than target entries is its OWN fresh pack —
    # _pack_groups never splits a bucket — so pricing one is a
    # guaranteed no-improvement rewrite (the livelock class the
    # round-11 property test's all(n <= target) premise excluded)
    assert not _repack_priced([m(5, 5, 1_000)], 1_000, target=16, history=heavy)
    # ...and a mixed layout prices only the reducible part: one
    # oversized single bucket + a packed disjoint tail stays quiet
    mixed = [m(0, 0, 900)] + [m(1 + i * 16, 16 + i * 16, 16) for i in range(6)]
    assert not _repack_priced(mixed, 996, target=31, history=heavy)
    # a two-bucket oversized manifest IS reducible (fresh pack splits
    # it at the bucket boundary) and fires immediately
    assert _repack_priced([m(0, 1, 1_000)], 1_000, target=16)
    # round 14 — (c) churn guard: a shattered list under uniform
    # bucket churn (measured Σrw < target·Σrb: every commit's rewrites
    # were CHEAPER than a packed layout's) must NOT fire — the
    # 60-commit drill measured consolidation making per-commit cost
    # strictly worse there; the growing list is priced by (b) instead
    churn = ((200, 18, 40),) * 40  # rw << rb·target = 288 at target 16
    assert not _repack_priced(shards, 64, target=16, history=churn)
    # ...while the same shattered list with no churn evidence (empty
    # history) or with expensive rewrites (Σrw ≥ target·Σrb) fires
    assert _repack_priced(shards, 64, target=16, history=((600, 1, 40),) * 4)
    # round 14 — (b) list term: under churn the accumulated
    # manifest-list excess (lines republished past the packed length)
    # eventually outweighs the measured rewrite penalty; with ideal =
    # ceil(10_160/100) = 102, a list grown to ~400 manifests nets
    # (350 - 18*100 + 298) > 0 per commit... still negative here, so
    # a moderately grown list holds fire,
    assert not _repack_priced(
        frag, 10_160, target=100, history=((350, 18, 300),) * 60
    )
    # ...but a list grown far past the crossover (net tax positive:
    # 350 - 1800 + 1898 = +448/commit) fires once the accumulated net
    # reaches the repack's own cost: 23 x 448 >= 10_160
    grown = ((350, 18, 2_000),) * 23
    assert _repack_priced(frag, 10_160, target=100, history=grown)
    assert not _repack_priced(frag, 10_160, target=100, history=grown[:-2])


def test_fresh_handle_follows_persisted_transform(spark, tmp_path):
    # round-9 review twin: the partition-spec transform is the source
    # of truth for ANY handle (and any external engine reading the
    # spec) — constructor defaults must never mis-bucket an existing
    # mod[8] table
    s = IcebergLogSink(spark, str(tmp_path / "t"), n_buckets=8, transform="mod")
    s.init(_snapshot(spark, [(k, 0, float(k)) for k in range(16)]))
    meta = s._current_meta()
    assert meta["partition-spec"][0]["transform"] == "mod[8]"
    fresh = IcebergLogSink(spark, str(tmp_path / "t"))  # defaults: bucket[32]
    fresh.apply_batch(_batch(spark, [(9, 10, "MODIFY", 9.5)]))
    rows = fresh.visible().collect()
    keys = [r.key for r in rows]
    assert len(keys) == len(set(keys)), "duplicate keys: transform not persisted"
    assert {r.payload_value for r in rows if r.key == 9} == {9.5}
    assert fresh._transform() == ("mod", 8)


def test_gc_death_time_is_superseding_snapshot_not_creation(sink, spark):
    # round-9 review: an idle table's base snapshot can be ANCIENT when
    # a fresh commit supersedes its files — the grace must run from the
    # SUPERSEDING snapshot's timestamp (the death), not the dead
    # snapshot's creation time, or the files vanish under a reader that
    # pinned the old snapshot seconds before expiry.
    v1_files = {e["data_file"]["file_path"] for e in sink._entries(_cursnap(sink))}
    meta_num = sink._latest_meta_num()
    meta = sink._load_meta(meta_num)
    for s in meta["snapshots"]:
        s["timestamp-ms"] = 1_000  # ancient creation (white-box rewrite)
    with open(sink._meta_path(meta_num), "w") as fh:
        json.dump(meta, fh)
    sink.apply_batch(_batch(spark, [(3, 10, "MODIFY", 3.5)]))  # fresh death
    v2_files = {e["data_file"]["file_path"] for e in sink._entries(_cursnap(sink))}
    replaced = v1_files - v2_files
    assert replaced
    sink.expire_versions(keep_last=1)  # default grace
    for p in replaced:
        assert os.path.exists(os.path.join(sink.path, p)), (
            "reclaimed on the dead snapshot's creation age: death is fresh"
        )
    # once the death itself ages out (grace 0), a later maintenance
    # cycle's sweep reclaims the now-orphaned files
    sink.apply_batch(_batch(spark, [(3, 11, "MODIFY", 3.6)]))
    sink.expire_versions(keep_last=1, sweep_orphans=True, orphan_grace_s=0.0)
    for p in replaced:
        assert not os.path.exists(os.path.join(sink.path, p))


def test_expire_older_than_retains_recent_beyond_keep_last(sink, spark):
    # expireSnapshots(olderThan, retainLast): BOTH constraints retain —
    # a recent snapshot survives even outside the keep_last window
    sink.apply_batch(_batch(spark, [(1, 10, "MODIFY", 1.5)]))  # snap 2
    sink.apply_batch(_batch(spark, [(2, 11, "MODIFY", 2.5)]))  # snap 3
    meta_num = sink._latest_meta_num()
    meta = sink._load_meta(meta_num)
    meta["snapshots"][0]["timestamp-ms"] = 1_000  # snap 1: ancient
    with open(sink._meta_path(meta_num), "w") as fh:
        json.dump(meta, fh)
    # keep_last=1 alone would drop snaps 1 AND 2; the time axis spares 2
    assert sink.expire_versions(keep_last=1, older_than_ms=2_000) == [1]
    assert [s["sequence-number"] for s in _meta(sink)["snapshots"]] == [2, 3]
    assert sink.snapshot(2).count() > 0  # still resolvable
    with pytest.raises(ValueError, match="expired"):
        sink.snapshot(1)
    # without the time constraint the count axis applies alone
    assert sink.expire_versions(keep_last=1) == [2]


def test_expire_older_than_skewed_clock_keeps_prefix(sink, spark):
    # ADVICE r10: wall-clock skew between committers can dip a middle
    # snapshot's timestamp below olderThan; the expired set must stop
    # at the FIRST surviving snapshot (strict prefix) or the death-time
    # walk pairs wrong successors and understates death times
    sink.apply_batch(_batch(spark, [(1, 10, "MODIFY", 1.5)]))  # snap 2
    sink.apply_batch(_batch(spark, [(2, 11, "MODIFY", 2.5)]))  # snap 3
    sink.apply_batch(_batch(spark, [(3, 12, "MODIFY", 3.5)]))  # snap 4
    meta_num = sink._latest_meta_num()
    meta = sink._load_meta(meta_num)
    # snap 1 ancient, snap 2 RECENT (survivor), snap 3 ancient (skewed
    # committer clock) — the raw filter would pick {1, 3}
    meta["snapshots"][0]["timestamp-ms"] = 1_000
    meta["snapshots"][1]["timestamp-ms"] = 10_000
    meta["snapshots"][2]["timestamp-ms"] = 1_500
    with open(sink._meta_path(meta_num), "w") as fh:
        json.dump(meta, fh)
    assert sink.expire_versions(keep_last=1, older_than_ms=5_000) == [1]
    assert [s["sequence-number"] for s in _meta(sink)["snapshots"]] == [2, 3, 4]


def test_snapshot_timestamps_clamped_monotonic(sink, spark):
    # ADVICE r10: commit timestamps are clamped max(prev_ts, now) so a
    # skewed committer clock can never write a timestamp dip
    meta_num = sink._latest_meta_num()
    meta = sink._load_meta(meta_num)
    future = int(time.time() * 1000) + 3_600_000
    meta["snapshots"][-1]["timestamp-ms"] = future
    with open(sink._meta_path(meta_num), "w") as fh:
        json.dump(meta, fh)
    sink.apply_batch(_batch(spark, [(1, 10, "MODIFY", 1.5)]))
    snaps = _meta(sink)["snapshots"]
    assert snaps[-1]["timestamp-ms"] >= future


def test_append_metadata_resolution_retries_gc_race(sink, spark, monkeypatch):
    # ADVICE r10: append's pre-write metadata reads (merge key + seq
    # hint) must treat a GC'd pinned metadata file as a lost race and
    # retry — the same rule the commit loop already follows
    calls = {"n": 0}
    real = sink._load_meta

    def flaky(n):
        calls["n"] += 1
        if calls["n"] < 3:
            raise FileNotFoundError("expired metadata file")
        return real(n)

    monkeypatch.setattr(sink, "_load_meta", flaky)
    sink.append(_batch(spark, [(1, 10, "MODIFY", 1.5)]))
    assert calls["n"] >= 3
    monkeypatch.undo()
    assert sorted(
        (r.key, r.payload_value)
        for r in sink.visible().where(F.col("key") == 1).collect()
    ) == [(1, 1.5)]


def _manifest_paths(sink):
    return [
        m["manifest_path"] for m in sink._manifest_list(_cursnap(sink))
    ]


def test_rewrite_manifests_preserves_state_and_prunes(spark, tmp_path):
    s = IcebergLogSink(spark, str(tmp_path / "t"), n_buckets=8, transform="mod")
    s.init(_snapshot(spark, [(k, 0, float(k)) for k in range(16)]))
    # several appends → many small manifests, incl. pending MOR files
    s.append(_batch(spark, [(1, 10, "MODIFY", 1.5), (9, 11, "INSERT", 9.0)]))
    s.append(_batch(spark, [(2, 12, "REMOVE", None), (5, 13, "MODIFY", 5.5)]))
    s.apply_batch(_batch(spark, [(3, 14, "MODIFY", 3.5)]))
    before = {
        (r.key, r.last_seq, r.payload_value) for r in s.visible().collect()
    }
    n_before = len(_manifest_paths(s))
    # age_floor=0: the explicit-operator FULL repack (the default LSM
    # floor would exempt the hot fringe this test deliberately packs)
    n_after = s.rewrite_manifests(target_entries=4, age_floor=0)
    assert n_after == len(_manifest_paths(s)) and n_after < n_before
    # metadata-only: the data file SET is unchanged
    assert {
        (r.key, r.last_seq, r.payload_value) for r in s.visible().collect()
    } == before
    # two-level pruning still exact after the repack
    snap = _cursnap(s)
    only3 = s._entries(snap, buckets={3})
    assert only3 and all(
        e["data_file"]["partition"]["bucket"] == 3 for e in only3
    )
    # pending MOR entries survive the repack and compact_mor still
    # retires them
    assert any(s._is_pending(e) for e in s._entries(snap))
    s.compact_mor(set(range(8)))
    assert {
        (r.key, r.last_seq, r.payload_value) for r in s.visible().collect()
    } == before
    assert not any(s._is_pending(e) for e in s._entries(_cursnap(s)))


def test_rewrite_manifests_bounds_merge_rewrite_width(spark, tmp_path):
    # the round-9 scale finding: with the whole table in one manifest,
    # every trickle MERGE rewrites O(table) manifest entries. After the
    # repack, a one-bucket MERGE reuses every manifest it doesn't touch
    # BY PATH and rewrites only the small ones covering its bucket.
    s = IcebergLogSink(spark, str(tmp_path / "t"), n_buckets=8, transform="mod")
    s.init(_snapshot(spark, [(k, 0, float(k)) for k in range(32)]))  # 1 manifest
    s.rewrite_manifests(target_entries=1)  # one manifest per bucket
    paths = set(_manifest_paths(s))
    assert len(paths) == 8
    s.apply_batch(_batch(spark, [(3, 10, "MODIFY", 3.5)]))  # bucket 3 only
    after = _manifest_paths(s)
    # 7 of 8 repacked manifests reused by path; bucket 3's manifest is
    # dropped (its only file was removed) and the rewritten bucket
    # lands in one fresh ADDED manifest
    assert len(set(after) & paths) == 7
    assert len(after) == 8


def test_rewrite_manifests_noop_when_packed(spark, tmp_path):
    s = IcebergLogSink(spark, str(tmp_path / "t"), n_buckets=4, transform="mod")
    s.init(_snapshot(spark, [(k, 0, float(k)) for k in range(4)]))
    v = s.latest_version()
    s.rewrite_manifests(target_entries=1)
    assert s.latest_version() == v + 1
    v = s.latest_version()
    # already packed: publishes nothing
    s.rewrite_manifests(target_entries=1)
    assert s.latest_version() == v


def test_repack_pricing_properties():
    # property: a freshly packed layout — disjoint spans, every
    # manifest within target, count == ceil(entries/target) — is NEVER
    # priced (provable: cover = sum n_i*w_i <= target * sum w_i <=
    # target * total_w < 2*target*total_w), and a monolith holding
    # >= 2*target entries ALWAYS is. Randomized over layout shapes so
    # the trigger can't regress into repack livelock.
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dynamodb_pitr_restore_cdc_spark.streaming.iceberg_log_sink import (
        _manifest_target,
        _repack_priced,
    )

    def m(lo, hi, n):
        return {
            "partitions": {"bucket": {"lower": lo, "upper": hi}},
            "added_files_count": n,
            "existing_files_count": 0,
        }

    @settings(max_examples=200, deadline=None)
    @given(
        sizes=st.lists(st.integers(1, 500), min_size=1, max_size=40),
        gaps=st.lists(st.integers(0, 50), min_size=40, max_size=40),
    )
    def packed_never_priced(sizes, gaps):
        entries = sum(sizes)
        target = _manifest_target(entries)
        # repack sizes onto the target exactly like _pack_groups would:
        # greedy fill to target, then lay the groups out disjointly
        groups, cur = [], 0
        for s in sizes:
            cur += s
            if cur >= target:
                groups.append(cur)
                cur = 0
        if cur:
            groups.append(cur)
        spans, lo = [], 0
        for g, gap in zip(groups, gaps):
            spans.append(m(lo, lo + g - 1, g))
            lo += g + gap
        # greedy fill can exceed target on the last element added;
        # clamp the premise: only claim the property when within it
        if all(s["added_files_count"] <= target for s in spans) and len(
            spans
        ) <= 2 * (-(-entries // target)):
            # at ANY paid history: a packed layout's excess is <= 0, so
            # neither the immediate nor the ski-rental rule can fire
            # (firing would price a no-op rewrite that never resets the
            # history marker — decision livelock)
            heavy = ((10 * entries, 1),) * 50
            assert not _repack_priced(spans, entries, target, history=heavy)

    @settings(max_examples=100, deadline=None)
    @given(
        n=st.integers(32, 100_000),
        width=st.integers(2, 1_000_000),
    )
    def monolith_always_priced(n, width):
        # width >= 2: a width-1 monolith is a single bucket, which is
        # its own fresh pack (see single_bucket_never_priced below)
        target = _manifest_target(n)
        if n >= 2 * target:
            assert _repack_priced([m(0, width - 1, n)], n, target)

    @settings(max_examples=200, deadline=None)
    @given(
        n=st.integers(1, 100_000),
        bucket=st.integers(0, 10_000),
        paid=st.integers(0, 10**9),
    )
    def single_bucket_never_priced(n, bucket, paid):
        # round-12 advice: _pack_groups keeps a bucket's files
        # together, so a single-bucket table packs into ONE manifest
        # no matter how many entries it holds — pricing it would be a
        # guaranteed no-improvement rewrite every commit (livelock),
        # at ANY paid history
        target = _manifest_target(n)
        assert not _repack_priced(
            [m(bucket, bucket, n)], n, target, history=((paid, 0),)
        )

    packed_never_priced()
    monolith_always_priced()
    single_bucket_never_priced()


def test_lsm_priced_repack_always_acts_property():
    """Round-14 livelock invariant, end to end through the aged scope:
    whenever the pricing fires on the COLD subset of a random layout
    (random per-manifest entry buckets, ages, and measured histories),
    the aged apply must genuinely change that subset —
    _manifests_packed(cold, _pack_groups(cold entries)) is False — or
    the REPACK row would never write the history-resetting marker."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dynamodb_pitr_restore_cdc_spark.streaming.iceberg_log_sink import (
        _manifest_target,
        _manifests_packed,
        _pack_groups,
        _repack_priced,
        _split_lsm,
    )

    def summarize(buckets, seq):
        return {
            "partitions": {"bucket": {"lower": min(buckets), "upper": max(buckets)}},
            "added_files_count": len(buckets),
            "existing_files_count": 0,
            "added_sequence_number": seq,
        }

    def entry(b):
        return {
            "status": "EXISTING",
            "data_file": {"file_path": "", "partition": {"bucket": b}},
        }

    @settings(max_examples=300, deadline=None)
    @given(
        layout=st.lists(
            st.tuples(
                st.lists(st.integers(0, 200), min_size=1, max_size=60),
                st.integers(1, 30),  # added_seq
            ),
            min_size=1,
            max_size=25,
        ),
        cur_seq=st.integers(30, 40),
        history=st.lists(
            st.tuples(
                st.integers(0, 5_000),
                st.integers(0, 50),
                st.integers(0, 300),
            ),
            max_size=30,
        ),
    )
    def priced_implies_apply_acts(layout, cur_seq, history):
        summaries = [summarize(bs, seq) for bs, seq in layout]
        n_total = sum(len(bs) for bs, _ in layout)
        target = _manifest_target(n_total)
        cold, _hot = _split_lsm(summaries, cur_seq, target)
        cold_entries = sum(
            m["added_files_count"] + m["existing_files_count"] for m in cold
        )
        if not cold or not _repack_priced(
            cold, cold_entries, target, tuple(history)
        ):
            return
        cold_set = {id(m) for m in cold}
        entries = [
            entry(b)
            for (bs, seq), s in zip(layout, summaries)
            if id(s) in cold_set
            for b in bs
        ]
        groups = _pack_groups(entries, target)
        assert not _manifests_packed(cold, groups, target), (
            "pricing fired on a cold subset its own apply would no-op"
        )

    priced_implies_apply_acts()


def test_repack_history_marker_and_metrics(sink, spark):
    # round 12: the ski-rental rule (b) charges MEASURED tax — per-
    # commit (rewritten-entries, removed-buckets) summary metrics —
    # accumulated since the last REPACK, which is marked by the
    # rewrite_manifests snapshot's manifests-replaced metric.
    # compact_mor is also a "replace" operation but rewrites DATA, not
    # the manifest layout: it must NOT reset the history.
    hist = IcebergLogSink._repack_history
    # triples: (rewritten, removed-buckets, manifest-list length)
    assert hist(sink._current_meta()) == ((0, 0, 1),)  # init: no tax
    # blind appends rewrite nothing and remove nothing — but each adds
    # one manifest, which the list-length metric records
    for seq in (10, 11):
        sink.append(_batch(spark, [(1, seq, "MODIFY", float(seq))]))
    assert hist(sink._current_meta()) == ((0, 0, 1), (0, 0, 2), (0, 0, 3))
    # explicit full repack (age_floor=0): consolidates all 3 manifests
    # into one multi-bucket pack — the default LSM floor would rightly
    # no-op here (init is its own fresh pack; the appends are hot)
    assert sink.rewrite_manifests(age_floor=0) >= 1
    assert hist(sink._current_meta()) == ()  # marker resets the clock
    # a MERGE pays real tax: it removes files from covering manifests
    sink.apply_batch(_batch(spark, [(1, 12, "MODIFY", 12.0)]))
    h = hist(sink._current_meta())
    assert len(h) == 1 and h[0][0] > 0 and h[0][1] >= 1, h
    # compact_mor (a data "replace") appends to the history, never
    # resets it
    sink.append(_batch(spark, [(2, 13, "MODIFY", 13.0)]))
    sink.compact_mor({b for b in range(sink.n_buckets)})
    assert len(hist(sink._current_meta())) == 3
    # expiry truncating history only UNDERCOUNTS paid tax
    sink.expire_versions(keep_last=2, orphan_grace_s=0.0)
    assert len(hist(sink._current_meta())) <= 2


def test_single_bucket_table_never_repacks_end_to_end(spark, tmp_path):
    # the round-12 advice livelock, driven through the real sink: a
    # table whose keys all hash into ONE bucket is its own fresh pack
    # at any size, so optimize_plan must never price a REPACK row for
    # manifest consolidation and rewrite_manifests must consolidate
    # the multi-manifest layout ONCE and then no-op (no new snapshot,
    # no metadata churn) — not republish an unimprovable layout
    s = IcebergLogSink(spark, str(tmp_path / "t"), n_buckets=1)
    s.init(_snapshot(spark, [(k, 0, float(k)) for k in range(24)]))
    for seq in (10, 11, 12):
        s.append(_batch(spark, [(seq, seq, "MODIFY", float(seq))]))
    # 4 manifests over 1 bucket: list-length pricing may consolidate...
    n_after = s.rewrite_manifests(age_floor=0)
    assert n_after == 1
    # ...but the consolidated single-bucket layout must be terminal:
    meta_num = s._latest_meta_num()
    plan = s.optimize_plan(
        small_file_rows=100, min_small_files=3, tombstone_pct=15
    ).collect()
    assert not [r for r in plan if r.decision == "REPACK"]
    assert s.rewrite_manifests() == 1  # no-op: fresh-pack-identical
    assert s._latest_meta_num() == meta_num  # zero commits published


def test_rule_b_fires_after_c_horizon_on_blind_appends():
    """Round-14 advice: the optimize_plan oracle omits rule (b) for
    its blind-append lifecycle, and the reason is NOT that (b)'s terms
    vanish — the round-14 list term banks max(0, mlen - ideal) > 0
    whenever the manifest list outgrows the packed length.  Two real
    mechanisms bound it instead, pinned here on pure blind-append
    histories ((0, 0, mlen) per commit): the packed gate (cover
    excess <= 0 returns before (b) — a layout repacking cannot
    improve never fires, whatever the banked history), and horizon
    arithmetic (each commit banks < ideal while (c) is short, so (b)
    needs T >= ~target commits — far past the oracle drill's 6).  At
    long horizons (b) IS the designed backstop (the SCALE.md horizon
    drill's ~commit-300 crossover): full-span trickles cross at T=52
    here, while (c) is still 75 commits away and (a) never fires."""
    from dynamodb_pitr_restore_cdc_spark.streaming.iceberg_log_sink import (
        _repack_priced,
    )

    def m(lo, hi, n):
        return {
            "partitions": {"bucket": {"lower": lo, "upper": hi}},
            "added_files_count": n,
            "existing_files_count": 0,
        }

    target = 10

    def lifecycle(span_w, per_append):
        # init: 100 packed width-1 manifests of `target` entries on
        # buckets 0..99 (cover excess exactly 0); each append commits
        # one manifest of per_append entries spanning span_w buckets
        lists, hists, ns = [[m(i, i, target) for i in range(100)]], [()], [1000]
        for t in range(1, 140):
            lo = 0 if span_w > 1 else 100 + t
            hi = span_w - 1 if span_w > 1 else 100 + t
            lst = lists[-1] + [m(lo, hi, per_append)]
            lists.append(lst)
            ns.append(ns[-1] + per_append)
            hists.append(hists[-1] + ((0, 0, len(lst)),))
        return lists, hists, ns

    # (1) bounded horizon: before T = target commits, (b) adds nothing
    # a history-less call lacks, in both regimes below
    for span_w, per in ((1, target), (100, 1)):
        lists, hists, ns = lifecycle(span_w, per)
        for t in range(1, target):
            with_hist = _repack_priced(lists[t], ns[t], target, hists[t])
            without = _repack_priced(lists[t], ns[t], target, ())
            assert with_hist == without == False  # noqa: E712

    # (2) width-1 appends keep the layout effectively packed (cover
    # excess <= 0): the packed gate makes (b) unreachable at ANY
    # horizon, however large the banked list excess
    lists, hists, ns = lifecycle(1, target)
    for t in (25, 60, 139):
        assert not _repack_priced(lists[t], ns[t], target, hists[t])

    # (3) full-span 1-entry trickles (excess > 0 but far from (a)'s
    # immediate-payback bar): the accumulated list excess crosses the
    # table's own rewrite cost at T = 52, while (c) needs T = 127 and
    # (a) never fires — the backstop, firing in the designed order
    lists, hists, ns = lifecycle(100, 1)
    for t in (51, 52):
        ideal = -(-ns[t] // target)
        assert len(lists[t]) <= 2 * ideal  # (c) quiet
        assert not _repack_priced(lists[t], ns[t], target, ())  # (a) quiet
    assert not _repack_priced(lists[51], ns[51], target, hists[51])
    assert _repack_priced(lists[52], ns[52], target, hists[52])
