"""Checkpoint recovery: the streaming CDC apply must resume — process
only files the checkpoint hasn't committed, continue from the sink's
last version, and be a no-op when nothing new arrived. This is the
restart story the reference's queue+Lambda pipeline gets from SQS
redelivery, here provided by source checkpoint + versioned sink
pointer + idempotent merge."""

import os

import pandas as pd

from dynamodb_pitr_restore_cdc_spark.streaming.cdc_stream import run_cdc_apply


def _write_file(df, path, mtime):
    pdf = df.toPandas()
    pdf.to_parquet(path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    os.utime(path, (mtime, mtime))


def _cl(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["seq_no", "op", "key", "ts", "payload_value", "payload_props", "content_hash"]
    )
    return spark.createDataFrame(
        pdf,
        schema="seq_no long, op string, key long, ts timestamp, "
        "payload_value double, payload_props string, content_hash string",
    )


def test_resume_processes_only_new_files(spark, tmp_path):
    src = tmp_path / "src"
    work = str(tmp_path / "work")
    src.mkdir()

    snapshot = _cl(spark, []).selectExpr("key", "seq_no as last_seq", "payload_value")
    f1 = _cl(spark, [(1, "INSERT", 10, None, 1.0, "{}", "h1"), (2, "INSERT", 11, None, 2.0, "{}", "h2")])
    f2 = _cl(spark, [(3, "MODIFY", 10, None, 5.0, "{}", "h3")])
    _write_file(f1, str(src / "00000.parquet"), 1_700_000_000)
    _write_file(f2, str(src / "00001.parquet"), 1_700_000_001)

    final1 = run_cdc_apply(spark, str(src), snapshot, work)
    got1 = {r.key: (r.last_seq, r.payload_value) for r in spark.read.parquet(final1).collect()}
    assert got1 == {10: (3, 5.0), 11: (2, 2.0)}

    # "restart": new file arrives, rerun against the SAME work dir.
    f3 = _cl(spark, [(4, "REMOVE", 11, None, None, None, "h4"), (5, "INSERT", 12, None, 9.0, "{}", "h5")])
    _write_file(f3, str(src / "00002.parquet"), 1_700_000_002)
    final2 = run_cdc_apply(spark, str(src), snapshot, work)
    got2 = {r.key: (r.last_seq, r.payload_value) for r in spark.read.parquet(final2).collect()}
    # batches 1-2 NOT reprocessed (their effect persists via the resumed
    # sink version), batch 3 applied exactly once
    assert got2 == {10: (3, 5.0), 12: (5, 9.0)}

    # no new data -> state unchanged
    final3 = run_cdc_apply(spark, str(src), snapshot, work)
    got3 = {r.key: (r.last_seq, r.payload_value) for r in spark.read.parquet(final3).collect()}
    assert got3 == got2


def test_replayed_epoch_after_pointer_write_is_skipped(spark, tmp_path):
    """Crash window between the sink's pointer write and the stream's
    commit-log write: the restarted query replays the epoch with the
    SAME epoch_id, whose v{epoch} dir is already the committed pointer.
    The sink must skip it (re-merging would read and overwrite one
    path) and converge to the same state."""
    src = tmp_path / "src"
    work = str(tmp_path / "work")
    src.mkdir()

    snapshot = _cl(spark, []).selectExpr("key", "seq_no as last_seq", "payload_value")
    f1 = _cl(spark, [(1, "INSERT", 10, None, 1.0, "{}", "h1")])
    f2 = _cl(spark, [(2, "MODIFY", 10, None, 7.0, "{}", "h2"), (3, "INSERT", 11, None, 2.0, "{}", "h3")])
    _write_file(f1, str(src / "00000.parquet"), 1_700_000_000)
    _write_file(f2, str(src / "00001.parquet"), 1_700_000_001)

    final1 = run_cdc_apply(spark, str(src), snapshot, work)
    want = {r.key: (r.last_seq, r.payload_value) for r in spark.read.parquet(final1).collect()}
    assert want == {10: (2, 7.0), 11: (3, 2.0)}

    # simulate the crash: pointer (written) says v1, but batch 1's
    # commit record never landed -> restart replays epoch 1
    commits_dir = os.path.join(work, "_checkpoint", "commits")
    last = sorted(f for f in os.listdir(commits_dir) if not f.startswith("."))[-1]
    os.remove(os.path.join(commits_dir, last))
    crc = os.path.join(commits_dir, f".{last}.crc")  # local-fs checksum sidecar
    if os.path.exists(crc):
        os.remove(crc)

    final2 = run_cdc_apply(spark, str(src), snapshot, work)
    got = {r.key: (r.last_seq, r.payload_value) for r in spark.read.parquet(final2).collect()}
    assert got == want
    assert final2 == final1
