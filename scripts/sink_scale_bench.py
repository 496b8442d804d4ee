#!/usr/bin/env python
"""Versioned-sink scale evidence (SCALE.md): measures, on local[32],
the copy-on-write sink's core operations at sf0.1 and at a 10×
replication of it, to show what scales with the TABLE and what scales
with the CHANGE:

- commit (apply_batch of the last 5% of seqs): COW — cost tracks the
  touched-bucket subset, not the table;
- time-travel read (visible at the middle commit): manifest-listed
  read of the whole retained version — O(table);
- changefeed (middle commit → latest): manifest-pruned — cost tracks
  changed buckets only.

10× replication shifts event_id/user_id so keys are disjoint across
replicas (10× keys, 10× rows — a genuine corpus growth, not 10 copies
of the same key space).
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.operators.cdc import changelog, fold_changelog
from dynamodb_pitr_restore_cdc_spark.session import get_spark
from dynamodb_pitr_restore_cdc_spark.streaming.versioned_sink import (
    VersionedCdcSink,
    _changes_between,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 3
REPLICAS = 10
N_BUCKETS = 64


def timed(fn) -> float:
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def replicate(cl, n: int):
    """n disjoint key/seq shards of the changelog (shifted ids)."""
    parts = []
    for i in range(n):
        shift = i * 10_000_000
        parts.append(
            cl.select(
                (F.col("seq_no") + shift).alias("seq_no"),
                "op",
                (F.col("key") + shift).alias("key"),
                "payload_value",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def bench(tag: str, cl) -> None:
    # materialize the changelog once so sink timings don't re-derive it
    cl = cl.localCheckpoint(eager=True)
    max_seq = cl.agg(F.max("seq_no")).first()[0]
    n = cl.count()
    c1, c2, c3 = max_seq // 2, (3 * max_seq) // 4, (95 * max_seq) // 100

    work = os.path.join(tempfile.gettempdir(), f"sinkbench-{uuid.uuid4().hex[:8]}")
    sink = VersionedCdcSink(cl.sparkSession, work, n_buckets=N_BUCKETS)
    try:
        sink.init(fold_changelog(cl.where(F.col("seq_no") <= c1)))
        sink.apply_batch(cl.where((F.col("seq_no") > c1) & (F.col("seq_no") <= c2)))
        sink.apply_batch(cl.where((F.col("seq_no") > c2) & (F.col("seq_no") <= c3)))
        tail = cl.where(F.col("seq_no") > c3).localCheckpoint(eager=True)

        t_commit = timed(lambda: sink.apply_batch(tail))
        t_read = timed(lambda: sink.visible(version=2).write.format("noop").mode("overwrite").save())
        t_feed = timed(
            lambda: _changes_between(sink, 2, sink.latest_version())
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        print(
            f"{tag}: rows={n} commit_tail5pct={t_commit:.3f}s "
            f"timetravel_read={t_read:.3f}s changefeed={t_feed:.3f}s"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_wide(cl) -> None:
    """Manifest sharding at 10^4 buckets: a narrow commit must write
    O(touched shards) manifest files/bytes, not one global map, and
    time travel must stay correct at that width."""
    cl = cl.localCheckpoint(eager=True)
    max_seq = cl.agg(F.max("seq_no")).first()[0]
    # the narrow batch is a ~20-key CDC trickle — the realistic
    # micro-batch shape whose metadata cost sharding bounds; hash
    # bucketing spreads a LARGE batch over every shard by design
    c1, c2 = max_seq // 2, max_seq - 20

    work = os.path.join(tempfile.gettempdir(), f"sinkwide-{uuid.uuid4().hex[:8]}")
    sink = VersionedCdcSink(cl.sparkSession, work, n_buckets=10_000, shard_size=64)
    try:
        t0 = time.perf_counter()
        sink.init(fold_changelog(cl.where(F.col("seq_no") <= c1)))
        t_init = time.perf_counter() - t0
        sink.apply_batch(cl.where((F.col("seq_no") > c1) & (F.col("seq_no") <= c2)))
        narrow = cl.where(F.col("seq_no") > c2).localCheckpoint(eager=True)
        t_commit = timed(lambda: sink.apply_batch(narrow))

        v = sink.latest_version()
        r_prev, r_last = sink._root(v - 1), sink._root(v)
        changed = {s for s in set(r_prev) | set(r_last) if r_prev.get(s) != r_last.get(s)}
        changed_bytes = sum(
            os.path.getsize(sink._shard_path(r_last[s])) for s in changed if s in r_last
        )
        total_bytes = sum(
            os.path.getsize(sink._shard_path(t)) for t in set(r_last.values())
        )
        # correctness at width: latest == full fold (both-ways anti-join)
        got, want = sink.visible(), fold_changelog(cl)
        assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
        print(
            f"wide n_buckets={sink.n_buckets} shard_size={sink.shard_size}: init={t_init:.1f}s "
            f"narrow_commit={t_commit:.3f}s shards_total={len(r_last)} "
            f"shards_rewritten={len(changed)} "
            f"manifest_bytes_touched={changed_bytes} of {total_bytes} "
            f"({100 * changed_bytes / total_bytes:.1f}%) timetravel=ok"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_delta(tag: str, cl) -> None:
    """Same shape as bench(), against the Delta-log format: MERGE cost
    must track the touched-bucket subset (partitionValues skipping),
    time travel is a checkpoint-bounded log replay + pruned read, and
    the changefeed diffs only the buckets whose files changed."""
    from dynamodb_pitr_restore_cdc_spark.streaming.delta_log_sink import (
        DeltaLogSink,
    )

    cl = cl.localCheckpoint(eager=True)
    max_seq = cl.agg(F.max("seq_no")).first()[0]
    n = cl.count()
    c1, c2, c3 = max_seq // 2, (3 * max_seq) // 4, (95 * max_seq) // 100

    work = os.path.join(tempfile.gettempdir(), f"deltabench-{uuid.uuid4().hex[:8]}")
    sink = DeltaLogSink(cl.sparkSession, os.path.join(work, "t"), n_buckets=N_BUCKETS)
    try:
        sink.init(fold_changelog(cl.where(F.col("seq_no") <= c1)))
        sink.apply_batch(cl.where((F.col("seq_no") > c1) & (F.col("seq_no") <= c2)))
        sink.apply_batch(cl.where((F.col("seq_no") > c2) & (F.col("seq_no") <= c3)))
        tail = cl.where(F.col("seq_no") > c3).localCheckpoint(eager=True)

        t_commit = timed(lambda: sink.apply_batch(tail))
        t_read = timed(
            lambda: sink.snapshot(2).write.format("noop").mode("overwrite").save()
        )
        t_feed = timed(
            lambda: sink.changes_between(2, sink.latest_version())
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        print(
            f"{tag}: rows={n} commit_tail5pct={t_commit:.3f}s "
            f"timetravel_read={t_read:.3f}s changefeed={t_feed:.3f}s"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    spark = get_spark("sink-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    cl1 = changelog(spark, SF_DIR).select("seq_no", "op", "key", "payload_value")
    bench("sf0.1", cl1)
    bench(f"sf0.1 x{REPLICAS}", replicate(cl1, REPLICAS))
    bench_wide(cl1)
    bench_delta("delta sf0.1", cl1)
    bench_delta(f"delta sf0.1 x{REPLICAS}", replicate(cl1, REPLICAS))


if __name__ == "__main__":
    main()
