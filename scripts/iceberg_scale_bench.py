#!/usr/bin/env python
"""Iceberg-vs-Delta METADATA scale evidence (SCALE.md; round-8 verdict
item 7): at a synthetic 10^4-bucket layout, measure what each commit
WRITES (metadata bytes) and what a reader must RESOLVE (wall time to
enumerate the live file set) as commits accumulate — the two formats'
structural difference, isolated from data volume:

- Delta commit = ONE O(changed-files) NDJSON log entry; resolve =
  replay of every commit since the newest checkpoint (O(commits),
  bounded only by checkpoint cadence).
- Iceberg commit = new manifest (O(changed files)) + NEW MANIFEST LIST
  (O(total manifests) lines — rewritten every commit) + NEW METADATA
  FILE (O(snapshots) — the full snapshot list is republished every
  commit); resolve = one metadata read + the manifest tree (no replay,
  and expireSnapshots truncates both lists).

So Delta's per-commit metadata is flat and its resolve degrades with
log length; Iceberg's resolve is flat and its per-commit metadata
grows with table width (manifests) and age (snapshots). The numbers
below make that trade concrete for the 100 TB CDC-trickle shape
(narrow MERGE commits into a wide table).

Run: python scripts/iceberg_scale_bench.py  (~3-5 min on local[32];
SPARK_GRAFT_SF_DIR overrides the changelog source, default sf0.1).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dynamodb_pitr_restore_cdc_spark.operators.cdc import changelog, fold_changelog
from dynamodb_pitr_restore_cdc_spark.session import get_spark
from dynamodb_pitr_restore_cdc_spark.streaming.delta_log_sink import DeltaLogSink
from dynamodb_pitr_restore_cdc_spark.streaming.iceberg_log_sink import (
    IcebergLogSink,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BUCKETS = 10_000
# horizon is env-tunable (round 12): the 12-commit default shows the
# short-horizon parity with a hand-placed repack; ICEBERG_COMMITS=60
# shows the ski-rental cadence past the crossover where the manual
# lane's unbounded rewrite width starts losing
N_COMMITS = int(os.environ.get("ICEBERG_COMMITS", "12"))
TRICKLE_KEYS = 20
# comma-separated lane filter, default all; strip + validate so a
# typo'd or space-padded lane list fails loudly instead of silently
# measuring nothing
_ALL_LANES = ("delta", "iceberg", "iceberg+rm", "iceberg+policy")
LANES = [
    lane.strip()
    for lane in os.environ.get("ICEBERG_LANES", ",".join(_ALL_LANES)).split(",")
    if lane.strip()
]
_unknown = set(LANES) - set(_ALL_LANES)
if _unknown:
    raise SystemExit(f"unknown ICEBERG_LANES: {sorted(_unknown)}")


def dir_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
    return total


def resolve_time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def policy_repack(sink, meta_root: str) -> int:
    """Consult the maintenance plan (round-11: optimize_plan prices
    manifest fragmentation as a table-scoped REPACK row) and apply it.
    Returns the repack's metadata bytes (0 = the policy declined)."""
    plan = sink.optimize_plan(
        small_file_rows=100, min_small_files=3, tombstone_pct=15
    ).collect()
    if not any(r.decision == "REPACK" for r in plan):
        return 0
    before = dir_bytes(meta_root)
    sink.rewrite_manifests()
    return dir_bytes(meta_root) - before


def bench(
    fmt: str,
    sink,
    meta_root: str,
    base_df,
    trickles,
    rewrite_every: int = 0,
    policy: bool = False,
) -> dict:
    """rewrite_every > 0 adds the round-10 maintenance lane: a
    rewriteManifests repack after init and every N commits, so trickle
    MERGEs rewrite O(touched·√table) manifest entries instead of
    O(table) — the mitigation for the round-9 manifest-width finding.
    policy=True adds the round-11 lane: NO operator cadence — after
    init and after every commit the sink's own optimize_plan decides
    (debt-fraction trigger), and the repack runs only when priced."""
    t0 = time.perf_counter()
    sink.init(base_df)
    t_init = time.perf_counter() - t0
    rm_bytes = 0  # the repacks' own metadata bytes — reported
    # amortized so the +rm lane's per-commit numbers aren't flattered
    # by cost that landed between measurement windows
    n_repacks = 0
    if rewrite_every:
        before = dir_bytes(meta_root)
        sink.rewrite_manifests()
        rm_bytes += dir_bytes(meta_root) - before
    if policy:
        b = policy_repack(sink, meta_root)
        rm_bytes += b
        n_repacks += 1 if b else 0
    per_commit = []
    for i, batch in enumerate(trickles):
        before = dir_bytes(meta_root)
        t0 = time.perf_counter()
        sink.apply_batch(batch)
        wall = time.perf_counter() - t0
        per_commit.append({"wall_s": wall, "meta_bytes": dir_bytes(meta_root) - before})
        if rewrite_every and (i + 1) % rewrite_every == 0:
            before = dir_bytes(meta_root)
            sink.rewrite_manifests()
            rm_bytes += dir_bytes(meta_root) - before
        if policy:
            b = policy_repack(sink, meta_root)
            rm_bytes += b
            n_repacks += 1 if b else 0
    # reader cost: enumerate the live file set, metadata only (no data
    # read) — Delta replays the log, Iceberg walks the manifest tree
    if fmt == "delta":
        t_resolve = resolve_time(lambda: sink._state())
    else:
        t_resolve = resolve_time(
            lambda: sink._entries(
                sink._snapshot_record(sink._current_meta(), None)
            )
        )
    return {
        "init_s": t_init,
        "per_commit": per_commit,
        "rm_bytes": rm_bytes,
        "n_repacks": n_repacks,
        "resolve_s": t_resolve,
        "meta_total_bytes": dir_bytes(meta_root),
    }


def expire_and_remeasure(fmt: str, sink, meta_root: str) -> dict:
    """Maintenance flattens each format's growth axis: Delta's
    checkpoint bounds replay; Iceberg's expireSnapshots truncates the
    snapshot list (and with it every future metadata file)."""
    # grace 0: single-writer measurement — retention sparing would hide
    # the GC effect the numbers exist to show
    sink.expire_versions(keep_last=2, orphan_grace_s=0.0)
    if fmt == "delta":
        t_resolve = resolve_time(lambda: sink._state())
    else:
        t_resolve = resolve_time(
            lambda: sink._entries(
                sink._snapshot_record(sink._current_meta(), None)
            )
        )
    return {"resolve_s": t_resolve, "meta_total_bytes": dir_bytes(meta_root)}


def main() -> None:
    spark = get_spark("iceberg-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")
    cl = (
        changelog(spark, SF_DIR)
        .select("seq_no", "op", "key", "payload_value")
        .localCheckpoint(eager=True)
    )
    max_seq = cl.agg(F.max("seq_no")).first()[0]
    c1 = max_seq // 2
    base_fold = fold_changelog(cl.where(F.col("seq_no") <= c1)).localCheckpoint(
        eager=True
    )
    # N_COMMITS disjoint ~TRICKLE_KEYS-key trickles from the tail — the
    # CDC micro-batch shape whose metadata cost the formats must bound
    tail = (
        cl.where(F.col("seq_no") > c1)
        .withColumn("slot", F.ntile(N_COMMITS).over(Window.orderBy("seq_no")))
        .localCheckpoint(eager=True)
    )
    trickles = [
        tail.where(F.col("slot") == i + 1)
        .orderBy("seq_no")
        .limit(TRICKLE_KEYS)
        .drop("slot")
        .localCheckpoint(eager=True)
        for i in range(N_COMMITS)
    ]

    for fmt in [f for f in _ALL_LANES if f in LANES]:
        work = os.path.join(
            tempfile.gettempdir(), f"icescale-{uuid.uuid4().hex[:8]}"
        )
        t = os.path.join(work, "t")
        if fmt == "delta":
            sink = DeltaLogSink(spark, t, n_buckets=N_BUCKETS)
            meta_root = os.path.join(t, "_delta_log")
        else:
            sink = IcebergLogSink(spark, t, n_buckets=N_BUCKETS)
            meta_root = os.path.join(t, "metadata")
        try:
            r = bench(
                fmt,
                sink,
                meta_root,
                base_fold,
                trickles,
                # repack once after the bulk load (the production
                # cadence: init lands the whole table in ONE manifest,
                # which every trickle MERGE would otherwise rewrite);
                # N_COMMITS+1 means no mid-drill repack fires, so the
                # per-commit numbers show the bounded-width effect and
                # rm_bytes amortizes exactly one repack
                rewrite_every=N_COMMITS + 1 if fmt == "iceberg+rm" else 0,
                # round-11 lane: the sink's own debt-fraction policy
                # decides when to repack — no operator cadence at all
                policy=fmt == "iceberg+policy",
            )
            first, last = r["per_commit"][0], r["per_commit"][-1]
            print(
                f"{fmt} n_buckets={N_BUCKETS} commits={N_COMMITS} "
                f"trickle={TRICKLE_KEYS}keys: init={r['init_s']:.1f}s "
                f"commit1 meta={first['meta_bytes']}B {first['wall_s']:.2f}s "
                f"commit{N_COMMITS} meta={last['meta_bytes']}B {last['wall_s']:.2f}s "
                f"resolve={r['resolve_s'] * 1000:.0f}ms "
                f"meta_total={r['meta_total_bytes']}B"
            )
            growth = [c["meta_bytes"] for c in r["per_commit"]]
            print(f"{fmt} per-commit meta bytes: {growth}")
            if r["rm_bytes"]:
                print(
                    f"{fmt} rewrite_manifests bytes total={r['rm_bytes']} "
                    f"(amortized {r['rm_bytes'] // N_COMMITS}B/commit"
                    + (
                        f", {r['n_repacks']} policy-triggered repacks"
                        if r["n_repacks"]
                        else ""
                    )
                    + ")"
                )
            e = expire_and_remeasure(fmt, sink, meta_root)
            print(
                f"{fmt} after expire(keep_last=2): "
                f"resolve={e['resolve_s'] * 1000:.0f}ms "
                f"meta_total={e['meta_total_bytes']}B"
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
