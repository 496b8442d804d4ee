"""Versioned CDC sink: copy-on-write time travel — the engine's own
point-in-time restore.

The reference's whole identity is PITR: restore a table to an earlier
point, then replay CDC forward (`cdk/lib/cdk-stack.ts:119`
`eventName: ["RestoreTableToPointInTime"]`; README restore flow). On
DynamoDB that restore is a managed service call; on a 100 TB lakehouse
the equivalent is a VERSIONED table: every merge commit produces a new
snapshot version, any retained version is readable ("restore" =
reading it — zero data movement), and old versions expire explicitly.

Layout (Iceberg-style manifests, radically simplified):

    <path>/data/v<N>/bucket=<b>/part-*.parquet   files WRITTEN by commit N
    <path>/manifests/v<N>.json                   {bucket -> owning commit}
    <path>/LATEST                                current version pointer

Copy-on-write at BUCKET granularity: commit N rewrites only the
buckets its batch touches; every untouched bucket is inherited by
pointing the new manifest at the file the previous commit (or any
earlier one) already wrote. Reading version V lists V's manifest and
reads exactly the named bucket directories — manifest-level partition
pruning, no directory walk, no filter on a partition column.

Commit protocol (single-writer, crash-safe): data files first, then
the manifest, then an atomic `os.replace` of the LATEST pointer. A
crash before the pointer flip leaves orphan files that the next
`expire_versions` sweep removes; readers never see a half commit.

Scale: a commit costs O(touched buckets) writes + one manifest (a few
KB for thousands of buckets — at millions, manifests shard, which is
where real Iceberg picks up). Time travel costs nothing at write time;
retention is a policy knob (`expire_versions(keep_last=...)`), the
35-day PITR window's analog.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import cdc_merge_tombstone, visible

N_BUCKETS_DEFAULT = 32


class VersionedCdcSink:
    """Bucket-partitioned CDC merge target with commit-level time travel."""

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = N_BUCKETS_DEFAULT):
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets
        self._schema = None  # remembered for empty-table reads
        os.makedirs(os.path.join(path, "manifests"), exist_ok=True)

    # -- pointer + manifest plumbing ------------------------------------

    def _latest_path(self) -> str:
        return os.path.join(self.path, "LATEST")

    def latest_version(self) -> int:
        try:
            with open(self._latest_path()) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return 0

    def _manifest(self, version: int) -> dict[int, int]:
        with open(os.path.join(self.path, "manifests", f"v{version}.json")) as fh:
            raw = json.load(fh)
        return {int(b): int(v) for b, v in raw["buckets"].items()}

    def _commit(self, version: int, buckets: dict[int, int]) -> None:
        mpath = os.path.join(self.path, "manifests", f"v{version}.json")
        with open(mpath, "w") as fh:
            json.dump({"version": version, "buckets": {str(b): v for b, v in buckets.items()}}, fh)
        # the pointer flip is the commit: readers either see the old
        # LATEST or the new one, never a torn state
        tmp = self._latest_path() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._latest_path())

    def _bucket_dir(self, version: int, bucket: int) -> str:
        return os.path.join(self.path, "data", f"v{version}", f"bucket={bucket}")

    def _bucket(self, key_col) -> F.Column:
        return F.pmod(F.hash(key_col), F.lit(self.n_buckets))

    # -- writes ---------------------------------------------------------

    def _write_buckets(self, df: DataFrame, version: int, key: str) -> list[int]:
        """Write df (tombstoned rows) into per-bucket dirs under v<version>;
        returns the bucket ids actually written."""
        bucketed = df.withColumn("bucket", self._bucket(F.col(key)))
        self._schema = df.schema
        out = os.path.join(self.path, "data", f"v{version}")
        # one file per bucket: repartition on the partition column so the
        # write doesn't scatter slivers of every bucket across every task
        (
            bucketed.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(out)
        )
        return [
            int(d.split("=")[1])
            for d in os.listdir(out)
            if d.startswith("bucket=")
        ]

    def init(self, snapshot: DataFrame, key: str = "key") -> None:
        """Commit v1: the restored base snapshot, all buckets owned by v1."""
        snap = snapshot
        if "op" not in snap.columns:
            snap = snap.withColumn("op", F.lit("INSERT"))
        written = self._write_buckets(snap, 1, key)
        self._commit(1, {b: 1 for b in written})

    def apply_batch(self, batch: DataFrame, key: str = "key") -> None:
        """Merge one micro-batch as commit N+1, rewriting ONLY touched
        buckets; every other bucket is inherited by manifest reference."""
        batch = batch.withColumn("bucket", self._bucket(F.col(key)))
        touched = sorted(r.bucket for r in batch.select("bucket").distinct().collect())
        if not touched:
            return
        cur_version = self.latest_version()
        manifest = self._manifest(cur_version) if cur_version else {}
        current = self._read_buckets(manifest, only=touched)
        merged = cdc_merge_tombstone(current, batch.drop("bucket"), key=key)
        new_version = cur_version + 1
        written = self._write_buckets(merged, new_version, key)
        new_manifest = dict(manifest)
        # a touched bucket whose merge came out empty simply drops out of
        # the manifest (the file-less analog of deleting the partition)
        for b in touched:
            new_manifest.pop(b, None)
        for b in written:
            new_manifest[b] = new_version
        self._commit(new_version, new_manifest)

    # -- reads ----------------------------------------------------------

    def _read_buckets(self, manifest: dict[int, int], only: list[int] | None = None) -> DataFrame:
        paths = [
            self._bucket_dir(v, b)
            for b, v in sorted(manifest.items())
            if only is None or b in only
        ]
        if not paths:
            if self._schema is None:
                raise ValueError("empty sink with no remembered schema")
            return self.spark.createDataFrame([], schema=self._schema)
        # manifest-level pruning: ONLY the named bucket dirs are listed —
        # the bucket id is derivable from key, so no partition column is
        # needed on the way back in
        return self.spark.read.parquet(*paths)

    def snapshot(self, version: int | None = None) -> DataFrame:
        """Tombstoned state at a commit (default: latest). Time travel is
        just reading an older manifest."""
        v = self.latest_version() if version is None else version
        return self._read_buckets(self._manifest(v))

    def visible(self, version: int | None = None) -> DataFrame:
        return visible(self.snapshot(version))

    # -- retention ------------------------------------------------------

    def expire_versions(self, keep_last: int) -> list[int]:
        """Drop manifests older than the retention window and delete data
        dirs no retained manifest references (the PITR-window analog).
        Returns the expired version ids."""
        latest = self.latest_version()
        retained = [v for v in range(max(1, latest - keep_last + 1), latest + 1)]
        referenced: set[tuple[int, int]] = set()
        for v in retained:
            referenced |= {(ver, b) for b, ver in self._manifest(v).items()}
        expired = []
        data_root = os.path.join(self.path, "data")
        for d in sorted(os.listdir(data_root)):
            ver = int(d.lstrip("v"))
            if ver in retained:
                continue
            vdir = os.path.join(data_root, d)
            for bd in list(os.listdir(vdir)):
                if bd.startswith("bucket=") and (ver, int(bd.split("=")[1])) not in referenced:
                    shutil.rmtree(os.path.join(vdir, bd), ignore_errors=True)
            # a version dir may stay alive holding files inherited by
            # retained manifests; remove it only when fully orphaned
            if not any(x.startswith("bucket=") for x in os.listdir(vdir)):
                shutil.rmtree(vdir, ignore_errors=True)
            expired.append(ver)
        for v in expired:
            m = os.path.join(self.path, "manifests", f"v{v}.json")
            if os.path.exists(m):
                os.remove(m)
        return expired


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------

import atexit  # noqa: E402
import tempfile  # noqa: E402
import uuid  # noqa: E402

from ..operators.cdc import changelog, fold_changelog, with_changelog  # noqa: E402
from ..registry import register, tracked_persist  # noqa: E402

# One 3-commit sink per (session, corpus), shared by the time-travel /
# changefeed / incremental-agg queries — the dedup.py band-artifact
# pattern: in production the versioned table EXISTS; per-query rebuilds
# are a fixture cost, so the replay (init + 2 commits at the 1/3 and
# 2/3 seq cutoffs) runs once per session and every consumer reads the
# same commit history.
_SINK_ARTIFACT: dict[tuple[str, str], tuple] = {}
_SINK_ROOT = os.path.join(tempfile.gettempdir(), "spark_cdc_engine_vsink")
atexit.register(shutil.rmtree, _SINK_ROOT, ignore_errors=True)


def shared_sink(spark: SparkSession, sf_dir: str):
    """(sink, c1, c2): the session-shared 3-commit replay of sf_dir's
    changelog — v1 = fold(seq ≤ c1), v2 = +batch(c1, c2], v3 = +rest."""
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    hit = _SINK_ARTIFACT.get(key)
    if hit is not None and os.path.isdir(hit[0].path):
        return hit
    cl = changelog(spark, sf_dir).select("seq_no", "op", "key", "payload_value")
    max_seq = cl.agg(F.max("seq_no")).first()[0]  # driver scalar: orchestration
    c1, c2 = max_seq // 3, (2 * max_seq) // 3
    sink = VersionedCdcSink(
        spark, os.path.join(_SINK_ROOT, f"sink-{uuid.uuid4().hex[:8]}")
    )
    sink.init(fold_changelog(cl.where(F.col("seq_no") <= c1)))
    sink.apply_batch(cl.where((F.col("seq_no") > c1) & (F.col("seq_no") <= c2)))
    sink.apply_batch(cl.where(F.col("seq_no") > c2))
    _SINK_ARTIFACT[key] = (sink, c1, c2)
    return _SINK_ARTIFACT[key]


@register(
    "q_cdc_time_travel",
    oracle=with_changelog(
        """
SELECT key, seq_no AS last_seq, payload_value
FROM (
    SELECT key, seq_no, op, payload_value,
           row_number() OVER (PARTITION BY key ORDER BY seq_no DESC) AS rn
    FROM changelog
    WHERE seq_no <= (SELECT (2 * max(seq_no)) // 3 FROM changelog)
) WHERE rn = 1 AND op <> 'REMOVE'
"""
    ),
)
def q_cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time restore as a table read: replay the changelog into
    the versioned sink (restore base = first third, then two CDC
    commits), expire down to the retention window, and read the table
    AS OF the middle commit — which must equal the fold of the
    changelog prefix up to that commit's high-water seq (the oracle).

    The expire runs BEFORE the time-travel read on purpose: v1 leaves
    the retention window but its untouched-bucket files are still
    referenced by the v2 manifest, so copy-on-write inheritance — not
    file survival by luck — is what the oracle match proves.

    Reference twin: RestoreTableToPointInTime + forward CDC replay
    (`cdk/lib/cdk-stack.ts:119`, README restore flow); here restore =
    reading a retained commit, no data movement."""
    sink, _, _ = shared_sink(spark, sf_dir)
    sink.expire_versions(keep_last=2)  # v1 ages out; its files live on via v2
    return sink.visible(version=2).select("key", "last_seq", "payload_value")


@register(
    "q_stream_versioned_sink",
    oracle=with_changelog(
        """
SELECT key, seq_no AS last_seq, payload_value
FROM (
    SELECT key, seq_no, op, payload_value,
           row_number() OVER (PARTITION BY key ORDER BY seq_no DESC) AS rn
    FROM changelog
    WHERE seq_no <= (SELECT (7 * max(seq_no)) // 9 FROM changelog)
) WHERE rn = 1 AND op <> 'REMOVE'
"""
    ),
)
def q_stream_versioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned sink under a REAL stream: three pinned changelog
    splits drain through writeStream.foreachBatch → one COW commit per
    micro-batch (maxFilesPerTrigger=1, availableNow), then the table is
    read AS OF the commit two batches in — time travel against live
    streaming history. Every commit is a version, so 'what did the
    table look like N batches ago' needs no extra bookkeeping; the
    oracle is the changelog-prefix fold at that commit's high-water
    seq."""
    import tempfile
    import uuid

    from .cdc_stream import CHANGELOG_STREAM_SCHEMA

    cl = changelog(spark, sf_dir)
    max_seq = cl.agg(F.max("seq_no")).first()[0]  # driver scalar: orchestration
    q1, q2, q3 = max_seq // 3, (5 * max_seq) // 9, (7 * max_seq) // 9

    root = os.path.join(
        tempfile.gettempdir(), "spark_cdc_engine_stream", f"vsink-{uuid.uuid4().hex[:8]}"
    )
    src, work, ckpt = (os.path.join(root, d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src, exist_ok=True)

    from .stream_queries import _write_split_files  # pinned mtime-ordered splits

    s = F.col("seq_no")
    _write_split_files(
        cl.where(s > q1),
        [s <= q2, (s > q2) & (s <= q3), s > q3],
        src,
    )

    sink = VersionedCdcSink(spark, work, n_buckets=16)
    sink.init(fold_changelog(cl.where(s <= q1)))

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        sink.spark = batch_df.sparkSession  # merge reads run on the batch session
        sink.apply_batch(batch_df.select("seq_no", "op", "key", "payload_value"))

    try:
        q = (
            spark.readStream.schema(CHANGELOG_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(commit_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        sink.spark = spark
        assert sink.latest_version() == 4, sink.latest_version()  # init + 3 commits
        result = tracked_persist(
            sink.visible(version=3).select("key", "last_seq", "payload_value")
        )
        result.count()  # materialize before the working dir is removed
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return result


def _changes_between(sink: VersionedCdcSink, v_from: int, v_to: int) -> DataFrame:
    """Change data feed between two commits, pruned at the MANIFEST
    level: a bucket whose owning commit is identical in both manifests
    points at the same immutable files — provably unchanged, never
    read. Only differing buckets are scanned from each side, then a
    per-key full-outer diff classifies INSERT / UPDATE / DELETE (on
    visible rows; tombstone-to-tombstone is no change).

    At 100 TB this is the operation that makes downstream incremental
    consumers possible: the diff cost scales with what CHANGED (touched
    buckets since v_from), not with the table."""
    m_from, m_to = sink._manifest(v_from), sink._manifest(v_to)
    changed = sorted(
        set(m_from) ^ set(m_to)
        | {b for b in set(m_from) & set(m_to) if m_from[b] != m_to[b]}
    )
    a = visible(sink._read_buckets(m_from, only=changed)).alias("a")
    b = visible(sink._read_buckets(m_to, only=changed)).alias("b")
    j = a.join(b, on="key", how="full_outer")
    return (
        j.select(
            F.col("key"),
            F.when(F.col("a.last_seq").isNull(), F.lit("INSERT"))
            .when(F.col("b.last_seq").isNull(), F.lit("DELETE"))
            .otherwise(F.lit("UPDATE"))
            .alias("change_type"),
            F.coalesce(F.col("b.last_seq"), F.col("a.last_seq")).alias("last_seq"),
            F.col("b.payload_value").alias("payload_value"),  # NULL for DELETE
            # pre-image: what the row was at v_from (NULL for INSERT) —
            # exactly what an incremental consumer needs to retract
            F.col("a.payload_value").alias("payload_value_old"),
        )
        # an unchanged key living in a changed bucket is not a change
        .where(
            F.col("a.last_seq").isNull()
            | F.col("b.last_seq").isNull()
            | (F.col("a.last_seq") != F.col("b.last_seq"))
        )
    )


@register(
    "q_cdc_changefeed",
    oracle=with_changelog(
        """
, a AS (
    SELECT key, seq_no AS last_seq, payload_value
    FROM (
        SELECT key, seq_no, op, payload_value,
               row_number() OVER (PARTITION BY key ORDER BY seq_no DESC) AS rn
        FROM changelog
        WHERE seq_no <= (SELECT (2 * max(seq_no)) // 3 FROM changelog)
    ) WHERE rn = 1 AND op <> 'REMOVE'
),
b AS (
    SELECT key, seq_no AS last_seq, payload_value
    FROM (
        SELECT key, seq_no, op, payload_value,
               row_number() OVER (PARTITION BY key ORDER BY seq_no DESC) AS rn
        FROM changelog
    ) WHERE rn = 1 AND op <> 'REMOVE'
)
SELECT COALESCE(a.key, b.key) AS key,
       CASE WHEN a.key IS NULL THEN 'INSERT'
            WHEN b.key IS NULL THEN 'DELETE'
            ELSE 'UPDATE' END AS change_type,
       COALESCE(b.last_seq, a.last_seq) AS last_seq,
       b.payload_value AS payload_value,
       a.payload_value AS payload_value_old
FROM a FULL JOIN b ON a.key = b.key
WHERE a.key IS NULL OR b.key IS NULL OR a.last_seq <> b.last_seq
"""
    ),
)
def q_cdc_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed over the versioned sink: replay the changelog
    into three commits, then ask 'what changed between the middle
    commit and now' — the incremental-consumer primitive (Delta CDF /
    Iceberg incremental-read twin). The engine prunes at the manifest
    level (identical owning commit ⇒ identical files ⇒ skipped), so
    the oracle equivalence proves the pruning loses nothing."""
    sink, _, _ = shared_sink(spark, sf_dir)
    return _changes_between(sink, 2, 3)


@register(
    "q_cdc_incremental_agg",
    oracle=with_changelog(
        """
SELECT key % 10 AS grp,
       count(*) AS n_keys,
       sum(CAST(round(payload_value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM (
    SELECT key, seq_no, op, payload_value,
           row_number() OVER (PARTITION BY key ORDER BY seq_no DESC) AS rn
    FROM changelog
) WHERE rn = 1 AND op <> 'REMOVE'
GROUP BY 1
"""
    ),
)
def q_cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance off the change data feed: a grouped
    aggregate (count + exact cent-sum per key%10) is maintained by
    applying the v2→v3 changefeed's retractions and additions to the
    aggregate AT v2 — never re-scanning the table — and must equal the
    direct aggregate over the final state (the oracle).

    The delta math is the standard retract/accumulate pair: DELETE
    retracts the pre-image, INSERT accumulates the post-image, UPDATE
    does both. Exact integer cents make retraction lossless (float
    sums would drift under retraction — the reason streaming engines
    keep aggregates in exact or decimal form). At 100 TB the
    maintenance cost is O(changefeed), not O(table): this query is WHY
    the sink keeps versions."""
    sink, _, _ = shared_sink(spark, sf_dir)
    grp = (F.col("key") % 10).alias("grp")
    cents_new = F.round(F.col("payload_value") * 100).cast("bigint")
    cents_old = F.round(F.col("payload_value_old") * 100).cast("bigint")

    base = (
        sink.visible(version=2)
        .groupBy(grp)
        .agg(
            F.count("*").alias("n_keys"),
            F.sum(cents_new).alias("sum_cents"),
        )
    )
    delta = (
        _changes_between(sink, 2, 3)
        .groupBy(grp)
        .agg(
            F.sum(
                F.when(F.col("change_type") == "INSERT", 1)
                .when(F.col("change_type") == "DELETE", -1)
                .otherwise(0)
            ).alias("d_keys"),
            F.sum(
                F.coalesce(cents_new, F.lit(0)) - F.coalesce(cents_old, F.lit(0))
            ).alias("d_cents"),
        )
    )
    merged = (
        base.alias("s")
        .join(delta.alias("d"), on="grp", how="full_outer")
        .select(
            F.col("grp"),
            (
                F.coalesce(F.col("s.n_keys"), F.lit(0))
                + F.coalesce(F.col("d.d_keys"), F.lit(0))
            ).alias("n_keys"),
            (
                (
                    F.coalesce(F.col("s.sum_cents"), F.lit(0))
                    + F.coalesce(F.col("d.d_cents"), F.lit(0))
                )
                / 100.0
            ).alias("sum_value"),
        )
        .where(F.col("n_keys") > 0)
    )
    return merged

