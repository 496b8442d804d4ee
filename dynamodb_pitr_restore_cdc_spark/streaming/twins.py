"""Batch/stream parity twins for the behavioral operators.

`q_stream_foreachbatch_cdc` ≡ `q_cdc_snapshot_rebuild` established the
pattern: a REAL multi-batch streaming run registered with the SAME
oracle as its batch twin, so the driver hash-verifies that the
incremental formulation converges to the batch answer. This module
closes the remaining pair (SURVEY §2B behavioral family; reference
analog: the changelog consumers of `README.md`'s restore flow are
exactly such incremental downstream jobs):

- q_stream_sessionize ≡ q_ts_sessionize — incremental gap-based
  sessionization via foreachBatch. State = the SESSION-GRAIN summary
  table (user, start, end, n, value), not raw events: each micro-batch
  is sessionized in isolation (window pass over the batch), then
  merged with the store's intervals by a gaps-and-islands pass AT
  SESSION GRAIN — per batch that is O(batch) + O(sessions touched),
  and the store never holds more than one row per final session. At
  100 TB the merge would be restricted to users present in the batch
  (stream-static join pruning); the interval-merge algebra is the same.

- q_stream_anomaly_zscore ≡ q_ts_anomaly_zscore — the population
  z-score needs FINAL per-user moments, so the streaming half
  maintains exact integer sufficient statistics (n, Σv, Σv²) as
  streaming aggregation state (complete mode over 3 pinned batches);
  the flagging pass then broadcast-joins the final statistics against
  the event log. This is the two-phase shape any "flag against global
  stats" pipeline has at scale — the stats stream keeps O(users)
  state, and flagging is a map-side join.

Both queries use the pinned file-split machinery of stream_queries
(mtime-ordered splits, maxFilesPerTrigger=1) so batch boundaries are
deterministic; both restore spark.sql.shuffle.partitions / temp dirs
in a finally, per the streaming invariants.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.behavior import (
    ANOMALY_ZSCORE_ORACLE,
    SESSIONIZE_ORACLE,
    SESSION_GAP_US,
    Z_THRESHOLD,
    _Z_EXPR,
)
from ..registry import register, tracked_persist
from ..sources import table
from .stream_queries import _fresh_dir, _ts_tertiles, _write_split_files


def _sessionize_events(batch: DataFrame) -> DataFrame:
    """Events → session-grain summaries (one window pass + rollup, the
    same (us, event_id)-total-ordered logic as the batch twin)."""
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    bounded = batch.withColumn(
        "new_s",
        F.when(F.lag("us").over(w).isNull(), 1)
        .when(F.col("us") - F.lag("us").over(w) > SESSION_GAP_US, 1)
        .otherwise(0),
    ).withColumn(
        "grp", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    return bounded.groupBy("user_id", "grp").agg(
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        F.count("*").alias("n_events"),
        F.sum("value_c").alias("value_c"),
    ).drop("grp")


def _merge_session_intervals(sessions: DataFrame) -> DataFrame:
    """Gaps-and-islands at SESSION grain: adjacent intervals closer than
    the gap collapse (counts/sums are additive, bounds are min/max).
    Associative, so incremental per-batch application converges to the
    batch answer regardless of how events were split."""
    w = W.partitionBy("user_id").orderBy("start_us", "end_us")
    run_end = F.max("end_us").over(w.rowsBetween(W.unboundedPreceding, -1))
    marked = sessions.withColumn(
        "new_s",
        F.when(run_end.isNull() | (F.col("start_us") - run_end > SESSION_GAP_US), 1)
        .otherwise(0),
    ).withColumn(
        "grp", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    return marked.groupBy("user_id", "grp").agg(
        F.min("start_us").alias("start_us"),
        F.max("end_us").alias("end_us"),
        F.sum("n_events").alias("n_events"),
        F.sum("value_c").alias("value_c"),
    ).drop("grp")


@register("q_stream_sessionize", oracle=SESSIONIZE_ORACLE)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-stream twin of q_ts_sessionize (same oracle — the hash match
    IS the batch/stream parity proof): the event log replays as 3
    time-ordered micro-batches; foreachBatch sessionizes each batch and
    folds it into a versioned session store by interval merge. The
    final store, with ordinals assigned per user, equals the one-shot
    batch sessionization."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("bigint").alias("value_c"),
    )
    p1, p2 = _ts_tertiles(table(spark, sf_dir, "events"), "ts")
    us = F.col("us")
    src, work = _fresh_dir("sess-src"), _fresh_dir("sess-work")
    _write_split_files(e, [us <= p1, (us > p1) & (us <= p2), us > p2], src)

    # v_init: empty session store with a pinned schema (an empty
    # non-partitioned parquet write preserves its schema)
    empty = _sessionize_events(e.where(F.lit(False)))
    init_path = os.path.join(work, "v_init")
    empty.write.mode("overwrite").parquet(init_path)
    state = {"path": init_path}

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        new_path = os.path.join(work, f"v{epoch_id}")
        if new_path == state["path"]:  # replayed epoch (see run_cdc_apply)
            return
        sess = batch_df.sparkSession
        store = sess.read.parquet(state["path"])
        merged = _merge_session_intervals(
            store.unionByName(_sessionize_events(batch_df))
        )
        merged.write.mode("overwrite").parquet(new_path)
        state["path"] = new_path

    stream = spark.readStream.schema(
        "user_id long, event_id long, us long, value_c long"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", os.path.join(work, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    final = spark.read.parquet(state["path"])
    ordinal = W.partitionBy("user_id").orderBy("start_us")
    result = tracked_persist(
        final.select(
            "user_id",
            F.row_number().over(ordinal).cast("bigint").alias("session_id"),
            "start_us",
            "end_us",
            "n_events",
            (F.col("value_c") / 100.0).alias("session_value"),
        )
    )
    result.count()  # materialize before removing the backing store
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)
    return result


@register("q_stream_anomaly_zscore", oracle=ANOMALY_ZSCORE_ORACLE)
def q_stream_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-stream twin of q_ts_anomaly_zscore (same oracle): per-user
    exact integer moments (n, Σv, Σv²) accumulate as streaming
    aggregation state over 3 pinned micro-batches (complete mode —
    unbounded keyed aggregate, O(users) state); the final statistics
    snapshot then broadcast-joins the event log to flag |z| > 2.5.
    Contrast with q_stream_anomaly (stateful.py), which scores
    PREQUENTIALLY — against the stats as of each event's arrival; this
    twin answers the retrospective question and must therefore equal
    the batch pass bit-for-bit."""
    e = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    p1, p2 = _ts_tertiles(table(spark, sf_dir, "events"), "ts")
    tsu = F.unix_micros("ts")
    src, ck = _fresh_dir("zs-src"), _fresh_dir("zs-ck")
    _write_split_files(
        e.withColumn("us", tsu).drop("ts"),
        [F.col("us") <= p1, (F.col("us") > p1) & (F.col("us") <= p2), F.col("us") > p2],
        src,
    )

    stream = spark.readStream.schema(
        "event_id long, user_id long, v long, us long"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    stats_agg = stream.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.expr("v*v")).alias("s2"),
    )
    name = f"zs_stats_{uuid.uuid4().hex[:8]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")  # state width
        q = (
            stats_agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    stats = tracked_persist(spark.table(name))
    stats.count()  # snapshot the memory sink before the temp dirs go
    flagged = (
        e.join(F.broadcast(stats), "user_id")
        .withColumn("zscore", F.expr(_Z_EXPR))
        .where(F.abs(F.col("zscore")) > Z_THRESHOLD)
    )
    result = tracked_persist(
        flagged.select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            (F.col("v") / 100.0).alias("value"),
            "zscore",
        )
    )
    result.count()
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)
    return result
