"""Custom stateful streaming operator via applyInPandasWithState.

The escape hatch for stateful semantics the built-in operators
(windowed aggs, dropDuplicates, session_window) can't express — per-key
mutable state carried across micro-batches with explicit timeout
control. Here: a per-user running counter/accumulator, the minimal
shape of the reference's per-key bookkeeping generalized.

Scale notes (100 TB): state lives in the state store, sharded by the
group key across executors; each micro-batch touches only the groups
present in the batch. State size is O(live keys) × O(state row), and
eviction is explicit (GroupStateTimeout) — unbounded-state bugs are
impossible to write silently with this API.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.rounding import avg_div
from ..operators.cdc import changelog, with_changelog
from ..registry import register
from .cdc_stream import CHANGELOG_STREAM_SCHEMA
from .stream_queries import _fresh_dir, _write_split_files

OUTPUT_SCHEMA = "key long, n_events long, sum_value_c long, max_seq long"
STATE_SCHEMA = "n long, s long, m long"


def running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, cent-sum, max seq) per key across batches and
    emit the updated totals each time the key appears."""
    if state.exists:
        n, s, m = state.get
    else:
        n, s, m = 0, 0, -1
    for pdf in pdfs:
        n += len(pdf)
        s += int(pdf["payload_value"].mul(100).round().astype("int64").sum())
        m = max(m, int(pdf["seq_no"].max()))
    state.update((n, s, m))
    yield pd.DataFrame(
        {"key": [key[0]], "n_events": [n], "sum_value_c": [s], "max_seq": [m]}
    )


@register(
    "q_stream_stateful_totals",
    oracle=with_changelog(
        """
SELECT key,
       count(*) AS n_events,
       ((2 * sum(CAST(round(payload_value * 100) AS BIGINT)) + count(*))
        // (2 * count(*))) / 100.0 AS avg_value,
       max(seq_no) AS max_seq
FROM changelog
GROUP BY key
"""
    ),
)
def q_stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful op over a real 3-batch stream: per-key state
    (count, cent-sum, max seq) carried across micro-batches with
    applyInPandasWithState; each batch emits the running totals and the
    LAST emission per key must equal the batch aggregate — which is the
    oracle. Proves cross-batch state continuity, not just windowing."""
    cl = changelog(spark, sf_dir)
    src, ck = _fresh_dir("st-src"), _fresh_dir("st-ck")
    s = F.col("seq_no")
    row = cl.agg(
        F.expr("percentile(seq_no, 0.3333)").alias("p1"),
        F.expr("percentile(seq_no, 0.6667)").alias("p2"),
    ).first()
    _write_split_files(cl, [s < row.p1, (s >= row.p1) & (s < row.p2), s >= row.p2], src)

    stream = (
        spark.readStream.schema(CHANGELOG_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    updates = stream.groupBy("key").applyInPandasWithState(
        running_totals,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    name = f"st_out_{uuid.uuid4().hex[:8]}"
    # the state-shuffle width is fixed at query start from
    # spark.sql.shuffle.partitions; each partition is a state-store
    # instance checkpointed EVERY micro-batch, so a small keyed stream
    # wants few wide-enough stores, not cores-many (cuts ~2/3 of this
    # query's wall time at test SF). At 100 TB this is the knob sized
    # to key cardinality / executor count, not left at the default.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        q = (
            updates.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # final state per key = the emission with the highest running count
    out = spark.table(name)
    from pyspark.sql import Window as W

    w = W.partitionBy("key").orderBy(F.col("n_events").desc())
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "key",
            "n_events",
            avg_div("sum_value_c", "n_events").alias("avg_value"),
            "max_seq",
        )
        .cache()
    )
    final.count()
    return final
