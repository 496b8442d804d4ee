"""Streaming behaviors (SURVEY.md §5.2 item 4).

The oracle-parity suite already checks streaming outputs against SQL;
these tests pin the cross-shape equivalences and determinism that SQL
can't express."""

import pandas as pd
from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.registry import all_queries
from dynamodb_pitr_restore_cdc_spark.streaming.cdc_stream import split_dlq

SPECS = all_queries()


def _norm(df):
    pdf = df.toPandas()
    return pdf.sort_values(list(sorted(pdf.columns))).reset_index(drop=True)


def test_streaming_cdc_equals_batch_rebuild(spark, sf_dir):
    """q_stream_foreachbatch_cdc ≡ q_cdc_snapshot_rebuild (SURVEY §2B):
    micro-batched apply and one-shot batch apply reach the same state."""
    stream_res = _norm(SPECS["q_stream_foreachbatch_cdc"].builder(spark, sf_dir))
    batch_res = _norm(SPECS["q_cdc_snapshot_rebuild"].builder(spark, sf_dir))
    pd.testing.assert_frame_equal(stream_res, batch_res)


def test_watermark_late_is_deterministic(spark, sf_dir):
    """Two full runs of the 3-batch watermark stream produce identical
    finalized windows (pinned batch decomposition => pinned watermark
    trajectory)."""
    r1 = _norm(SPECS["q_stream_watermark_late"].builder(spark, sf_dir))
    r2 = _norm(SPECS["q_stream_watermark_late"].builder(spark, sf_dir))
    pd.testing.assert_frame_equal(r1, r2)
    assert len(r1) > 0


def test_watermark_drops_late_rows(spark, sf_dir):
    """The watermark run must emit FEWER total events than the input:
    batch 3's stale replays are dropped, and unfinalized tail windows
    are withheld in append mode."""
    emitted = (
        SPECS["q_stream_watermark_late"].builder(spark, sf_dir)
        .agg(F.sum("n_events")).first()[0]
    )
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert emitted is not None and 0 < emitted < total


def test_dlq_split_routes_malformed(spark):
    rows = [
        (1, "INSERT", 10, None, 1.0, "{}", "h1"),   # ok
        (None, "MODIFY", 11, None, 2.0, "{}", "h2"),  # bad: null seq
        (3, None, 12, None, 3.0, "{}", "h3"),       # bad: null op
        (4, "REMOVE", None, None, None, None, "h4"),  # bad: null key
    ]
    df = spark.createDataFrame(
        rows,
        schema="seq_no long, op string, key long, ts timestamp, "
        "payload_value double, payload_props string, content_hash string",
    )
    ok, dlq = split_dlq(df)
    assert ok.count() == 1 and dlq.count() == 3
    assert [r.content_hash for r in ok.collect()] == ["h1"]


def test_kafka_branch_parses_broker_records_without_a_broker(spark, tmp_path):
    """A1 production-shape contract: drive read_changelog_stream's
    Kafka branch through the raw_stream_factory seam with a fake
    carrying the broker record shape (binary value + metadata cols).
    The JSON bodies must round-trip into the typed changelog schema,
    and a malformed body must surface as an all-NULL row that
    split_dlq routes to the dead-letter stream — so the only
    Kafka-branch logic that can be wrong executes in CI even though
    no broker exists in this environment."""
    import json

    from pyspark.sql import types as T

    from dynamodb_pitr_restore_cdc_spark.streaming.cdc_stream import (
        CHANGELOG_STREAM_SCHEMA,
        read_changelog_stream,
    )

    records = [
        {"seq_no": 1, "op": "INSERT", "key": 11, "ts": "2024-01-01T00:00:01.000Z",
         "payload_value": 1.5, "payload_props": '{"a":1}', "content_hash": "h1"},
        {"seq_no": 2, "op": "MODIFY", "key": 11, "ts": "2024-01-01T00:00:02.000Z",
         "payload_value": 2.5, "payload_props": '{"a":2}', "content_hash": "h2"},
        {"seq_no": 3, "op": "REMOVE", "key": 12, "ts": "2024-01-01T00:00:03.000Z",
         "payload_value": None, "payload_props": None, "content_hash": "h3"},
    ]
    bodies = [json.dumps(r).encode() for r in records] + [b"{not json"]

    raw_schema = T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("timestamp", T.TimestampType()),
        ]
    )
    src = str(tmp_path / "broker")
    spark.createDataFrame(
        [(str(i).encode(), v, "changelog", 0, i, None) for i, v in enumerate(bodies)],
        schema=raw_schema,
    ).write.parquet(src)

    def fake_broker(sess):
        return sess.readStream.schema(raw_schema).parquet(src)

    stream = read_changelog_stream(
        spark, "broker:9092/changelog", source="kafka", raw_stream_factory=fake_broker
    )
    assert stream.isStreaming
    assert stream.schema == CHANGELOG_STREAM_SCHEMA
    ok, dlq = split_dlq(stream)

    got = {}

    def sink(batch_df, epoch_id):
        got.setdefault("ok", []).extend(batch_df.collect())

    bad = {}

    def dead(batch_df, epoch_id):
        bad.setdefault("dlq", []).extend(batch_df.collect())

    for df, fn, name in ((ok, sink, "ok"), (dlq, dead, "dlq")):
        q = (
            df.writeStream.foreachBatch(fn)
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    rows = sorted(got["ok"], key=lambda r: r.seq_no)
    assert [(r.seq_no, r.op, r.key, r.payload_value, r.payload_props, r.content_hash)
            for r in rows] == [
        (1, "INSERT", 11, 1.5, '{"a":1}', "h1"),
        (2, "MODIFY", 11, 2.5, '{"a":2}', "h2"),
        (3, "REMOVE", 12, None, None, "h3"),
    ]
    assert [r.ts.isoformat()[:19] for r in rows] == [
        "2024-01-01T00:00:01", "2024-01-01T00:00:02", "2024-01-01T00:00:03"
    ]
    assert len(bad["dlq"]) == 1 and bad["dlq"][0].seq_no is None


def test_kafka_branch_without_factory_is_the_documented_stub(spark):
    # no broker package on this classpath: constructing the real Kafka
    # source must fail fast (the documented stub boundary), not return
    # a half-usable plan
    import pytest as _pytest

    from dynamodb_pitr_restore_cdc_spark.streaming.cdc_stream import (
        read_changelog_stream,
    )

    with _pytest.raises(Exception):
        read_changelog_stream(spark, "broker:9092/changelog", source="kafka")


def test_stream_anomaly_is_deterministic_and_prequential(spark, sf_dir):
    """Two full replays must emit identical flag sets (pinned splits +
    ordered prequential fold), and no event may be flagged before its
    user has ANOMALY_MIN_PRIOR earlier events."""
    from dynamodb_pitr_restore_cdc_spark.sources import table as _table
    from dynamodb_pitr_restore_cdc_spark.streaming.stateful import (
        ANOMALY_MIN_PRIOR,
        q_stream_anomaly,
    )

    a = sorted(map(tuple, q_stream_anomaly(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_stream_anomaly(spark, sf_dir).collect()))
    assert a == b and len(a) > 0
    ev = (
        _table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["rank"] = ev.groupby("user_id").cumcount()
    rank = ev.set_index("event_id")["rank"]
    for row in a:
        assert rank[row[0]] >= ANOMALY_MIN_PRIOR


def test_stateful_ops_survive_multi_chunk_group_delivery(spark, sf_dir):
    """The Arrow iterator hands a group to the UDF as ≤maxRecordsPerBatch
    chunks in arbitrary order; order-sensitive stateful ops must
    concatenate before sorting. Force tiny chunks and require results
    identical to the default-chunking run."""
    from dynamodb_pitr_restore_cdc_spark.streaming.stateful import (
        q_stream_anomaly,
        q_stream_stateful_sessions,
    )

    base_a = sorted(map(tuple, q_stream_anomaly(spark, sf_dir).collect()))
    base_s = sorted(
        map(tuple, q_stream_stateful_sessions(spark, sf_dir).collect())
    )
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        tiny_a = sorted(map(tuple, q_stream_anomaly(spark, sf_dir).collect()))
        tiny_s = sorted(
            map(tuple, q_stream_stateful_sessions(spark, sf_dir).collect())
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert tiny_a == base_a
    assert tiny_s == base_s
