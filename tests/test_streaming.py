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
