"""Add-column schema evolution through the table-format seam.

The reference's payload is schemaless (`lambda-backfill/main.py:35-39`
passes NewImage opaquely), so writers can grow attributes mid-stream
and a restored table must carry the drift. Round 9 proved this only on
plain parquet (q_cdc_schema_evolution, mergeSchema); these tests pin
the same contract through BOTH log formats' commit protocols: the
widened schema is published in the same commit that carries the data
(Delta: a new metaData action; Iceberg: a new schema-id in the
metadata file's schema history), old files null-fill on read, narrow
batches after the evolution still merge, and time travel below the
evolution point shows the old width.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.streaming.delta_log_sink import DeltaLogSink
from dynamodb_pitr_restore_cdc_spark.streaming.iceberg_log_sink import IcebergLogSink

FACTORIES = {
    "delta": lambda spark, path: DeltaLogSink(spark, path, n_buckets=4),
    "iceberg": lambda spark, path: IcebergLogSink(spark, path, n_buckets=4),
}


def _snapshot(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "last_seq", "payload_value"]),
        schema="key long, last_seq long, payload_value double",
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "seq_no", "op", "payload_value"]),
        schema="key long, seq_no long, op string, payload_value double",
    )


def _wide_batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["key", "seq_no", "op", "payload_value", "payload_note"]
        ),
        schema=(
            "key long, seq_no long, op string, payload_value double, "
            "payload_note string"
        ),
    )


def _by_key(df):
    return {
        r.key: (r.last_seq, r.payload_value, r.payload_note) for r in df.collect()
    }


@pytest.fixture(params=sorted(FACTORIES))
def sink(request, spark, tmp_path):
    s = FACTORIES[request.param](spark, str(tmp_path / "tbl"))
    s.init(_snapshot(spark, [(1, 0, 1.0), (2, 0, 2.0), (3, 0, 3.0)]))
    return s


def test_merge_evolves_and_nullfills(sink, spark):
    sink.apply_batch(_wide_batch(spark, [(2, 10, "MODIFY", 2.5, "n2")]))
    got = _by_key(sink.visible())
    assert got == {1: (0, 1.0, None), 2: (10, 2.5, "n2"), 3: (0, 3.0, None)}


def test_narrow_batch_after_evolution_merges(sink, spark):
    sink.apply_batch(_wide_batch(spark, [(2, 10, "MODIFY", 2.5, "n2")]))
    # full-image semantics: the winning NARROW image replaces the row,
    # so its missing attribute reads back null
    sink.apply_batch(_batch(spark, [(2, 11, "MODIFY", 2.6), (3, 11, "REMOVE", None)]))
    got = _by_key(sink.visible())
    assert got == {1: (0, 1.0, None), 2: (11, 2.6, None)}


def test_time_travel_below_evolution_shows_old_width(sink, spark):
    sink.apply_batch(_batch(spark, [(1, 5, "MODIFY", 1.5)]))  # v2, old width
    sink.apply_batch(_wide_batch(spark, [(2, 10, "MODIFY", 2.5, "n2")]))  # v3
    assert "payload_note" not in sink.snapshot(2).columns
    assert "payload_note" in sink.snapshot(3).columns
    assert "payload_note" in sink.snapshot().columns


def test_append_lane_evolves_and_folds(sink, spark):
    # the merge-on-read WRITE carries the evolution too: the pending
    # file has the new column, the base files null-fill at fold time
    sink.append(_wide_batch(spark, [(1, 10, "MODIFY", 1.5, "n1"),
                                    (2, 11, "REMOVE", None, None)]))
    got = _by_key(sink.visible())
    assert got == {1: (10, 1.5, "n1"), 3: (0, 3.0, None)}
    # compaction folds the pending files into wide base files and the
    # state is unchanged
    sink.compact_mor(set(range(4)))
    assert _by_key(sink.visible()) == got


def test_evolution_survives_retention(sink, spark):
    sink.apply_batch(_wide_batch(spark, [(2, 10, "MODIFY", 2.5, "n2")]))
    sink.apply_batch(_batch(spark, [(1, 11, "MODIFY", 1.1)]))
    sink.apply_batch(_batch(spark, [(3, 12, "MODIFY", 3.1)]))
    sink.expire_versions(keep_last=2, sweep_orphans=True, orphan_grace_s=0.0)
    got = _by_key(sink.visible())
    assert got == {1: (11, 1.1, None), 2: (10, 2.5, "n2"), 3: (12, 3.1, None)}


def test_type_conflict_is_an_error_not_an_evolution(sink, spark):
    bad = spark.createDataFrame(
        pd.DataFrame(
            [(2, 10, "MODIFY", "not-a-double")],
            columns=["key", "seq_no", "op", "payload_value"],
        ),
        schema="key long, seq_no long, op string, payload_value string",
    )
    with pytest.raises(ValueError, match="schema conflict"):
        sink.apply_batch(bad)
    with pytest.raises(ValueError, match="schema conflict"):
        sink.append(bad)


def test_changefeed_across_evolution_boundary(sink, spark):
    v0 = sink.latest_version()
    sink.apply_batch(_wide_batch(spark, [(2, 10, "MODIFY", 2.5, "n2")]))
    # the feed carries the evolved column (post-image AND pre-image): a
    # consumer mirroring the table through it must converge to
    # visible(), new columns included (round-10 review)
    feed = {
        r.key: (r.change_type, r.payload_value, r.payload_note,
                r.payload_value_old, r.payload_note_old)
        for r in sink.changes_between(v0, sink.latest_version()).collect()
    }
    assert feed == {2: ("UPDATE", 2.5, "n2", 2.0, None)}


def test_second_evolution_widens_again(sink, spark):
    sink.apply_batch(_wide_batch(spark, [(2, 10, "MODIFY", 2.5, "n2")]))
    wider = spark.createDataFrame(
        pd.DataFrame(
            [(3, 11, "MODIFY", 3.5, 7)],
            columns=["key", "seq_no", "op", "payload_value", "payload_rank"],
        ),
        schema=(
            "key long, seq_no long, op string, payload_value double, "
            "payload_rank long"
        ),
    )
    sink.apply_batch(wider)
    rows = {
        r.key: (r.payload_value, r.payload_note, r.payload_rank)
        for r in sink.visible().collect()
    }
    assert rows == {
        1: (1.0, None, None),
        2: (2.5, "n2", None),
        3: (3.5, None, 7),
    }
