"""cdc_merge edge cases (SURVEY.md §5.2 item 2).

Covers the semantics the reference gets from FIFO delivery +
full-image puts (lambda-backfill/main.py:33-39) and the ones it gets
wrong (dropped UnprocessedItems -> we require idempotent replay)."""

import pandas as pd

from dynamodb_pitr_restore_cdc_spark.operators.cdc import cdc_merge, fold_changelog


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


def _result(df):
    return {
        r.key: (r.last_seq, r.payload_value)
        for r in df.collect()
    }


def test_insert_new_key(spark):
    snap = _snapshot(spark, [(1, 10, 1.0)])
    batch = _batch(spark, [(2, 11, "INSERT", 2.0)])
    assert _result(cdc_merge(snap, batch)) == {1: (10, 1.0), 2: (11, 2.0)}


def test_modify_overwrites_full_image(spark):
    snap = _snapshot(spark, [(1, 10, 1.0)])
    batch = _batch(spark, [(1, 11, "MODIFY", 9.0)])
    assert _result(cdc_merge(snap, batch)) == {1: (11, 9.0)}


def test_remove_deletes_key(spark):
    snap = _snapshot(spark, [(1, 10, 1.0), (2, 10, 2.0)])
    batch = _batch(spark, [(1, 11, "REMOVE", None)])
    assert _result(cdc_merge(snap, batch)) == {2: (10, 2.0)}


def test_remove_of_absent_key_is_noop(spark):
    snap = _snapshot(spark, [(1, 10, 1.0)])
    batch = _batch(spark, [(99, 11, "REMOVE", None)])
    assert _result(cdc_merge(snap, batch)) == {1: (10, 1.0)}


def test_delete_then_insert_same_key_one_batch(spark):
    # net effect = the later op (INSERT) — batch_write_item would reject
    # this batch outright; net-effect reduction is what makes it legal.
    snap = _snapshot(spark, [(1, 10, 1.0)])
    batch = _batch(spark, [(1, 11, "REMOVE", None), (1, 12, "INSERT", 5.0)])
    assert _result(cdc_merge(snap, batch)) == {1: (12, 5.0)}


def test_insert_then_delete_same_key_one_batch(spark):
    snap = _snapshot(spark, [(2, 1, 2.0)])
    batch = _batch(spark, [(1, 11, "INSERT", 5.0), (1, 12, "REMOVE", None)])
    assert _result(cdc_merge(snap, batch)) == {2: (1, 2.0)}


def test_out_of_order_seq_within_batch(spark):
    # arrival order is meaningless; seq_no decides
    snap = _snapshot(spark, [])
    batch = _batch(spark, [(1, 20, "MODIFY", 9.0), (1, 12, "INSERT", 5.0)])
    assert _result(cdc_merge(snap, batch)) == {1: (20, 9.0)}


def test_stale_replay_is_ignored(spark):
    # seq_no monotonic guard: replaying an already-applied batch converges
    snap = _snapshot(spark, [(1, 20, 9.0)])
    batch = _batch(spark, [(1, 12, "INSERT", 5.0), (1, 20, "MODIFY", 9.0)])
    assert _result(cdc_merge(snap, batch)) == {1: (20, 9.0)}


def test_idempotent_reapply(spark):
    snap = _snapshot(spark, [(1, 10, 1.0)])
    batch = _batch(spark, [(1, 11, "MODIFY", 2.0), (2, 12, "INSERT", 3.0)])
    once = cdc_merge(snap, batch)
    twice = cdc_merge(once, batch)
    assert _result(once) == _result(twice) == {1: (11, 2.0), 2: (12, 3.0)}


def test_empty_batch(spark):
    snap = _snapshot(spark, [(1, 10, 1.0)])
    batch = _batch(spark, [])
    assert _result(cdc_merge(snap, batch)) == {1: (10, 1.0)}


def test_empty_snapshot(spark):
    snap = _snapshot(spark, [])
    batch = _batch(spark, [(1, 11, "INSERT", 2.0), (2, 12, "REMOVE", None)])
    assert _result(cdc_merge(snap, batch)) == {1: (11, 2.0)}


def test_fold_changelog_matches_merge(spark):
    ops = [
        (1, 1, "INSERT", 1.0),
        (2, 2, "INSERT", 2.0),
        (1, 3, "MODIFY", 1.5),
        (2, 4, "REMOVE", None),
        (3, 5, "INSERT", 3.0),
    ]
    folded = fold_changelog(_batch(spark, ops))
    merged = cdc_merge(_snapshot(spark, []), _batch(spark, ops))
    assert _result(folded) == _result(merged) == {1: (3, 1.5), 3: (5, 3.0)}


def test_scd2_interval_state_equals_prefix_fold(spark, sf_dir):
    """Cross-representation equivalence: filtering the SCD2 history by
    the interval predicate valid_from <= s < valid_to must reproduce
    the state a changelog-prefix fold gives at the same cutoff —
    version intervals and latest-per-key folds are two encodings of
    one table-state semantics."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from dynamodb_pitr_restore_cdc_spark.operators.cdc import changelog
    from dynamodb_pitr_restore_cdc_spark.registry import all_queries

    cl = changelog(spark, sf_dir)
    cutoff = cl.agg(F.expr("percentile(seq_no, 0.5)")).first()[0]
    hist = all_queries()["q_cdc_scd2_history"].builder(spark, sf_dir)
    via_interval = sorted(
        (r.key, r.payload_value)
        for r in hist.where(
            (F.col("valid_from_seq") <= cutoff) & (F.col("valid_to_seq") > cutoff)
        ).collect()
    )
    w = W.partitionBy("key").orderBy(F.col("seq_no").desc())
    via_fold = sorted(
        (r.key, r.payload_value)
        for r in cl.where(F.col("seq_no") <= cutoff)
        .withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "REMOVE"))
        .collect()
    )
    assert via_interval == via_fold and len(via_interval) > 0
