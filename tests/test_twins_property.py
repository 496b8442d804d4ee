"""Batch/stream twins: algebraic invariants beyond the parity gate.

The parity suite proves q_stream_sessionize == q_ts_sessionize for the
pinned 3-way time split; these properties prove the session-grain
interval merge (streaming/twins._merge_session_intervals) converges to
the batch answer under ARBITRARY batching — any assignment of events
to any number of micro-batches, applied incrementally in any batch
order. That is the claim that matters at scale, where batch boundaries
are whatever the source delivers.

Why it holds (and what the test exercises): an in-batch session's
every internal gap is ≤ GAP over a SUBSET of the true events, so
in-batch sessions are always sub-intervals of true sessions; and for
any two consecutive true events x, y with gap ≤ GAP in different
batches, the interval gap between their sessions is ≤ y - x ≤ GAP, so
the merge joins them. Conversely a merge only fires across a real
≤-GAP pair of event times. Hence merge(U sessionize(batch_i)) =
sessionize(U batch_i) for every partition of the events.
"""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dynamodb_pitr_restore_cdc_spark.streaming.twins import (
    _merge_session_intervals,
    _sessionize_events,
)

MIN_US = 60 * 1_000_000
GAP_MIN = 30  # SESSION_GAP_US in minutes


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_id", "us", "value_c"]),
        schema="user_id long, event_id long, us long, value_c long",
    )


def _rows(df):
    return sorted(
        (r.user_id, r.start_us, r.end_us, r.n_events, r.value_c)
        for r in df.collect()
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.data())
def test_interval_merge_invariant_under_arbitrary_batching(spark, data):
    n = data.draw(st.integers(1, 30))
    k = data.draw(st.integers(1, 4))
    rows = []
    for i in range(n):
        user = data.draw(st.integers(0, 2))
        minute = data.draw(st.integers(0, 300))
        rows.append((user, i, minute * MIN_US, data.draw(st.integers(-5, 5))))
    assignment = [data.draw(st.integers(0, k - 1)) for _ in range(n)]

    expected = _rows(_sessionize_events(_df(spark, rows)))

    acc = _sessionize_events(_df(spark, []))  # empty, schema-typed
    for b in range(k):
        batch = [r for r, a in zip(rows, assignment) if a == b]
        acc = _merge_session_intervals(
            acc.unionByName(_sessionize_events(_df(spark, batch)))
        )
        # materialize each incremental state like the foreachBatch store
        # does, so later merges read data, not a growing lazy plan
        acc = spark.createDataFrame(acc.toPandas(), schema=acc.schema)

    assert _rows(acc) == expected
