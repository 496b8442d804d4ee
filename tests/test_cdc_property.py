"""Property test (SURVEY.md §5.2 item 3): cdc_merge over ARBITRARY batch
boundaries must equal a naive sequential fold of the same op sequence.

This is the exactly-once-state claim: however the stream is micro-batched
(the reference's ESM batches are 1000/5s — arbitrary cuts), the final
table state depends only on the op sequence."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dynamodb_pitr_restore_cdc_spark.operators.cdc import cdc_merge

KEYS = st.integers(min_value=0, max_value=4)
OPS = st.sampled_from(["INSERT", "MODIFY", "REMOVE"])


def naive_fold(ops):
    state = {}
    for seq, (key, op, val) in enumerate(ops):
        if op == "REMOVE":
            state.pop(key, None)
        else:
            state[key] = (seq, val)
    return state


@st.composite
def op_sequences(draw):
    n = draw(st.integers(min_value=0, max_value=25))
    ops = [
        (draw(KEYS), draw(OPS), float(draw(st.integers(0, 99))))
        for _ in range(n)
    ]
    # batch boundaries: sorted unique cut points
    cuts = draw(st.lists(st.integers(0, n), max_size=4, unique=True).map(sorted))
    return ops, cuts


def to_batch(spark, ops, lo, hi):
    rows = [(key, seq, op, val) for seq, (key, op, val) in enumerate(ops)][lo:hi]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "seq_no", "op", "payload_value"]),
        schema="key long, seq_no long, op string, payload_value double",
    )


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(op_sequences())
def test_merge_equals_sequential_fold(spark, seq_and_cuts):
    ops, cuts = seq_and_cuts
    n = len(ops)
    bounds = [0] + [c for c in cuts if 0 < c < n] + [n]

    snapshot = to_batch(spark, [], 0, 0).selectExpr(
        "key", "seq_no as last_seq", "payload_value"
    )
    for lo, hi in zip(bounds, bounds[1:]):
        snapshot = cdc_merge(snapshot, to_batch(spark, ops, lo, hi))
        # keep lineage short: hypothesis drives many merges per example
        snapshot = snapshot.localCheckpoint(eager=True)

    got = {r.key: (r.last_seq, r.payload_value) for r in snapshot.collect()}
    want = naive_fold(ops)
    assert got == want


def naive_branch_merge(ops, cut):
    """Reference model for q_cdc_branch_merge: two sequential folds
    (main = every op; branch = ops ignoring post-cut REMOVEs) diffed
    per key."""
    def fold(keep):
        state = {}
        for seq, (key, op, val) in enumerate(ops):
            if keep(seq, op):
                state[key] = (seq, op, val)
        return {k: (s, v) for k, (s, o, v) in state.items() if o != "REMOVE"}

    m = fold(lambda s, o: True)
    br = fold(lambda s, o: s <= cut or o != "REMOVE")
    out = {}
    for key in set(m) | set(br):
        a, b = m.get(key), br.get(key)
        if a is not None and b is not None and a[0] == b[0]:
            continue  # unchanged
        out[key] = (
            "INSERT" if a is None else "DELETE" if b is None else "UPDATE",
            (b or a)[0],
            None if b is None else b[1],
            None if a is None else a[1],
        )
    return out


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(op_sequences())
def test_branch_merge_equals_naive_two_fold_diff(spark, seq_and_cuts):
    """The single-shuffle branch merge (one window pass annotating both
    heads + one argmax fold) must equal the naive model for ANY op
    sequence and ANY branch point — including cuts at 0, past the end,
    and sequences where a key's only post-cut activity is REMOVEs."""
    from dynamodb_pitr_restore_cdc_spark.streaming.versioned_sink import (
        branch_merge_frame,
    )

    ops, cuts = seq_and_cuts
    if not ops:
        return
    cl = to_batch(spark, ops, 0, len(ops))
    # two cuts per example: one drawn, plus the at-the-end endpoint
    # (branch == main, diff must be empty) — min-of-drawn-cuts alone
    # systematically under-samples large branch points
    for cut in {(cuts[0] if cuts else len(ops) // 2), len(ops)}:
        got = {
            r.key: (r.change_type, r.last_seq, r.payload_value, r.payload_value_old)
            for r in branch_merge_frame(cl, cut).collect()
        }
        assert got == naive_branch_merge(ops, cut), cut
