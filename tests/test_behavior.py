"""Behavioral analytics invariants (operators/behavior.py) beyond the
oracle parity check: structural properties that would survive an
oracle that was wrong in the same way."""

import pandas as pd
from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.operators.behavior import (
    SESSION_GAP_US,
    q_ts_cohort_retention,
    q_ts_funnel,
    q_ts_interpolate_linear,
    q_ts_sessionize,
)
from dynamodb_pitr_restore_cdc_spark.sources import table

from .conftest import SF_SMOKE


def test_sessionize_partitions_all_events_with_gap_property(spark):
    s = q_ts_sessionize(spark, SF_SMOKE).toPandas()
    n_events = table(spark, SF_SMOKE, "events").count()
    assert int(s["n_events"].sum()) == n_events  # every event in exactly one session
    # per-user: session ids are 1..k, consecutive sessions separated by
    # MORE than the gap, and sessions never overlap
    for _, g in s.groupby("user_id"):
        g = g.sort_values("session_id")
        assert list(g["session_id"]) == list(range(1, len(g) + 1))
        assert (g["end_us"] >= g["start_us"]).all()
        gaps = g["start_us"].values[1:] - g["end_us"].values[:-1]
        assert (gaps > SESSION_GAP_US).all()


def test_funnel_counts_are_monotone_and_bounded(spark):
    f = (
        q_ts_funnel(spark, SF_SMOKE)
        .toPandas()
        .sort_values("stage_no")
        .reset_index(drop=True)
    )
    assert list(f["stage"]) == ["signup", "view", "click", "purchase"]
    n = f["n_users"].tolist()
    assert n[0] >= n[1] >= n[2] >= n[3] >= 0  # ordered funnel can only narrow
    n_users = (
        table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    assert n[0] <= n_users
    assert abs(f.loc[0, "conv_pct"] - 100.0) < 1e-9  # first stage is 100% of itself


def test_funnel_requires_stage_order_not_just_presence(spark):
    """A user whose purchase precedes their click must NOT count as
    converted: the fixture corpus saturates every stage, so pin the
    strictly-after semantics on a crafted table."""
    import os
    import tempfile

    rows = [
        # u1: full ordered funnel
        (1, "2024-01-01 00:00", "signup"),
        (1, "2024-01-01 00:01", "view"),
        (1, "2024-01-01 00:02", "click"),
        (1, "2024-01-01 00:03", "purchase"),
        # u2: purchase BEFORE click -> reaches click, not purchase
        (2, "2024-01-01 00:00", "signup"),
        (2, "2024-01-01 00:01", "view"),
        (2, "2024-01-01 00:02", "purchase"),
        (2, "2024-01-01 00:03", "click"),
        # u3: no signup -> reaches nothing
        (3, "2024-01-01 00:00", "view"),
        (3, "2024-01-01 00:01", "purchase"),
        # u4: view at the SAME instant as signup is not strictly after
        (4, "2024-01-01 00:00", "signup"),
        (4, "2024-01-01 00:00", "view"),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["event_id"] = range(len(pdf))
    pdf["value"] = 1.0
    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "events.parquet"), coerce_timestamps="us")
        f = q_ts_funnel(spark, d).toPandas().sort_values("stage_no")
    assert list(f["n_users"]) == [3, 2, 2, 1]


def test_cohort_retention_month_zero_covers_every_customer(spark):
    r = q_ts_cohort_retention(spark, SF_SMOKE).toPandas()
    assert (r["months_since"] >= 0).all()
    m0 = r[r["months_since"] == 0]
    # month zero of each cohort IS the cohort: its distinct-customer
    # count summed over cohorts equals the total customer base
    n_cust = (
        table(spark, SF_SMOKE, "orders").select("o_custkey").distinct().count()
    )
    assert int(m0["n_customers"].sum()) == n_cust
    # retention can never exceed the cohort size at any age
    sizes = m0.set_index("cohort_month")["n_customers"]
    for _, row in r.iterrows():
        assert row["n_customers"] <= sizes[row["cohort_month"]]


def test_interpolation_is_exact_on_observed_and_bounded_between(spark):
    df = q_ts_interpolate_linear(spark, SF_SMOKE)
    pdf = df.toPandas().sort_values(["user_id", "hour_us"])
    assert not pdf["value_interp"].isna().any()  # interior gaps only: total fill
    # interpolated values lie within [prev observed, next observed]
    for _, g in pdf.groupby("user_id"):
        obs = g["observed"].values
        vals = g["value_interp"].values
        assert obs[0] and obs[-1]  # spine clamps to observed bounds
        prev_known = pd.Series(vals).where(pd.Series(obs)).ffill()
        next_known = pd.Series(vals).where(pd.Series(obs)).bfill()
        lo = pd.concat([prev_known, next_known], axis=1).min(axis=1) - 0.011
        hi = pd.concat([prev_known, next_known], axis=1).max(axis=1) + 0.011
        assert ((vals >= lo) & (vals <= hi)).all()


def test_interpolation_midpoint_is_arithmetic_mean(spark):
    # a synthetic two-observation series: the single missing middle hour
    # must be the exact rounded mean of its neighbors
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1],
            "ts": pd.to_datetime(["2024-01-01 00:10", "2024-01-01 02:20"]),
            "event_id": [1, 2],
            "value": [10.00, 11.01],
        }
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(
            os.path.join(d, "events.parquet"), coerce_timestamps="us"
        )
        out = (
            q_ts_interpolate_linear(spark, d)
            .orderBy("hour_us")
            .toPandas()
        )
    assert len(out) == 3
    assert list(out["observed"]) == [True, False, True]
    # (1000 + 1101) cents / 2 = 1050.5 -> round-half-up 1051 -> 10.51
    assert abs(out.loc[1, "value_interp"] - 10.51) < 1e-12


def test_anomaly_zscore_flags_match_per_user_stats(spark):
    from dynamodb_pitr_restore_cdc_spark.operators.behavior import (
        Z_THRESHOLD,
        q_ts_anomaly_zscore,
    )

    got = q_ts_anomaly_zscore(spark, SF_SMOKE).toPandas()
    assert (got["zscore"].abs() > Z_THRESHOLD).all()
    ev = table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value").toPandas()
    ev["v"] = (ev["value"] * 100).round()
    flagged = set(got["event_id"])
    import numpy as np

    recomputed = set()
    for _, g in ev.groupby("user_id"):
        v = g["v"].to_numpy()
        z = (v - v.mean()) / v.std(ddof=0)  # population sigma
        recomputed |= set(g["event_id"].to_numpy()[np.abs(z) > Z_THRESHOLD + 1e-9])
    # quantization can flip exact-boundary rows only; none here
    assert flagged == recomputed


def test_ewma_matches_truncated_reference(spark):
    import numpy as np
    from dynamodb_pitr_restore_cdc_spark.operators.timeseries import (
        EWMA_LAGS,
        q_ts_ewma,
    )

    got = (
        q_ts_ewma(spark, SF_SMOKE)
        .toPandas()
        .sort_values(["user_id", "hour_us"])
    )
    w = np.array([0.75**j for j in range(EWMA_LAGS + 1)])
    for uid, g in list(got.groupby("user_id"))[:10]:
        v = g["hour_value"].to_numpy()
        e = g["ewma_value"].to_numpy()
        assert abs(e[0] - v[0]) < 1e-9  # series head: only lag0 mass
        for t in range(len(v)):
            k = min(t, EWMA_LAGS)
            vals = v[t - k : t + 1][::-1]
            want = (vals * w[: k + 1]).sum() / w[: k + 1].sum()
            assert abs(e[t] - want) < 1e-4, (uid, t, e[t], want)


def test_cusum_finds_a_planted_level_shift(spark):
    import os
    import tempfile

    from dynamodb_pitr_restore_cdc_spark.operators.timeseries import (
        q_ts_cusum_changepoint,
    )

    # user 1: mean jumps from 10.0 to 20.0 at index 60 of 100
    ts = pd.date_range("2024-01-01", periods=100, freq="1h")
    vals = [10.0] * 60 + [20.0] * 40
    pdf = pd.DataFrame(
        {"user_id": 1, "ts": ts, "event_id": range(100), "value": vals,
         "event_type": "view", "props": "{}"}
    )
    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "events.parquet"), coerce_timestamps="us")
        got = q_ts_cusum_changepoint(spark, d).toPandas()
    assert len(got) == 1
    # CUSUM of a step function peaks exactly AT the last pre-shift point
    assert int(got.loc[0, "cp_index"]) == 60
    # peak |Σ(v - mean)| at t=60: mean = 14.0, so 60·|10-14| = 240
    assert abs(got.loc[0, "peak_dev"] - 240.0) < 1e-9


def test_sessionize_matches_bruteforce_on_random_streams(spark):
    """Property: for random event streams, sessionize must equal a
    direct python fold of the gap rule."""
    import os
    import tempfile

    import numpy as np

    from dynamodb_pitr_restore_cdc_spark.operators.behavior import (
        SESSION_GAP_US,
        q_ts_sessionize,
    )

    rng = np.random.default_rng(17)
    rows = []
    eid = 0
    for uid in range(6):
        t = 0
        for _ in range(rng.integers(1, 120)):
            t += int(rng.choice([30, 600, 1900, 7200]) * 1e6 * rng.uniform(0.5, 1.5))
            rows.append((uid, t, eid, float(rng.integers(0, 5000)) / 100))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["user_id", "t_us", "event_id", "value"])
    pdf["ts"] = pd.to_datetime(pdf["t_us"], unit="us")
    with tempfile.TemporaryDirectory() as d:
        pdf.drop(columns=["t_us"]).to_parquet(
            os.path.join(d, "events.parquet"), coerce_timestamps="us"
        )
        got = q_ts_sessionize(spark, d).toPandas()

    # brute-force fold
    want = []
    for uid, g in pdf.sort_values(["user_id", "t_us", "event_id"]).groupby("user_id"):
        sid, start, last, n, val = 0, None, None, 0, 0
        for r in g.itertuples():
            if last is None or r.t_us - last > SESSION_GAP_US:
                if last is not None:
                    want.append((uid, sid, start, last, n, round(val, 2)))
                sid, start, n, val = sid + 1, r.t_us, 0, 0.0
            last = r.t_us
            n += 1
            val += r.value
        want.append((uid, sid, start, last, n, round(val, 2)))
    got_t = sorted(
        (int(r.user_id), int(r.session_id), int(r.start_us), int(r.end_us),
         int(r.n_events), round(float(r.session_value), 2))
        for r in got.itertuples()
    )
    assert got_t == sorted(want)
