"""Moment statistics and BM25 against independent numpy references."""

import numpy as np
import pandas as pd

from dynamodb_pitr_restore_cdc_spark.llm.retrieval import (
    QUERY_TERMS,
    q_llm_bm25_search,
    q_llm_tfidf_search,
)
from dynamodb_pitr_restore_cdc_spark.operators.aggregates import (
    q_agg_stats_moments,
)
from dynamodb_pitr_restore_cdc_spark.sources import table

from .conftest import SF_SMOKE


def test_moments_match_numpy_population_formulas(spark):
    got = q_agg_stats_moments(spark, SF_SMOKE).toPandas().set_index("l_returnflag")
    li = (
        table(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", "l_quantity", "l_discount")
        .toPandas()
    )
    for flag, g in li.groupby("l_returnflag"):
        q = g["l_quantity"].to_numpy()
        d = np.round(g["l_discount"].to_numpy() * 100)
        m2 = ((q - q.mean()) ** 2).mean()
        m3 = ((q - q.mean()) ** 3).mean()
        m4 = ((q - q.mean()) ** 4).mean()
        row = got.loc[flag]
        assert row["n"] == len(q)
        assert abs(row["mean_qty"] - q.mean()) < 1e-6
        assert abs(row["var_qty"] - m2) < 1e-5
        assert abs(row["skew_qty"] - m3 / m2**1.5) < 1e-6
        assert abs(row["kurt_qty"] - (m4 / m2**2 - 3.0)) < 1e-6
        assert abs(row["corr_qty_disc"] - np.corrcoef(q, d)[0, 1]) < 1e-6


def test_bm25_matches_reference_and_saturates_vs_tfidf(spark):
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text").toPandas()
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    tf = {
        doc: {w: t.count(w) for w in QUERY_TERMS if w in t}
        for doc, t in toks.items()
    }
    df = {w: sum(1 for d in tf.values() if w in d) for w in QUERY_TERMS}
    k1, b = 1.2, 0.75

    def score(doc):
        s = 0.0
        for w, f in tf[doc].items():
            idf = np.log((n - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
            s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * len(toks[doc]) / avgdl))
        return s

    got = q_llm_bm25_search(spark, SF_SMOKE).toPandas()
    assert len(got) == 20
    for r in got.itertuples():
        assert abs(r.score - score(r.doc_id)) < 1e-4
    # the reference top-20 by (score, -doc_id) equals the query's
    want = sorted(tf, key=lambda d: (-score(d), d))[:20]
    assert list(got["doc_id"]) == want
    # and BM25 really is the saturating variant: its top doc's tf-idf
    # rank can differ, but scores must be positive and finite
    assert (got["score"] > 0).all() and np.isfinite(got["score"]).all()
    tfidf = q_llm_tfidf_search(spark, SF_SMOKE).toPandas()
    assert len(tfidf) == 20  # both rankers stay consistent on the corpus


def test_unigram_logprob_matches_numpy_reference(spark):
    from dynamodb_pitr_restore_cdc_spark.llm.curation import q_llm_unigram_logprob

    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text").toPandas()
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    from collections import Counter

    freq = Counter(w for t in toks.values() for w in t)
    total = sum(freq.values())
    got = q_llm_unigram_logprob(spark, SF_SMOKE).toPandas().set_index("doc_id")
    assert len(got) == len(toks)
    for doc_id in list(toks)[:50]:
        t = toks[doc_id]
        want = sum(-np.log(freq[w] / total) for w in t) / len(t)
        row = got.loc[doc_id]
        assert row["n_words"] == len(t)
        assert abs(row["avg_nll"] - want) < 1e-4
    # every NLL is positive and bounded by the rarest word's cost
    assert (got["avg_nll"] > 0).all()
    assert (got["avg_nll"] <= -np.log(1 / total) + 1e-9).all()


def test_histogram_partitions_all_orders(spark):
    from dynamodb_pitr_restore_cdc_spark.operators.aggregates import q_agg_histogram

    h = q_agg_histogram(spark, SF_SMOKE).toPandas()
    o = table(spark, SF_SMOKE, "orders").toPandas()
    assert int(h["n_orders"].sum()) == len(o)
    assert (h["bin_lo"] % 25000 == 0).all()
    assert abs(h["sum_price"].sum() - round(o["o_totalprice"], 2).sum()) < 1.0


def test_stl_decompose_matches_pandas_model(spark):
    """Independent-semantics check for q_ts_stl_decompose: its Spark
    builder and DuckDB oracle SHARE the trend/detrend/seasonal
    expression text, so parity alone cannot catch a bug in that text —
    this recomputes the decomposition from first principles (centered
    25-observation mean, hour-of-day mean of the quantized detrended
    values) in pandas/numpy."""
    import math

    from dynamodb_pitr_restore_cdc_spark.operators.timeseries import (
        q_ts_stl_decompose,
    )

    got = q_ts_stl_decompose(spark, SF_SMOKE).toPandas()
    e = table(spark, SF_SMOKE, "events").select("user_id", "ts", "value").toPandas()
    e["hus"] = e["ts"].astype("int64") // 1000  # ns -> us
    e["hus"] = (e["hus"] // 3_600_000_000) * 3_600_000_000
    e["vc"] = (e["value"] * 100).round().astype("int64")
    hourly = e.groupby(["user_id", "hus"], as_index=False)["vc"].sum()

    want = {}
    for uid, g in hourly.groupby("user_id"):
        g = g.sort_values("hus").reset_index(drop=True)
        vcs = g["vc"].to_numpy()
        trend = np.array(
            [vcs[max(0, i - 12): i + 13].mean() for i in range(len(vcs))]
        )
        dq = np.array(
            [math.floor((v - t) * 1e4 + 0.5) for v, t in zip(vcs, trend)]
        )
        hod = (g["hus"].to_numpy() // 3_600_000_000) % 24
        for h in np.unique(hod):
            mask = hod == h
            seasonal = dq[mask].sum() / mask.sum() / 1e4 / 1e2
            for i in np.where(mask)[0]:
                want[(uid, g["hus"][i])] = (
                    trend[i] / 100.0,
                    seasonal,
                    dq[i] / 1e4 / 1e2 - seasonal,
                )

    assert len(got) == len(want)
    for r in got.itertuples():
        t, s, res = want[(r.user_id, r.hour_us)]
        assert abs(r.trend - t) < 1e-9, (r, t)
        assert abs(r.seasonal - s) < 1e-9, (r, s)
        assert abs(r.residual - res) < 1e-9, (r, res)


def test_forecast_backtest_matches_python_model(spark):
    """Same independent-semantics check for q_ts_forecast_backtest
    (shared sMAPE quantization text): wall-clock 24h seasonal-naive
    errors recomputed in plain Python."""
    import math

    from dynamodb_pitr_restore_cdc_spark.operators.timeseries import (
        DAY_US,
        q_ts_forecast_backtest,
    )

    got = q_ts_forecast_backtest(spark, SF_SMOKE).toPandas().set_index("user_id")
    e = table(spark, SF_SMOKE, "events").select("user_id", "ts", "value").toPandas()
    e["hus"] = (e["ts"].astype("int64") // 1000 // 3_600_000_000) * 3_600_000_000
    e["vc"] = (e["value"] * 100).round().astype("int64")
    hourly = e.groupby(["user_id", "hus"])["vc"].sum()

    by_user = {}
    for (uid, hus), vc in hourly.items():
        vhat = hourly.get((uid, hus - DAY_US))
        n, nf, ae, sq = by_user.get(uid, (0, 0, 0, 0))
        if vhat is not None:
            a = abs(int(vc) - int(vhat))
            q = 0 if vc == 0 and vhat == 0 else math.floor(
                (2 * 1e6 * a) / (abs(int(vc)) + abs(int(vhat))) + 0.5
            )
            nf, ae, sq = nf + 1, ae + a, sq + q
        by_user[uid] = (n + 1, nf, ae, sq)

    assert len(got) == len(by_user)
    for uid, (n, nf, ae, sq) in by_user.items():
        r = got.loc[uid]
        assert r.n_hours == n and r.n_forecasts == nf, (uid, n, nf)
        if nf == 0:
            assert pd.isna(r.mae) and pd.isna(r.smape)
        else:
            assert abs(r.mae - ae / nf / 100.0) < 1e-9
            assert abs(r.smape - sq / nf / 1e6) < 1e-9


def test_ewma_matches_python_model(spark):
    """q_ts_ewma's numerator/denominator text is shared with its oracle
    AND its streaming twin — recompute the truncated closed form (exact
    3^j/4^j weights, per-term micro-unit quantization) independently."""
    import math

    from dynamodb_pitr_restore_cdc_spark.operators.timeseries import (
        EWMA_LAGS,
        q_ts_ewma,
    )

    got = q_ts_ewma(spark, SF_SMOKE).toPandas()
    e = table(spark, SF_SMOKE, "events").select("user_id", "ts", "value").toPandas()
    e["hus"] = (e["ts"].astype("int64") // 1000 // 3_600_000_000) * 3_600_000_000
    e["vc"] = (e["value"] * 100).round().astype("int64")
    hourly = e.groupby(["user_id", "hus"], as_index=False)["vc"].sum()

    want = {}
    for uid, g in hourly.groupby("user_id"):
        g = g.sort_values("hus").reset_index(drop=True)
        vcs = g["vc"].tolist()
        for i in range(len(vcs)):
            num = den = 0
            for j in range(EWMA_LAGS + 1):
                if i - j < 0:
                    continue
                num += math.floor((vcs[i - j] * 3**j) * 1e6 / 4**j + 0.5)
                den += math.floor(1e6 * 3**j / 4**j + 0.5)
            want[(uid, g["hus"][i])] = (vcs[i] / 100.0, (num / den) / 100.0)

    assert len(got) == len(want)
    for r in got.itertuples():
        hv, ew = want[(r.user_id, r.hour_us)]
        assert r.hour_value == hv
        assert abs(r.ewma_value - ew) < 1e-12, (r, ew)


def test_autocorr_matches_python_model(spark):
    """q_ts_autocorr derives through the byte-identical _ACF_EXPR in
    both engines — recompute the full-series-centered ACF from the raw
    integer sufficient statistics in plain Python (same IEEE op order
    as the shared text; 1e-6 quantization absorbs any last-ulp skew)."""
    import math

    from dynamodb_pitr_restore_cdc_spark.operators.timeseries import q_ts_autocorr

    got = q_ts_autocorr(spark, SF_SMOKE).toPandas().set_index("user_id")
    e = table(spark, SF_SMOKE, "events").select("user_id", "ts", "value").toPandas()
    e["hus"] = (e["ts"].astype("int64") // 1000 // 3_600_000_000) * 3_600_000_000
    e["vc"] = (e["value"] * 100).round().astype("int64")
    hourly = e.groupby(["user_id", "hus"], as_index=False)["vc"].sum()

    def acf(vcs, k, n, s1, s2):
        pairs = [(vcs[i], vcs[i - k]) for i in range(k, len(vcs))]
        if not pairs:
            return None
        ck = sum(v * l for v, l in pairs)
        sh = sum(v for v, _ in pairs)
        st = sum(l for _, l in pairs)
        cnt = len(pairs)
        val = (ck - (s1 / n) * (sh + st) + cnt * (s1 / n) * (s1 / n)) / (
            s2 - n * (s1 / n) * (s1 / n)
        )
        return math.floor(val * 1e6 + 0.5) / 1e6

    checked = 0
    for uid, g in hourly.groupby("user_id"):
        vcs = g.sort_values("hus")["vc"].tolist()
        n, s1, s2 = len(vcs), sum(vcs), sum(v * v for v in vcs)
        if not (n > 48 and n * s2 - s1 * s1 > 0):
            assert uid not in got.index
            continue
        r = got.loc[uid]
        assert r.n == n
        for k, col in ((1, r.acf_lag1), (24, r.acf_lag24)):
            want = acf(vcs, k, n, s1, s2)
            assert abs(col - want) < 1.5e-6, (uid, k, col, want)
        checked += 1
    assert checked == len(got)


def test_anomaly_zscore_matches_python_model(spark):
    """q_ts_anomaly_zscore's _Z_EXPR is shared by builder, oracle, and
    the streaming twin — recompute the population z-scores and the
    flagged set from first principles, including that the THRESHOLD
    compares the quantized value."""
    import math

    from dynamodb_pitr_restore_cdc_spark.operators.behavior import (
        Z_THRESHOLD,
        q_ts_anomaly_zscore,
    )

    got = q_ts_anomaly_zscore(spark, SF_SMOKE).toPandas().set_index("event_id")
    e = table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value").toPandas()
    e["v"] = (e["value"] * 100).round().astype("int64")

    flagged = {}
    for uid, g in e.groupby("user_id"):
        vs = g["v"].tolist()
        n, s1, s2 = len(vs), sum(vs), sum(v * v for v in vs)
        var = s2 / n - (s1 / n) * (s1 / n)
        if var <= 0:
            continue
        for eid, v in zip(g["event_id"], vs):
            z = math.floor(((v - s1 / n) / math.sqrt(var)) * 1e6 + 0.5) / 1e6
            if abs(z) > Z_THRESHOLD:
                flagged[eid] = (v / 100.0, z)

    assert set(got.index) == set(flagged)
    for eid, (val, z) in flagged.items():
        r = got.loc[eid]
        assert r.value == val
        assert abs(r.zscore - z) < 1.5e-6, (eid, r.zscore, z)
