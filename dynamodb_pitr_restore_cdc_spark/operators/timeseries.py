"""Time-series operators: dense spine generation, gap filling, and
forward fill — the resampling family every metrics/feature pipeline
needs on top of raw event streams.

Spine: `sequence()` + explode generates the dense hourly grid per key
JVM-side (DuckDB twin: generate_series) — never a driver loop. The
spine bounds are per-key min/max event times, so a key's grid is only
as long as its activity span.

Scale notes (100 TB): the spine explode produces (hours-in-span) rows
per key BEFORE the join — for long spans prefer bucketing the spine by
day and joining per bucket; here spans are one month (~720 rows/key).
Forward fill is a single last-non-null window over the spine — one
shuffle on key, shared with the gap-fill join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register, tracked_persist
from ..sources import table


@register(
    "q_ts_gapfill_ffill",
    oracle="""
WITH hourly AS (
    SELECT user_id, date_trunc('hour', ts) AS h,
           count(*) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) AS value_c
    FROM events GROUP BY user_id, date_trunc('hour', ts)
), bounds AS (
    SELECT user_id, min(h) AS h_min, max(h) AS h_max FROM hourly GROUP BY user_id
), spine AS (
    SELECT user_id, unnest(generate_series(h_min, h_max, INTERVAL 1 HOUR)) AS h
    FROM bounds
), joined AS (
    SELECT s.user_id, s.h, hr.n_events, hr.value_c
    FROM spine s LEFT JOIN hourly hr ON s.user_id = hr.user_id AND s.h = hr.h
)
SELECT user_id,
       epoch_us(h) AS hour_us,
       coalesce(n_events, 0) AS n_events,
       coalesce(value_c, 0) / 100.0 AS hour_value,
       last_value(value_c IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS ffill_value
FROM joined
""",
)
def q_ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample: aggregate events to hours, generate the
    dense hour spine between each user's first and last activity, left-
    join (gaps become explicit zero rows), and forward-fill the last
    observed value across gaps. Value sums are integer cents so the
    filled series is engine-exact; the ffill window is never null after
    the first observation because the spine starts at an observed hour."""
    e = table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_c"),
        )
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("h_min"), F.max("h").alias("h_max"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h_min", "h_max", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    joined = spine.join(hourly, ["user_id", "h"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        F.unix_micros("h").alias("hour_us"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        (F.coalesce("value_c", F.lit(0)) / 100.0).alias("hour_value"),
        (F.last("value_c", ignorenulls=True).over(w) / 100.0).alias("ffill_value"),
    )


@register(
    "q_ts_ohlc_bars",
    oracle="""
WITH r AS (
    SELECT user_id, date_trunc('hour', ts) AS h, value,
           row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts, event_id) AS rn_a,
           row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM events
)
SELECT user_id,
       epoch_us(h) AS hour_us,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*) AS n_events
FROM r
GROUP BY user_id, h
""",
)
def q_ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC downsampling bars per user — the standard time-series
    compaction (metrics rollup / candlestick) shape. Open/close are
    argmin/argmax by (ts, event_id) computed as min/max over a struct —
    a partial-aggregatable single pass, no window, no second scan
    (event_id is unique, so the struct comparison never reaches the
    value field: the tie-break is total). High/low/count ride the same
    aggregate. Values pass through UNTOUCHED doubles (no arithmetic),
    so both engines emit bit-identical floats. 100 TB: one shuffle at
    (user, hour) grain with map-side partial bars — the shuffled volume
    is the BAR count, not the event count; the oracle's window
    formulation is the plan this one deliberately avoids."""
    e = table(spark, sf_dir, "events")
    first_s = F.min(F.struct("ts", "event_id", "value"))
    last_s = F.max(F.struct("ts", "event_id", "value"))
    return (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            first_s.getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last_s.getField("value").alias("close"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            F.unix_micros("h").alias("hour_us"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Truncated EWMA: deterministic exponential smoothing
# ---------------------------------------------------------------------------

EWMA_LAGS = 20  # truncation horizon; (3/4)^20 ~ 0.3% residual mass


def _ewma_terms(prefix: str) -> tuple[str, str]:
    """(numerator, denominator) expression text shared by both engines,
    over lag columns named ``{prefix}0`` .. ``{prefix}{EWMA_LAGS}``.

    α = 1/4 ⇒ weight_j ∝ (3/4)^j; the common α factor cancels in the
    normalized ratio. Each term embeds the EXACT integer pair (3^j,
    4^j) as literals, multiplies the integer cent value first (exact
    BIGINT), and quantizes to integer micro-units with floor(x + 0.5)
    BEFORE the sum — so the only inexact steps are per-term IEEE ops
    on identical inputs, and the cross-term sum is exact integer
    arithmetic in any order. Rows older than the series start
    contribute zero weight (NULL lag ⇒ excluded from both sums)."""
    nums, dens = [], []
    for j in range(EWMA_LAGS + 1):
        p3, p4 = 3**j, 4**j
        nums.append(f"coalesce(floor(({prefix}{j} * {p3}) * 1e6 / {p4} + 0.5), 0)")
        dens.append(
            f"(CASE WHEN {prefix}{j} IS NULL THEN 0"
            f" ELSE floor(1e6 * {p3} / {p4} + 0.5) END)"
        )
    return " + ".join(nums), " + ".join(dens)


def _ewma_sql_terms() -> tuple[str, str]:
    """The q_ts_ewma instance of :func:`_ewma_terms` (columns lag0..lag20)."""
    return _ewma_terms("lag")


_EWMA_NUM, _EWMA_DEN = _ewma_sql_terms()


# shared with the real-stream twin (streaming/twins.q_stream_ewma),
# which must produce the IDENTICAL result under incremental evaluation
EWMA_ORACLE = f"""
WITH hourly AS (
    SELECT user_id, date_trunc('hour', ts) AS h,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events GROUP BY 1, 2
), lagged AS (
    SELECT user_id, h, value_c,
           {", ".join(f"lag(value_c, {j}) OVER (PARTITION BY user_id ORDER BY h) AS lag{j}" for j in range(EWMA_LAGS + 1))}
    FROM hourly
)
SELECT user_id, epoch_us(h) AS hour_us,
       value_c / 100.0 AS hour_value,
       (({_EWMA_NUM}) / ({_EWMA_DEN})) / 100.0 AS ewma_value
FROM lagged
"""


@register("q_ts_ewma", oracle=EWMA_ORACLE)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.25) of each user's
    hourly value, truncated at 20 lags (<0.4% lost mass): the standard
    metrics-smoothing operator, made bit-reproducible. Decay is
    TICK-BASED — per OBSERVED hour, lag j = the j-th previous
    observation, not j wall-clock hours — the pandas `ewm` default; a
    wall-clock-decay variant composes this over the gap-fill spine
    (q_ts_gapfill_ffill) so missing hours occupy lag slots. The
    recursive definition is a float fold whose result depends on
    evaluation order — useless for cross-engine (or even cross-run,
    under retries) determinism — so this uses the closed truncated
    form:
    exact integer weights 3^j/4^j as literals, integer cents
    multiplied exactly, each term quantized to micro-units BEFORE an
    exact integer sum, normalized by the weight mass actually present
    (series heads reweight instead of biasing to zero). One shuffle on
    user; the 21 lag columns share a single window sort. 100 TB: this
    is the template for ANY decayed aggregate (decayed counts,
    half-life scores) — truncate, exactify, quantize-then-sum."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_c"))
    w = W.partitionBy("user_id").orderBy("h")
    lagged = hourly.select(
        "user_id",
        "h",
        "value_c",
        *[F.lag("value_c", j).over(w).alias(f"lag{j}") for j in range(EWMA_LAGS + 1)],
    )
    return lagged.select(
        "user_id",
        F.unix_micros("h").alias("hour_us"),
        (F.col("value_c") / 100.0).alias("hour_value"),
        (F.expr(f"(({_EWMA_NUM}) / ({_EWMA_DEN}))") / 100.0).alias("ewma_value"),
    )


# shared with the real-stream twin (streaming/twins.q_stream_cusum),
# which must locate the IDENTICAL change point under incremental
# evaluation (two-phase: final stats, then a prefix-carryover scan)
CUSUM_ORACLE = """
WITH v AS (
    SELECT user_id, ts, event_id,
           CAST(round(value * 100) AS BIGINT) AS vc
    FROM events
), s AS (
    SELECT *,
           count(*) OVER (PARTITION BY user_id) AS n,
           CAST(sum(vc) OVER (PARTITION BY user_id) AS BIGINT) AS s1,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           CAST(sum(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS csum
    FROM v
), c AS (
    SELECT user_id, ts, n, rn,
           abs(n * csum - rn * s1) AS dev
    FROM s
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY dev DESC, rn) AS pick
    FROM c
)
SELECT user_id,
       epoch_us(ts) AS cp_ts_us,
       CAST(rn AS BIGINT) AS cp_index,
       CAST(n AS BIGINT) AS n_events,
       (dev / n) / 100.0 AS peak_dev
FROM ranked WHERE pick = 1
"""


@register("q_ts_cusum_changepoint", oracle=CUSUM_ORACLE)
def q_ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per user: the point where the
    cumulative deviation from the user's own mean peaks — the standard
    drift/level-shift detector for metrics and data-quality
    monitoring. Stays EXACT by never dividing: the centered prefix sum
    Σ(vᵢ - mean) is scaled by n into the all-integer n·csumₜ - t·s1,
    so the argmax is computed on exact BIGINTs (a float mean would
    make the peak location itself merge-order dependent near ties).
    Spark picks the peak with the min-of-struct partial aggregate
    (argmin of (-dev, rn): largest deviation, earliest tie) — the
    OHLC pattern, partial-aggregatable so the shuffle after the window
    pass carries one candidate per partition per user, while the
    oracle states the same thing as a window rank. Output normalizes
    the peak back to dollars with int/int → double division only at
    the edge."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    wu = W.partitionBy("user_id")
    wo = wu.orderBy("ts", "event_id")
    wrun = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    s = e.select(
        "user_id",
        "ts",
        F.count("*").over(wu).alias("n"),
        F.sum("vc").over(wu).alias("s1"),
        F.row_number().over(wo).alias("rn"),
        F.sum("vc").over(wrun).alias("csum"),
    )
    c = s.select(
        "user_id",
        "n",
        "rn",
        F.unix_micros("ts").alias("ts_us"),
        F.abs(F.expr("n * csum - rn * s1")).alias("dev"),
    )
    peak = c.groupBy("user_id").agg(
        F.min(
            F.struct((-F.col("dev")).alias("negdev"), "rn", "ts_us", "n", "dev")
        ).alias("p")
    )
    return peak.select(
        "user_id",
        F.col("p.ts_us").alias("cp_ts_us"),
        F.col("p.rn").cast("bigint").alias("cp_index"),
        F.col("p.n").cast("bigint").alias("n_events"),
        (F.expr("p.dev / p.n") / 100.0).alias("peak_dev"),
    )


# Autocorrelation derivation shared by both engines: all inputs are
# exact integer sums over the lag-paired rows (ck = Σ v·lag, sh/st =
# head/tail-trimmed sums, cnt = pairs), m = full-series mean. The
# estimator is the standard ACF with full-series centering:
#   r_k = Σ(v_t - m)(v_{t-k} - m) / Σ(v_t - m)²
# expanded so every float derives from BIGINTs through this one text.
_ACF_EXPR = (
    "floor(((ck - (s1 / n) * (sh + st) + cnt * (s1 / n) * (s1 / n))"
    " / (s2 - n * (s1 / n) * (s1 / n)))"
    " * 1e6 + 0.5) / 1e6"
)


@register(
    "q_ts_autocorr",
    oracle=f"""
WITH hourly AS (
    SELECT user_id, date_trunc('hour', ts) AS h,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
    FROM events GROUP BY 1, 2
), lagged AS (
    SELECT user_id, v,
           lag(v, 1)  OVER (PARTITION BY user_id ORDER BY h) AS l1,
           lag(v, 24) OVER (PARTITION BY user_id ORDER BY h) AS l24
    FROM hourly
), g AS (
    SELECT user_id,
           count(*) AS n,
           CAST(sum(v) AS BIGINT) AS s1,
           CAST(sum(v * v) AS BIGINT) AS s2,
           CAST(sum(CASE WHEN l1 IS NOT NULL THEN v * l1 END) AS BIGINT) AS ck1,
           CAST(sum(CASE WHEN l1 IS NOT NULL THEN v END) AS BIGINT) AS sh1,
           CAST(sum(CASE WHEN l1 IS NOT NULL THEN l1 END) AS BIGINT) AS st1,
           count(l1) AS cnt1,
           CAST(sum(CASE WHEN l24 IS NOT NULL THEN v * l24 END) AS BIGINT) AS ck24,
           CAST(sum(CASE WHEN l24 IS NOT NULL THEN v END) AS BIGINT) AS sh24,
           CAST(sum(CASE WHEN l24 IS NOT NULL THEN l24 END) AS BIGINT) AS st24,
           count(l24) AS cnt24
    FROM lagged GROUP BY user_id
)
SELECT user_id, n,
       {_ACF_EXPR.replace("ck", "ck1").replace("sh", "sh1").replace("st", "st1").replace("cnt", "cnt1")} AS acf_lag1,
       {_ACF_EXPR.replace("ck", "ck24").replace("sh", "sh24").replace("st", "st24").replace("cnt", "cnt24")} AS acf_lag24
FROM g WHERE n > 48 AND n * s2 - s1 * s1 > 0
""",
)
def q_ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-24 autocorrelation of each user's hourly series —
    the short-memory vs daily-seasonality signal pair feeding
    forecasting/anomaly baselines. All sufficient statistics are exact
    BIGINT sums over the lag-paired rows (one window pass for both lag
    columns, one hash aggregate); the standard full-series-centered
    ACF estimator then derives through the byte-identical _ACF_EXPR
    text in both engines, quantized to 1e-6. Degenerate users (short
    or constant series) are excluded by an INTEGER predicate so the
    population is engine-identical. Tick-based lags like q_ts_ewma
    (observed hours; gap-fill spine for wall-clock lags)."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("v"))
    w = W.partitionBy("user_id").orderBy("h")
    lagged = hourly.select(
        "user_id",
        "v",
        F.lag("v", 1).over(w).alias("l1"),
        F.lag("v", 24).over(w).alias("l24"),
    )
    g = lagged.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.expr("v * v")).alias("s2"),
        F.sum(F.expr("CASE WHEN l1 IS NOT NULL THEN v * l1 END")).alias("ck1"),
        F.sum(F.expr("CASE WHEN l1 IS NOT NULL THEN v END")).alias("sh1"),
        F.sum(F.expr("CASE WHEN l1 IS NOT NULL THEN l1 END")).alias("st1"),
        F.count("l1").alias("cnt1"),
        F.sum(F.expr("CASE WHEN l24 IS NOT NULL THEN v * l24 END")).alias("ck24"),
        F.sum(F.expr("CASE WHEN l24 IS NOT NULL THEN v END")).alias("sh24"),
        F.sum(F.expr("CASE WHEN l24 IS NOT NULL THEN l24 END")).alias("st24"),
        F.count("l24").alias("cnt24"),
    )
    sub = {"ck": "ck{k}", "sh": "sh{k}", "st": "st{k}", "cnt": "cnt{k}"}

    def acf(k: int) -> str:
        out = _ACF_EXPR
        for a, b in sub.items():
            out = out.replace(a, b.format(k=k))
        return out

    return g.where(
        (F.col("n") > 48) & (F.expr("n * s2 - s1 * s1") > 0)
    ).selectExpr(
        "user_id", "n", f"{acf(1)} AS acf_lag1", f"{acf(24)} AS acf_lag24"
    )


ROLLQ_FRAME = 25  # rolling-median frame width (rows)


@register(
    "q_ts_rolling_median",
    oracle=f"""
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN {ROLLQ_FRAME - 1} PRECEDING AND CURRENT ROW)
           / 100.0 AS rolling_median
FROM events
""",
)
def q_ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median of each user's value over the trailing
    {ROLLQ_FRAME}-row frame — the robust-baseline smoother (outlier-
    insensitive where the moving AVERAGE family isn't). Exact
    cross-engine: the median interpolates between integer cents, so
    every output is k.0 or k.5 cents — binary-exact doubles in both
    engines (Spark `percentile` and DuckDB `quantile_cont` use the
    same (1-d)·a + d·b rule, and d here is only ever 0 or 0.5). One
    shuffle on user_id; the frame evaluation is Spark's sliding
    aggregate buffer, O(rows·frame) worst case but frame-bounded —
    never the O(rows²) UNBOUNDED FOLLOWING trap."""
    e = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLLQ_FRAME - 1), W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.expr("percentile(vc, 0.5)").over(w) / 100.0).alias("rolling_median"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest
# ---------------------------------------------------------------------------

DAY_US = 86_400_000_000

# per-pair sMAPE quantized to integer micro-units BEFORE aggregation
# (shuffle-order-independent sum; the EWMA quantize-then-sum discipline),
# shared expression text so both engines state the identical arithmetic
_SMAPE_EXPR = (
    "CASE WHEN vc = 0 AND vhat = 0 THEN 0"
    " ELSE floor((2 * 1e6 * abs(vc - vhat)) / (abs(vc) + abs(vhat)) + 0.5) END"
)


@register(
    "q_ts_forecast_backtest",
    oracle=f"""
WITH hourly AS (
    SELECT user_id, epoch_us(date_trunc('hour', ts)) AS hus,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
    FROM events GROUP BY 1, 2
), j AS (
    SELECT a.user_id, a.vc, b.vc AS vhat
    FROM hourly a LEFT JOIN hourly b
      ON a.user_id = b.user_id AND b.hus = a.hus - {DAY_US}
)
SELECT user_id,
       count(*) AS n_hours,
       count(vhat) AS n_forecasts,
       CAST(sum(abs(vc - vhat)) AS BIGINT) / count(vhat) / 100.0 AS mae,
       CAST(sum({_SMAPE_EXPR}) AS BIGINT) / count(vhat) / 1e6 AS smape
FROM j GROUP BY user_id
""",
)
def q_ts_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest per user: predict each hour's
    value as the value 24 WALL-CLOCK hours earlier (the standard
    baseline every real forecaster must beat) and score MAE and sMAPE
    over the hours where a prediction exists. The lag is a wall-clock
    equi-join on epoch-µs hour keys, NOT lag(24) over observed rows —
    with gaps those differ, and the join form keeps the semantics
    honest. Only the first aggregate's map side touches event-grain
    rows; the self-join and the final aggregate exchange HOURLY-grain
    data (three small shuffles, not one big one). The hourly frame
    feeds both sides of the join, so it is persisted once (no
    cross-branch CSE). Errors are exact integer cents; per-pair sMAPE
    is quantized
    to integer micro-units before the sum, so both metrics are
    reproducible under any partitioning. Users with no 24h-separated
    pairs report NULL metrics rather than dropping out."""
    e = table(spark, sf_dir, "events")
    hourly = tracked_persist(
        e.groupBy(
            "user_id",
            F.unix_micros(F.date_trunc("hour", "ts")).alias("hus"),
        ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("vc"))
    )
    pred = hourly.select(
        "user_id",
        (F.col("hus") + F.lit(DAY_US)).alias("hus"),
        F.col("vc").alias("vhat"),
    )
    j = hourly.join(pred, ["user_id", "hus"], "left")
    return j.groupBy("user_id").agg(
        F.count("*").alias("n_hours"),
        F.count("vhat").alias("n_forecasts"),
        (F.sum(F.abs(F.col("vc") - F.col("vhat"))) / F.count("vhat") / 100.0).alias("mae"),
        (F.sum(F.expr(_SMAPE_EXPR)) / F.count("vhat") / 1e6).alias("smape"),
    )


# ---------------------------------------------------------------------------
# STL-style decomposition (trend / seasonal / residual)
# ---------------------------------------------------------------------------

# shared scalar texts (both engines evaluate the IDENTICAL expression
# tree): trend = one int/int division; the detrended value is quantized
# to integer 1e-4-cent units BEFORE the seasonal aggregation, so the
# only order-sensitive float op happens per row on identical inputs
_TREND_EXPR = "fsum / fcnt"
_DQ_EXPR = f"CAST(floor((vc - {_TREND_EXPR}) * 1e4 + 0.5) AS BIGINT)"
# 1e2, never 100.0, inside shared text: Spark parses bare decimal
# literals as DECIMAL while DuckDB reads DOUBLE (CLAUDE.md gotcha)
_SEASONAL_EXPR = "sdq / sc / 1e4 / 1e2"
_RESIDUAL_EXPR = "(dq / 1e4 - sdq / sc / 1e4) / 1e2"


@register(
    "q_ts_stl_decompose",
    oracle=f"""
WITH hourly AS (
    SELECT user_id, epoch_us(date_trunc('hour', ts)) AS hus,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
    FROM events GROUP BY 1, 2
), t AS (
    SELECT user_id, hus, vc,
           CAST(sum(vc) OVER w AS BIGINT) AS fsum,
           count(*) OVER w AS fcnt
    FROM hourly
    WINDOW w AS (PARTITION BY user_id ORDER BY hus
                 ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
), d AS (
    SELECT user_id, hus, vc, {_TREND_EXPR} AS trend, {_DQ_EXPR} AS dq
    FROM t
), s AS (
    SELECT user_id, hus, vc, trend, dq,
           CAST(sum(dq) OVER hw AS BIGINT) AS sdq,
           count(*) OVER hw AS sc
    FROM d
    WINDOW hw AS (PARTITION BY user_id, (hus // 3600000000) % 24)
)
SELECT user_id, hus AS hour_us, vc / 100.0 AS hour_value,
       trend / 100.0 AS trend,
       {_SEASONAL_EXPR} AS seasonal,
       {_RESIDUAL_EXPR} AS residual
FROM s
""",
)
def q_ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style decomposition of each user's hourly series into trend
    (centered 25-observation moving average — a bounded ROWS frame,
    never the quadratic UNBOUNDED-FOLLOWING trap), daily seasonal
    (hour-of-day mean of the detrended values), and residual. The
    determinism discipline is the EWMA one: sums stay exact BIGINTs
    inside every window frame; each division happens once per row on
    identical operands; the detrended value is quantized to integer
    1e-4-cent units BEFORE the seasonal mean so that aggregation is
    shuffle-order independent. Two shuffles at hourly grain (user_id
    for the trend frame, (user_id, hour-of-day) for the seasonal one).
    Trend ramps at series edges (frame truncates — the standard
    convention) and the seasonal mean inherits those rows; both
    engines state the same convention so the hash is exact."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id",
        F.unix_micros(F.date_trunc("hour", "ts")).alias("hus"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("vc"))
    wt = (
        W.partitionBy("user_id")
        .orderBy("hus")
        .rowsBetween(-12, 12)
    )
    t = hourly.select(
        "user_id",
        "hus",
        "vc",
        F.sum("vc").over(wt).alias("fsum"),
        F.count("*").over(wt).alias("fcnt"),
    )
    d = t.select(
        "user_id",
        "hus",
        "vc",
        F.expr(_TREND_EXPR).alias("trend"),
        F.expr(_DQ_EXPR).alias("dq"),
    )
    hw = W.partitionBy("user_id", F.expr("(hus div 3600000000) % 24"))
    s = d.select(
        "user_id",
        "hus",
        "vc",
        "trend",
        "dq",
        F.sum("dq").over(hw).alias("sdq"),
        F.count("*").over(hw).alias("sc"),
    )
    return s.select(
        "user_id",
        F.col("hus").alias("hour_us"),
        (F.col("vc") / 100.0).alias("hour_value"),
        (F.col("trend") / 100.0).alias("trend"),
        F.expr(_SEASONAL_EXPR).alias("seasonal"),
        F.expr(_RESIDUAL_EXPR).alias("residual"),
    )


# ---------------------------------------------------------------------------
# Holt-Winters (additive): deterministic level + trend + seasonal
# ---------------------------------------------------------------------------

# Brown's identity makes the recursive smoother oracle-safe: with a
# common α, Holt's level/trend equal algebraic combinations of a single
# and a double exponential smoothing of the (deseasonalized) series —
#   level = 2·S' − S''      trend = (α/(1−α))·(S' − S'') = (S'−S'')/3
# so the whole method reduces to TWO truncated-exact-weight EWMAs
# (the q_ts_ewma discipline) plus integer arithmetic. S' is quantized
# to integer cents before feeding S'' — the one precision trade the
# discipline demands — and every cross-term sum stays exact BIGINT.
_HW_NUM1, _HW_DEN1 = _ewma_terms("d")  # pass 1: deseasonalized cents
_HW_NUM2, _HW_DEN2 = _ewma_terms("e")  # pass 2: over quantized S' cents
_HW_S1_EXPR = f"CAST(floor((({_HW_NUM1}) / ({_HW_DEN1})) + 0.5) AS BIGINT)"
_HW_S2_EXPR = f"CAST(floor((({_HW_NUM2}) / ({_HW_DEN2})) + 0.5) AS BIGINT)"


def _hw_text(idiv: str) -> dict[str, str]:
    """Shared Holt-Winters scalar texts; `idiv` is the integer-division
    spelling (`div` Spark, `//` DuckDB — same truncation toward zero,
    CLAUDE.md gotcha). Everything else is engine-identical text."""
    return {
        # additive seasonal index: hod mean − overall mean, both as
        # half-up integer cent averages ((2S+n) div (2n))
        "seas": (
            f"(2 * s_hod + n_hod) {idiv} (2 * n_hod)"
            f" - (2 * s_all + n_all) {idiv} (2 * n_all)"
        ),
        # one-step-ahead in-sample forecast: ŷ_t = l_{t-1} + b_{t-1}
        # + s(hod_t); the trend third rounds half-up via floor(x+0.5)
        # — sign-safe (trend is routinely NEGATIVE, where `div`
        # truncation would bias the forecast toward zero; the
        # (2S+n) div (2n) idiom is positive-only, rounding.py)
        "fc": (
            "(prev_level + CAST(floor(prev_tr3 / 3e0 + 0.5) AS BIGINT)"
            " + seas_c) / 1e2"
        ),
    }


_HW_LAG1 = ", ".join(
    f"lag(d_c, {j}) OVER (PARTITION BY user_id ORDER BY hus) AS d{j}"
    for j in range(EWMA_LAGS + 1)
)
_HW_LAG2 = ", ".join(
    f"lag(s1_c, {j}) OVER (PARTITION BY user_id ORDER BY hus) AS e{j}"
    for j in range(EWMA_LAGS + 1)
)
_HW_O = _hw_text("//")


# shared with the real-stream twin (streaming/twins.q_stream_holt_winters),
# which must emit the IDENTICAL rows under incremental evaluation
HW_ORACLE = f"""
WITH hourly AS (
    SELECT user_id, epoch_us(date_trunc('hour', ts)) AS hus,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vc
    FROM events GROUP BY 1, 2
), seas AS (
    SELECT user_id, hus, vc,
           CAST(sum(vc) OVER hw AS BIGINT) AS s_hod,
           count(*) OVER hw AS n_hod,
           CAST(sum(vc) OVER uw AS BIGINT) AS s_all,
           count(*) OVER uw AS n_all
    FROM hourly
    WINDOW hw AS (PARTITION BY user_id, (hus // 3600000000) % 24),
           uw AS (PARTITION BY user_id)
), des AS (
    SELECT user_id, hus, vc, {_HW_O["seas"]} AS seas_c FROM seas
), dd AS (
    SELECT *, vc - seas_c AS d_c FROM des
), lag1 AS (
    SELECT user_id, hus, vc, seas_c, {_HW_LAG1} FROM dd
), s1 AS (
    SELECT user_id, hus, vc, seas_c, {_HW_S1_EXPR} AS s1_c FROM lag1
), lag2 AS (
    SELECT user_id, hus, vc, seas_c, s1_c, {_HW_LAG2} FROM s1
), s2 AS (
    SELECT user_id, hus, vc, seas_c, s1_c, {_HW_S2_EXPR} AS s2_c FROM lag2
), st AS (
    SELECT user_id, hus, vc, seas_c,
           2 * s1_c - s2_c AS level_c, s1_c - s2_c AS tr3 FROM s2
), fin AS (
    SELECT *,
           lag(level_c, 1) OVER (PARTITION BY user_id ORDER BY hus) AS prev_level,
           lag(tr3, 1) OVER (PARTITION BY user_id ORDER BY hus) AS prev_tr3
    FROM st
)
SELECT user_id, hus AS hour_us, vc / 1e2 AS hour_value,
       seas_c / 1e2 AS seasonal, level_c / 1e2 AS level,
       tr3 / 3e2 AS trend, {_HW_O["fc"]} AS forecast
FROM fin
"""


@register("q_ts_holt_winters", oracle=HW_ORACLE)
def q_ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters smoothing of each user's hourly series —
    level, trend, seasonal index, and the one-step-ahead in-sample
    forecast ŷ_t = l_(t-1) + b_(t-1) + s(hod_t) — made bit-reproducible
    (the round-7 backlog's 'deterministic Holt-Winters' item). The
    recursive textbook form is a float fold (order-dependent, useless
    cross-engine); this uses the decomposition route every engine can
    agree on:

    1. additive seasonal index per (user, hour-of-day): half-up integer
       cent means, hod mean − overall mean — two full-partition window
       aggregates, no self-join (the hourly frame is referenced ONCE);
    2. deseasonalize in exact cents;
    3. Brown's identity: level = 2S'−S'', trend = (S'−S'')/3 where S'
       and S'' are truncated-exact-weight EWMAs (α=1/4, 20 lags — the
       q_ts_ewma template), S' quantized to integer cents before S''
       consumes it so both passes sum exact BIGINTs;
    4. forecast from integer state, the trend third quantized half-up
       with the sign-safe floor(x+0.5) idiom; first observation per
       user has no prior state ⇒ NULL forecast (both engines state
       the same convention).

    Three hourly-grain shuffles — (user, hod) for the seasonal frame,
    then user for the overall mean, reused by all four ordered lag
    windows (Catalyst collapses them onto one sort). 100 TB: state is
    the 21-lag window per user — the same bounded-history shape the
    streaming EWMA twin carries, so a streaming Holt-Winters twin
    needs only O(users·lags) state."""
    s = _hw_text("div")
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id",
        F.unix_micros(F.date_trunc("hour", "ts")).alias("hus"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("vc"))
    hw = W.partitionBy("user_id", F.expr("(hus div 3600000000) % 24"))
    uw = W.partitionBy("user_id")
    ow = W.partitionBy("user_id").orderBy("hus")
    seas = hourly.select(
        "user_id",
        "hus",
        "vc",
        F.sum("vc").over(hw).alias("s_hod"),
        F.count("*").over(hw).alias("n_hod"),
        F.sum("vc").over(uw).alias("s_all"),
        F.count("*").over(uw).alias("n_all"),
    )
    des = seas.select("user_id", "hus", "vc", F.expr(s["seas"]).alias("seas_c"))
    dd = des.withColumn("d_c", F.col("vc") - F.col("seas_c"))
    lag1 = dd.select(
        "user_id",
        "hus",
        "vc",
        "seas_c",
        *[F.lag("d_c", j).over(ow).alias(f"d{j}") for j in range(EWMA_LAGS + 1)],
    )
    s1 = lag1.select(
        "user_id", "hus", "vc", "seas_c", F.expr(_HW_S1_EXPR).alias("s1_c")
    )
    lag2 = s1.select(
        "user_id",
        "hus",
        "vc",
        "seas_c",
        "s1_c",
        *[F.lag("s1_c", j).over(ow).alias(f"e{j}") for j in range(EWMA_LAGS + 1)],
    )
    s2 = lag2.select(
        "user_id", "hus", "vc", "seas_c", "s1_c", F.expr(_HW_S2_EXPR).alias("s2_c")
    )
    st = s2.select(
        "user_id",
        "hus",
        "vc",
        "seas_c",
        (2 * F.col("s1_c") - F.col("s2_c")).alias("level_c"),
        (F.col("s1_c") - F.col("s2_c")).alias("tr3"),
    )
    fin = st.select(
        "*",
        F.lag("level_c", 1).over(ow).alias("prev_level"),
        F.lag("tr3", 1).over(ow).alias("prev_tr3"),
    )
    return fin.select(
        "user_id",
        F.col("hus").alias("hour_us"),
        (F.col("vc") / F.lit(1e2)).alias("hour_value"),
        (F.col("seas_c") / F.lit(1e2)).alias("seasonal"),
        (F.col("level_c") / F.lit(1e2)).alias("level"),
        (F.col("tr3") / F.lit(3e2)).alias("trend"),
        F.expr(s["fc"]).alias("forecast"),
    )
