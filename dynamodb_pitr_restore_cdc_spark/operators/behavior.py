"""Behavioral event analytics: sessionization, funnel conversion,
cohort retention, and linear gap interpolation — the event-stream
query family a CDC/metrics pipeline feeds (the reference's changelog
consumers are exactly this kind of downstream, `README.md` restore
flow; our `events` table is the live-stream twin).

All four are single-scan, windowed or partially-aggregated shapes:

- sessionize: one shuffle on user; the 30-min-gap boundary + running
  sum is two window passes over the SAME (user, ts) ordering, then the
  session rollup rides the same partitioning.
- funnel: zero joins — stage times are chained conditional window
  minima over the user partition (stage N's min is conditioned on
  stage N-1's column), then ONE global aggregate; the classic
  join-per-stage formulation would rescan the fact once per stage.
- cohort: the per-customer first-order month is a window min (single
  scan — not the groupBy + self-join twin, which reads the fact
  twice), then count-distinct at (cohort, age) grain.
- interpolate: the gap-fill spine, then prev/next known values via
  IGNORE NULLS window frames; the lerp is exact integer math (cents ×
  hour deltas, round-half-up via (2·num + den) div (2·den)) so both
  engines emit identical doubles.

Scale (100 TB): every shape is one hash shuffle on its natural key
(user / customer) plus map-side work; no self-joins, no driver
collection, no Python. Session/funnel windows stream within a
partition — skewed users (bots) are the hazard; cap-by-user upstream
or salt the rollup if one user exceeds a task's memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.rounding import avg_div
from ..registry import register, tracked_checkpoint
from ..sources import table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity boundary

# shared with the real-stream twin (streaming/twins.q_stream_sessionize),
# which must produce the IDENTICAL result — batch/stream parity is the
# contract, so both registrations carry the same oracle text
SESSIONIZE_ORACLE = f"""
WITH o AS (
    SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS value_c,
           CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL THEN 1
                WHEN epoch_us(ts) - lag(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > {SESSION_GAP_US} THEN 1
                ELSE 0 END AS new_s
    FROM events
), s AS (
    SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS session_id
    FROM o
)
SELECT user_id, session_id,
       min(epoch_us(ts)) AS start_us,
       max(epoch_us(ts)) AS end_us,
       count(*) AS n_events,
       CAST(sum(value_c) AS BIGINT) / 100.0 AS session_value
FROM s GROUP BY user_id, session_id
"""


@register("q_ts_sessionize", oracle=SESSIONIZE_ORACLE)
def q_ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after >30 min of
    user inactivity; session ids are the running count of boundaries.
    Both window passes and the final rollup share one (user_id) hash
    partitioning — a single shuffle end-to-end. Ordering is total via
    the (ts, event_id) tie-break, so session ids are deterministic
    under task retries."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("bigint").alias("value_c"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    bounded = e.withColumn(
        "new_s",
        F.when(F.lag("us").over(w).isNull(), 1)
        .when(F.col("us") - F.lag("us").over(w) > SESSION_GAP_US, 1)
        .otherwise(0),
    )
    sessions = bounded.withColumn("session_id", F.sum("new_s").over(wrun))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        F.count("*").alias("n_events"),
        (F.sum("value_c") / 100.0).alias("session_value"),
    )


_FUNNEL_STAGES = ("signup", "view", "click", "purchase")


@register(
    "q_ts_funnel",
    oracle="""
WITH e AS (
    SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), s1 AS (
    SELECT *, min(CASE WHEN event_type = 'signup' THEN us END)
              OVER (PARTITION BY user_id) AS t1 FROM e
), s2 AS (
    SELECT *, min(CASE WHEN event_type = 'view' AND us > t1 THEN us END)
              OVER (PARTITION BY user_id) AS t2 FROM s1
), s3 AS (
    SELECT *, min(CASE WHEN event_type = 'click' AND us > t2 THEN us END)
              OVER (PARTITION BY user_id) AS t3 FROM s2
), s4 AS (
    SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t3 THEN us END)
              OVER (PARTITION BY user_id) AS t4 FROM s3
), agg AS (
    SELECT count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS n1,
           count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS n2,
           count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS n3,
           count(DISTINCT CASE WHEN t4 IS NOT NULL THEN user_id END) AS n4
    FROM s4
)
SELECT stage, stage_no, n_users,
       CASE WHEN n1 = 0 THEN 0.0
            ELSE ((10000 * n_users) // n1) / 100.0 END AS conv_pct
FROM (
    SELECT 'signup' AS stage, 1 AS stage_no, n1 AS n_users, n1 FROM agg
    UNION ALL SELECT 'view', 2, n2, n1 FROM agg
    UNION ALL SELECT 'click', 3, n3, n1 FROM agg
    UNION ALL SELECT 'purchase', 4, n4, n1 FROM agg
)
""",
)
def q_ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion signup→view→click→purchase: a user
    reaches stage N only via an event STRICTLY AFTER their stage-N-1
    time. Stage times are chained conditional window minima over the
    user partition — one scan, one shuffle, zero joins (the textbook
    join-per-stage plan rescans the fact 4×). The final global
    aggregate is one row, reshaped to per-stage rows with stack();
    conversion is integer-exact (basis points via div)."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    wu = W.partitionBy("user_id")
    staged = e
    prev = None
    for i, stage in enumerate(_FUNNEL_STAGES, start=1):
        cond = F.col("event_type") == stage
        if prev is not None:
            cond = cond & (F.col("us") > F.col(prev))
        staged = staged.withColumn(
            f"t{i}", F.min(F.when(cond, F.col("us"))).over(wu)
        )
        prev = f"t{i}"
    # stage times are constant within a user: collapse to per-user
    # reached-flags on the SAME (user_id) partitioning the windows
    # already paid for (no new shuffle, no count-distinct expand), then
    # globally sum n_users-many tiny flag rows
    per_user = staged.groupBy("user_id").agg(
        *[
            F.max(F.col(f"t{i}").isNotNull().cast("bigint")).alias(f"r{i}")
            for i in range(1, 5)
        ]
    )
    agg = per_user.agg(
        *[F.sum(f"r{i}").alias(f"n{i}") for i in range(1, 5)]
    )
    stack_args = ", ".join(
        f"'{s}', {i}, n{i}, n1" for i, s in enumerate(_FUNNEL_STAGES, start=1)
    )
    return agg.select(
        F.expr(f"stack(4, {stack_args}) AS (stage, stage_no, n_users, n_first)")
    ).select(
        "stage",
        "stage_no",
        "n_users",
        F.when(F.col("n_first") == 0, F.lit(0.0))
        .otherwise(F.expr("(10000 * n_users) div n_first") / 100.0)
        .alias("conv_pct"),
    )


@register(
    "q_ts_cohort_retention",
    oracle="""
WITH f AS (
    SELECT o_custkey, o_orderdate,
           min(o_orderdate) OVER (PARTITION BY o_custkey) AS first_dt
    FROM orders
)
SELECT strftime(first_dt, '%Y-%m') AS cohort_month,
       datediff('month', date_trunc('month', first_dt),
                date_trunc('month', o_orderdate)) AS months_since,
       count(DISTINCT o_custkey) AS n_customers
FROM f
GROUP BY 1, 2
""",
)
def q_ts_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: customers bucketed by first-order
    month, counted at each month-age they ordered again. The
    per-customer first order is a window min — ONE scan of the fact
    (the groupBy-then-self-join twin reads it twice); the retention
    grid is a count-distinct at (cohort, age) grain. Month arithmetic
    on truncated dates is exact integers in both engines."""
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    first_dt = F.min("o_orderdate").over(W.partitionBy("o_custkey"))
    aged = o.select(
        "o_custkey",
        F.date_format(first_dt, "yyyy-MM").alias("cohort_month"),
        F.months_between(
            F.date_trunc("month", "o_orderdate"), F.date_trunc("month", first_dt)
        )
        .cast("bigint")
        .alias("months_since"),
    )
    return aged.groupBy("cohort_month", "months_since").agg(
        F.countDistinct("o_custkey").alias("n_customers")
    )


@register(
    "q_ts_interpolate_linear",
    oracle="""
WITH hourly AS (
    SELECT user_id, date_trunc('hour', ts) AS h,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT user_id, min(h) AS h_min, max(h) AS h_max FROM hourly GROUP BY user_id
), spine AS (
    SELECT user_id, unnest(generate_series(h_min, h_max, INTERVAL 1 HOUR)) AS h
    FROM bounds
), joined AS (
    SELECT s.user_id, s.h, epoch_us(s.h) // 3600000000 AS hx, hr.value_c
    FROM spine s LEFT JOIN hourly hr ON s.user_id = hr.user_id AND s.h = hr.h
), ctx AS (
    SELECT user_id, h, hx, value_c,
           last_value(value_c IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY hx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_c,
           last_value(CASE WHEN value_c IS NOT NULL THEN hx END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY hx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_x,
           first_value(value_c IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY hx
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_c,
           first_value(CASE WHEN value_c IS NOT NULL THEN hx END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY hx
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_x
    FROM joined
)
SELECT user_id, epoch_us(h) AS hour_us,
       (value_c IS NOT NULL) AS observed,
       CASE WHEN value_c IS NOT NULL THEN value_c
            ELSE (2 * (prev_c * (next_x - hx) + next_c * (hx - prev_x))
                  + (next_x - prev_x)) // (2 * (next_x - prev_x))
       END / 100.0 AS value_interp
FROM ctx
""",
)
def q_ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across hourly gaps: the gap-fill spine, then
    the previous/next OBSERVED hour via IGNORE NULLS window frames and
    an exact integer lerp (cents scaled by hour offsets, round-half-up
    as (2·num + den) div (2·den) — identical truncation semantics in
    Spark `div` and DuckDB `//`). Spine bounds are each user's observed
    min/max hour, so every gap is interior and prev/next always exist.
    One shuffle on user shared by the spine join and both window
    frames."""
    e = table(spark, sf_dir, "events")
    # referenced by TWO plan branches (spine-bounds derivation and the
    # left join) — materialize so the events scan + hash aggregate runs
    # once, not twice (Catalyst has no cross-branch CSE). An eager
    # localCheckpoint, not a lazy persist: under a long bench session
    # this query's persist drifted to ~1.9 s median vs ~1.5 s for the
    # checkpoint (A/B measured round 7, closing the verdict's
    # dispersion watch) — the checkpoint also cuts the downstream
    # plan's double-branch lineage outright.
    hourly = tracked_checkpoint(
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("h")).agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_c")
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
    joined = spine.join(hourly, ["user_id", "h"], "left").select(
        "user_id",
        "h",
        F.expr("unix_micros(h) div 3600000000").alias("hx"),
        "value_c",
    )
    # Both context directions use RUNNING (unboundedPreceding →
    # currentRow) frames: Spark's UnboundedFollowing frame re-scans
    # from each row to the partition end — O(rows²) per partition,
    # measured 19 s vs 0.9 s for the sibling gap-fill at sf0.1 — while
    # the running frame is incremental O(rows). "Next observed" is
    # therefore the running last-non-null over the REVERSED ordering,
    # which is the same value by symmetry.
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("hx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy("user_id")
        .orderBy(F.desc("hx"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    known_x = F.when(F.col("value_c").isNotNull(), F.col("hx"))
    ctx = joined.select(
        "user_id",
        "h",
        "hx",
        "value_c",
        F.last("value_c", ignorenulls=True).over(w_prev).alias("prev_c"),
        F.last(known_x, ignorenulls=True).over(w_prev).alias("prev_x"),
        F.last("value_c", ignorenulls=True).over(w_next).alias("next_c"),
        F.last(known_x, ignorenulls=True).over(w_next).alias("next_x"),
    )
    lerp_c = F.expr(
        "(2 * (prev_c * (next_x - hx) + next_c * (hx - prev_x))"
        " + (next_x - prev_x)) div (2 * (next_x - prev_x))"
    )
    return ctx.select(
        "user_id",
        F.unix_micros("h").alias("hour_us"),
        F.col("value_c").isNotNull().alias("observed"),
        (
            F.when(F.col("value_c").isNotNull(), F.col("value_c")).otherwise(lerp_c)
            / 100.0
        ).alias("value_interp"),
    )


# z-score derivation over exact integer cent sums — byte-identical
# text in both engines (same discipline as aggregates._MOM_OUT); the
# threshold compares the QUANTIZED score, so the anomaly predicate is
# engine-identical even at boundaries.
_Z_EXPR = (
    "floor(((v - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)))"
    " * 1e6 + 0.5) / 1e6"
)
Z_THRESHOLD = 2.5


# shared with the real-stream twin (streaming/twins.q_stream_anomaly_zscore)
ANOMALY_ZSCORE_ORACLE = f"""
WITH v AS (
    SELECT event_id, user_id, ts,
           CAST(round(value * 100) AS BIGINT) AS v
    FROM events
), s AS (
    SELECT *,
           count(*) OVER (PARTITION BY user_id) AS n,
           CAST(sum(v)   OVER (PARTITION BY user_id) AS BIGINT) AS s1,
           CAST(sum(v*v) OVER (PARTITION BY user_id) AS BIGINT) AS s2
    FROM v
), z AS (
    SELECT event_id, user_id, ts, v, {_Z_EXPR} AS zscore FROM s
)
SELECT event_id, user_id, epoch_us(ts) AS ts_us, v / 100.0 AS value,
       zscore
FROM z WHERE abs(zscore) > {Z_THRESHOLD}
"""


@register("q_ts_anomaly_zscore", oracle=ANOMALY_ZSCORE_ORACLE)
def q_ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user outlier detection: flag events whose value deviates
    more than 2.5 population standard deviations from that user's
    mean. Mean/σ derive from exact integer cent sums via one window
    pass over the user partition (single shuffle, no groupBy+join
    double scan), the z-score is the byte-identical float expression
    in both engines quantized to 1e-6, and the threshold compares the
    QUANTIZED value so the flag itself is engine-deterministic. The
    anomaly stream is the input to curation drops or alerting — at
    100 TB this is a map+window pass whose output is a tiny fraction
    of the input (write wins over re-scan)."""
    e = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    wu = W.partitionBy("user_id")
    s = e.select(
        "*",
        F.count("*").over(wu).alias("n"),
        F.sum("v").over(wu).alias("s1"),
        F.sum(F.expr("v*v")).over(wu).alias("s2"),
    )
    z = s.withColumn("zscore", F.expr(_Z_EXPR))
    return z.where(F.abs(F.col("zscore")) > Z_THRESHOLD).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("v") / 100.0).alias("value"),
        "zscore",
    )


@register(
    "q_ts_seasonal_profile",
    oracle="""
WITH t AS (
    SELECT event_type,
           CAST(strftime(ts, '%H') AS BIGINT) AS hour_of_day,
           CAST(round(value * 100) AS BIGINT) AS vc
    FROM events
)
SELECT event_type, hour_of_day,
       count(*) AS n_events,
       ((2 * CAST(sum(vc) AS BIGINT) + count(*)) // (2 * count(*))) / 100.0
           AS avg_value
FROM t GROUP BY 1, 2
""",
)
def q_ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type — the baseline that
    q_ts_autocorr's lag-24 signal justifies building: 24×types cells
    of exact integer counts and half-up-rounded cent averages. A plain
    partial-agg rollup (shuffle carries one row per cell per mapper);
    the profile table is the broadcast side of seasonal-adjustment
    joins downstream."""
    e = table(spark, sf_dir, "events")
    t = e.select(
        "event_type",
        F.date_format("ts", "HH").cast("bigint").alias("hour_of_day"),
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    return t.groupBy("event_type", "hour_of_day").agg(
        F.count("*").alias("n_events"),
        avg_div("sum(vc)", "count(*)").alias("avg_value"),
    )
