"""Window-function operators (SURVEY.md §2B "Window functions").

The CDC core is itself window-powered (latest-per-key = row_number
over key/seq — operators/cdc.py); this family is the full analytic
window surface.

Scale notes (100 TB): a window = one shuffle on partitionBy keys + an
in-partition sort. Every query here partitions on a real key (never an
empty partitionBy, which would funnel 100 TB through one task — the
single global-ordering exception is documented in sort/limit, not
here). Frames are explicit everywhere: Spark's default frame with an
ORDER BY is RANGE UNBOUNDED PRECEDING..CURRENT ROW, which silently
differs from ROWS on ties — stating frames avoids that class of bug.
All rank-like outputs are made deterministic with full tie-break keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.rounding import avg_div, cents
from ..registry import register
from ..sources import table


@register(
    "q_win_rank",
    oracle="""
SELECT o_custkey, o_orderkey,
       row_number() OVER w AS rn,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank per customer by price; o_orderkey
    tie-break makes row_number deterministic."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@register(
    "q_win_lag_lead",
    oracle="""
SELECT event_id, user_id,
       round(value, 2)                    AS value,
       round(lag(value)  OVER w, 2)       AS prev_value,
       round(lead(value) OVER w, 2)       AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
""",
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next event value per user, ordered by the unique seq."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
    )


@register(
    "q_win_moving_avg",
    oracle="""
SELECT event_id, user_id,
       ((2 * sum(CAST(round(value * 100) AS BIGINT)) OVER w + count(*) OVER w)
        // (2 * count(*) OVER w)) / 100.0 AS mavg3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def q_win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average (explicit ROWS frame). Fixed-point sum over
    the frame (functions/rounding.py): a 3-value decimal average ties at
    .xx5 about 1-in-30 rows, where float rounding is engine-dependent."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
    return (
        e.select(
            "event_id",
            "user_id",
            F.sum(cents("value")).over(w).alias("svc"),
            F.count("*").over(w).alias("nw"),
        )
        .select("event_id", "user_id", avg_div("svc", "nw").alias("mavg3"))
    )


@register(
    "q_win_cumulative",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_total
FROM orders
""",
)
def q_win_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum by date with a RANGE frame: peer rows (same orderdate)
    share the cumulative value, which keeps the result deterministic
    even though o_orderdate has duplicates."""
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "q_win_ntile_firstlast",
    oracle="""
SELECT c_custkey,
       ntile(4) OVER w AS quartile,
       round(first_value(c_acctbal) OVER w, 2) AS min_bal,
       round(last_value(c_acctbal)  OVER (PARTITION BY c_mktsegment
                                          ORDER BY c_acctbal, c_custkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING), 2) AS max_bal
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
)
def q_win_ntile_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles + first/last value per segment. last_value needs the
    UNBOUNDED FOLLOWING frame (default frame stops at CURRENT ROW —
    the classic silent-wrong-answer)."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.first("c_acctbal").over(w), 2).alias("min_bal"),
        F.round(F.last("c_acctbal").over(wfull), 2).alias("max_bal"),
    )


@register(
    "q_win_range_numeric",
    oracle="""
SELECT event_id, user_id,
       count(*) OVER (PARTITION BY user_id ORDER BY event_id
                      RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS n_in_band,
       sum(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY event_id
                 RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) / 100.0 AS sum_band
FROM events
""",
)
def q_win_range_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE frame: all events whose seq lies within 10 of the
    current row's — a value-based band, not a row-count band (the
    frame width varies with seq density)."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id").rangeBetween(-10, 0)
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_in_band"),
        (F.sum(cents("value")).over(w) / 100.0).alias("sum_band"),
    )


@register(
    "q_win_topk_per_group",
    oracle="""
SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price
FROM (
    SELECT p_brand, p_partkey, p_retailprice,
           row_number() OVER (PARTITION BY p_brand
                              ORDER BY p_retailprice DESC, p_partkey) AS rn
    FROM part
) WHERE rn <= 3
""",
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand: rank-and-filter. At scale Catalyst rewrites
    rn<=k into a per-partition top-k (WindowGroupLimit) so no full sort
    of each group materializes."""
    p = table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), "p_partkey")
    return (
        p.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", F.round("p_retailprice", 2).alias("price"))
    )


@register(
    "q_win_cume_dist",
    oracle="""
SELECT o_orderkey,
       o_orderpriority,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
       cume_dist() OVER (PARTITION BY o_orderpriority
                         ORDER BY CAST(round(o_totalprice * 100) AS BIGINT))
           AS cd
FROM orders
""",
)
def q_win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distribution within priority class — the empirical
    CDF position of every order's price. cume_dist is tie-stable by
    definition (peers ≤ current / n, a ratio of exact integers), so
    ordering by integer cents makes the doubles engine-identical even
    where prices tie; one shuffle on the partition key."""
    o = table(spark, sf_dir, "orders")
    pc = F.round(F.col("o_totalprice") * 100).cast("bigint")
    w = W.partitionBy("o_orderpriority").orderBy(pc)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        pc.alias("price_c"),
        F.cume_dist().over(w).alias("cd"),
    )


@register(
    "q_win_trailing_hour",
    oracle="""
WITH e AS (
    SELECT event_id, user_id, epoch_us(ts) AS us,
           CAST(round(value * 100) AS BIGINT) AS vc
    FROM events
)
SELECT event_id, user_id, us AS ts_us,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing,
       CAST(sum(vc) OVER w AS BIGINT) / 100.0 AS trailing_value
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def q_win_trailing_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per event, the count and exact cent-sum
    of the user's events in the trailing hour [t-1h, t] — the sliding
    aggregate rate-limiting, fraud scoring, and feature pipelines ask
    for, expressed as a VALUE-based frame over epoch-µs (q_win_range_
    numeric's time twin; contrast the ROWS frames of moving_avg). A
    RANGE frame ends at the last PEER of the current row in both
    engines, so tied timestamps contribute identically regardless of
    intra-tie order — deterministic without an event_id tiebreak. One
    shuffle on user_id; at 100 TB the frame scan is the sort's
    sequential pass, no per-row rescans (bounded by events-per-hour)."""
    e = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.col("us").alias("ts_us"),
        F.count("*").over(w).alias("n_trailing"),
        (F.sum("vc").over(w) / 100.0).alias("trailing_value"),
    )
