"""Join operators (SURVEY.md §2B "Joins").

The reference's only join-shaped op is the delete-application
(anti-join shape, lambda-backfill/main.py:38 + BatchWriteItem delete);
the full join family generalizes it for the analytic surface.

Scale notes (100 TB): fact⋈fact joins (orders⋈lineitem shapes) are
sort-merge on the shuffled key and benefit from AQE skew splitting;
dim joins are explicitly broadcast (`F.broadcast`) so the fact side
never shuffles. The as-of join is the classic union-trick — a single
shuffle on (key, ts) and one pass — never a per-row range probe, so
it scales as O((n+m) log) per partition rather than O(n·m).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import table


@register(
    "q_join_inner",
    oracle="""
SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment,
       round(o.o_totalprice, 2) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders⋈customer. Left to Catalyst/AQE: at test SF it
    picks broadcast-hash; at 100 TB (customer too big to broadcast) the
    same plan degrades gracefully to sort-merge on the shuffled key."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey",
        "c_custkey",
        "c_mktsegment",
        F.round("o_totalprice", 2).alias("total_price"),
    )


@register(
    "q_join_broadcast",
    oracle="""
SELECT n.n_nationkey, n.n_name, r.r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the 5-row region dim: zero shuffle of the
    probe side at any scale — the canonical small-dim pattern."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "q_join_left",
    oracle="""
SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
       round(coalesce(sum(o.o_totalprice), 0), 2) AS sum_total
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
""",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with null-extension: customers keep a row even with no
    orders (count=0). count(col) skips nulls in both engines."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("sum_total"),
        )
    )


@register(
    "q_join_full",
    oracle="""
SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
       (c.c_custkey IS NOT NULL) AS in_customer,
       count(o.o_orderkey) AS n_orders
FROM customer c FULL OUTER JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
""",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer with null-extension on both sides, coalesced key."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "full")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.col("c_custkey").isNotNull().alias("in_customer"),
            "o_orderkey",
        )
        .groupBy("custkey", "in_customer")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (EXISTS): customers with ≥1 order — no row multiplication,
    build side carries keys only."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti (NOT EXISTS): the delete-application shape of cdc_merge
    (A14) — snapshot rows whose key is NOT touched by the batch. The
    urgent-orders filter keeps the result non-degenerate at every SF
    (plain "no orders at all" is empty above sf0.001)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_theta_range",
    oracle="""
SELECT p.p_brand, count(*) AS n_lines,
       round(sum(l.l_extendedprice), 2) AS sum_price
FROM lineitem l JOIN part p
  ON l.l_partkey = p.p_partkey
 AND l.l_extendedprice BETWEEN p.p_retailprice * 10 AND p.p_retailprice * 40
GROUP BY p.p_brand
""",
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join: equi key + price-band range predicate. The
    equi component keeps it hash/merge-joinable — the range term is a
    post-join filter pushed into the join condition, NOT a cartesian
    product; this is the scalable way to express banded joins."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_extendedprice >= p.p_retailprice * 10)
        & (li.l_extendedprice <= p.p_retailprice * 40)
    )
    return (
        li.join(p, cond)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@register(
    "q_join_cross_limited",
    oracle="""
SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
""",
)
def q_join_cross_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two bounded dims (5×25). Cartesian products are only
    ever legal between broadcast-small inputs — never fact×fact."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


def asof_carried(e: DataFrame) -> DataFrame:
    """The union-trick as-of core shared by q_join_asof and
    q_join_asof_tolerance: tag signup refs and purchase probes, sort
    within user by (tsu, side) — side orders reference rows before
    probes at equal ts so `<=` semantics hold — and carry the LAST
    REFERENCE ROW forward as one struct. Carrying the whole (tsu,
    value) struct, not the value alone, matches ASOF-join semantics
    exactly: the newest at-or-before signup wins even when its value
    is NULL (two independent ignorenulls carries would pair an older
    value with a newer timestamp). One shuffle on the key, one sort,
    one pass: O((n+m) log) per partition, vs O(n·m) for a range join.
    Returns the probe rows with `asof` (struct tsu/ref_value) set."""
    probes = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.unix_micros("ts").alias("tsu"),
        F.lit(None).cast("double").alias("ref_value"),
        F.lit(1).alias("is_probe"),
        F.col("event_id"),
    )
    refs = e.where(F.col("event_type") == "signup").select(
        F.col("user_id"),
        F.unix_micros("ts").alias("tsu"),
        F.col("value").alias("ref_value"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("event_id"),
    )
    tagged = refs.unionByName(probes)
    w = (
        W.partitionBy("user_id")
        .orderBy("tsu", "is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ref_row = F.when(
        F.col("is_probe") == 0, F.struct(F.col("tsu"), F.col("ref_value"))
    )
    return (
        tagged.withColumn("asof", F.last(ref_row, ignorenulls=True).over(w))
        .where(F.col("is_probe") == 1)
    )


@register(
    "q_join_asof",
    oracle="""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     s AS (SELECT user_id, ts, value FROM events WHERE event_type = 'signup')
SELECT p.event_id, p.user_id,
       round(s.value, 2) AS last_signup_value
FROM p ASOF LEFT JOIN s
  ON p.user_id = s.user_id AND s.ts <= p.ts
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): for each purchase event, the
    value of that user's latest signup at-or-before the purchase.
    Core in asof_carried(); DuckDB's native ASOF JOIN is the oracle."""
    carried = asof_carried(table(spark, sf_dir, "events"))
    return carried.select(
        "event_id",
        "user_id",
        F.round(F.col("asof.ref_value"), 2).alias("last_signup_value"),
    )


@register(
    "q_join_shuffle_hash_hint",
    oracle="""
SELECT o.o_orderpriority,
       count(*) AS n_lines,
       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def q_join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy control: the same fact-to-fact join forced onto a
    SHUFFLED HASH join via hint (plan-pinned in tests/test_plans.py).
    Spark's default for two large sides is sort-merge; when one side
    fits per-partition memory after partitioning, a shuffled hash
    join skips BOTH sort phases — at 100 TB that's the right call for
    a large-but-hashable dimension (too big to broadcast, small
    enough per partition). The engine exposes all three strategies:
    broadcast (q_join_broadcast), sort-merge (the bucketed/colocated
    default), and shuffled hash (this hint)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").hint("shuffle_hash")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )


ASOF_TOLERANCE_US = 7 * 24 * 3600 * 1_000_000  # 7-day staleness bound


@register(
    "q_join_asof_tolerance",
    oracle=f"""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     s AS (SELECT user_id, ts, value FROM events WHERE event_type = 'signup')
SELECT p.event_id, p.user_id,
       CASE WHEN epoch_us(p.ts) - epoch_us(s.ts) <= {ASOF_TOLERANCE_US}
            THEN round(s.value, 2) END AS last_signup_value,
       CASE WHEN epoch_us(p.ts) - epoch_us(s.ts) <= {ASOF_TOLERANCE_US}
            THEN (epoch_us(p.ts) - epoch_us(s.ts)) // 3600000000 END AS staleness_hours
FROM p ASOF LEFT JOIN s
  ON p.user_id = s.user_id AND s.ts <= p.ts
""",
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS TOLERANCE — the production variant
    (pandas merge_asof's `tolerance`, kdb wj bounds): a reference match
    older than 7 days is treated as no match. Same single-sort core as
    q_join_asof (asof_carried — the tolerance is a post-window filter
    on the carried match struct, never a range join), so the cost is
    unchanged at any scale; DuckDB's native ASOF JOIN + post-filter is
    the oracle."""
    carried = asof_carried(table(spark, sf_dir, "events"))
    fresh = F.col("tsu") - F.col("asof.tsu") <= ASOF_TOLERANCE_US
    return carried.select(
        "event_id",
        "user_id",
        F.when(fresh, F.round(F.col("asof.ref_value"), 2)).alias(
            "last_signup_value"
        ),
        F.when(fresh, F.expr("(tsu - asof.tsu) div 3600000000")).alias(
            "staleness_hours"
        ),
    )
