"""Reshaping + advanced aggregation operators: pivot/unpivot, exact
percentiles, collection aggregates, subquery predicates, rank ratios.

Beyond SURVEY.md §2B's declared contract — rounding out the analytic
surface a reference user would expect from a general engine.

Scale notes (100 TB): pivot with EXPLICIT values is one hash agg (no
distinct-values pre-pass — always pin the pivot columns in production);
unpivot is a zero-shuffle Expand; percentiles on integerized cents are
exact and engine-stable; collect_* are bounded here by group
cardinality (never collect an unbounded group at scale — cap with
slice() or switch to approx sketches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.rounding import cents
from ..registry import register
from ..sources import table


@register(
    "q_pivot_status",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
FROM orders
GROUP BY o_orderpriority
""",
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts by status (explicit value list — a single hash
    agg; without the list Spark adds a distinct-scan pre-job)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("f_cnt"),
            F.coalesce("O", F.lit(0)).alias("o_cnt"),
            F.coalesce("P", F.lit(0)).alias("p_cnt"),
        )
    )


@register(
    "q_unpivot_prices",
    oracle="""
SELECT l_orderkey, l_linenumber, 'extended' AS measure,
       round(l_extendedprice, 2) AS amount
FROM lineitem WHERE l_linenumber = 1
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', round(l_discount, 2) FROM lineitem WHERE l_linenumber = 1
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax', round(l_tax, 2) FROM lineitem WHERE l_linenumber = 1
""",
)
def q_unpivot_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) three measure columns into rows — an Expand node,
    zero shuffle."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("extended"),
            F.round("l_discount", 2).alias("discount"),
            F.round("l_tax", 2).alias("tax"),
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["extended", "discount", "tax"],
            "measure",
            "amount",
        )
    )


@register(
    "q_agg_percentiles",
    oracle="""
SELECT o_orderstatus,
       quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5)  AS median_cents,
       quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.9)  AS p90_cents,
       min(CAST(round(o_totalprice * 100) AS BIGINT))                 AS min_cents,
       max(CAST(round(o_totalprice * 100) AS BIGINT))                 AS max_cents
FROM orders
GROUP BY o_orderstatus
""",
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) over integerized cents:
    Spark `percentile` ≡ DuckDB `quantile_cont`, and on bigints the
    interpolated values are halves at worst — binary-exact doubles, so
    no rounding scheme is needed at all. At 100 TB swap in
    percentile_approx (t-digest) — same query shape, bounded memory."""
    o = table(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(CAST(round(o_totalprice * 100) AS BIGINT), 0.5)").alias("median_cents"),
        F.expr("percentile(CAST(round(o_totalprice * 100) AS BIGINT), 0.9)").alias("p90_cents"),
        F.min(c).alias("min_cents"),
        F.max(c).alias("max_cents"),
    )


@register(
    "q_agg_collect",
    oracle="""
SELECT o_orderstatus,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
       len(list(DISTINCT o_orderpriority)) AS n_priorities
FROM orders
GROUP BY o_orderstatus
""",
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregate: distinct set per group, sorted and joined to
    a string (sorting makes the nondeterministic collect order
    canonical — collect_set/list order is NEVER stable on a cluster)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias("priorities"),
        F.size(F.collect_set("o_orderpriority")).cast("bigint").alias("n_priorities"),
    )


@register(
    "q_subquery_in",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
  AND o_totalprice > (SELECT avg(o_totalprice) FROM orders)
""",
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery + scalar subquery through the SQL entry point —
    Catalyst decorrelates to a left-semi join plus a broadcast scalar,
    exactly the plan the DataFrame formulation would build. Unique
    view names per call (concurrency safety)."""
    import uuid

    tag = uuid.uuid4().hex[:8]
    table(spark, sf_dir, "orders").createOrReplaceTempView(f"orders_{tag}")
    table(spark, sf_dir, "customer").createOrReplaceTempView(f"customer_{tag}")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
        FROM orders_{tag}
        WHERE o_custkey IN (SELECT c_custkey FROM customer_{tag} WHERE c_mktsegment = 'BUILDING')
          AND o_totalprice > (SELECT avg(o_totalprice) FROM orders_{tag})
        """
    )


@register(
    "q_subquery_correlated",
    oracle="""
SELECT c_custkey, c_mktsegment,
       (SELECT count(*) FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT') AS n_urgent
FROM customer c
""",
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in the SELECT list — Catalyst
    decorrelates it to a left outer aggregate join; the per-row
    count(*) over an empty correlation returns 0, not NULL (both
    engines agree on this COUNT special case)."""
    import uuid

    tag = uuid.uuid4().hex[:8]
    table(spark, sf_dir, "orders").createOrReplaceTempView(f"orders_{tag}")
    table(spark, sf_dir, "customer").createOrReplaceTempView(f"customer_{tag}")
    return spark.sql(
        f"""
        SELECT c_custkey, c_mktsegment,
               (SELECT count(*) FROM orders_{tag} o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT') AS n_urgent
        FROM customer_{tag} c
        """
    )


@register(
    "q_win_pct_rank",
    oracle="""
SELECT c_custkey,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
)
def q_win_pct_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-ratio windows: percent_rank ((rank-1)/(n-1)) and cume_dist —
    integer ratios, so the doubles are bit-identical across engines."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
