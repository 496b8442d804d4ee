"""Sort / limit / set operators (SURVEY.md §2B "Sort / limit / set ops").

Scale notes (100 TB): global orderBy is a range-partitioned sort
(sampled boundaries) — acceptable only because it feeds a LIMIT, which
Spark executes as per-partition top-k + single small merge (TakeOrdered),
so no global sort ever materializes. Set ops are union (no shuffle)
plus, where distinctness is required, a hash aggregate on all columns.
intersect/except plan as left-semi/anti joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import table


@register(
    "q_sort_multikey",
    oracle="""
SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS total
FROM orders
ORDER BY o_orderpriority ASC NULLS LAST, o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort (explicit nulls-last — Spark default is nulls-first
    asc, DuckDB nulls-last: never rely on engine defaults) + top-k limit
    with a full tie-break so the 100 rows are well-defined."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.col("o_orderpriority").asc_nulls_last(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(100)
        .select("o_orderkey", "o_orderpriority", F.round("o_totalprice", 2).alias("total"))
    )


@register(
    "q_set_union_all",
    oracle="""
SELECT c_custkey AS entity_key, 'customer' AS src FROM customer
UNION ALL
SELECT s_suppkey AS entity_key, 'supplier' AS src FROM supplier
""",
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — pure concatenation, zero shuffle."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"), F.lit("customer").alias("src")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"), F.lit("supplier").alias("src")
    )
    return c.unionByName(s)


@register(
    "q_set_union_distinct",
    oracle="""
SELECT c_custkey AS entity_key FROM customer
UNION
SELECT s_suppkey FROM supplier
""",
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union: union + distinct (hash agg on the key)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("entity_key"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("entity_key"))
    return c.unionByName(s).distinct()


@register(
    "q_set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (planned as distinct + left-semi join)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_set_except",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
""",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (planned as distinct + left-anti join) — the
    relational face of CDC delete application. Urgent-only vs low-only
    customers stays non-empty at every SF (nationkey-based variants
    degenerate to 0 rows because suppliers cover all nations)."""
    o = table(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = o.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.subtract(low)


@register(
    "q_set_intersect_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey FROM supplier
""",
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each nationkey survives
    min(count_left, count_right) times (unlike q_set_intersect's
    set semantics). Planned as a count-matching join on (value,
    replica-id), one shuffle per side at any scale."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersectAll(s)


@register(
    "q_set_except_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey FROM supplier
""",
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: each nationkey survives
    max(0, count_left - count_right) times; the multiset twin of
    q_set_except."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.exceptAll(s)
