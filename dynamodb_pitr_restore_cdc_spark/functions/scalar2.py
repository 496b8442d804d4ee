"""Scalar library, part 2: extended string ops, null-handling, and
conditional aggregation — rounding out the function surface a reference
user migrating general workloads expects. All JVM-side/codegen."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import table


@register(
    "q_str_funcs2",
    oracle="""
SELECT p_partkey,
       lpad(p_brand, 12, '*')                      AS brand_padded,
       trim(concat(' ', p_name, ' '))              AS name_trimmed,
       reverse(p_brand)                            AS brand_rev,
       left(p_name, 6)                             AS name_left,
       right(p_name, 4)                            AS name_right,
       contains(p_name, 'al')                      AS has_al,
       starts_with(p_type, 'b')                    AS starts_b,
       replace(translate(p_brand, '#', 'N'), 'Brand', 'B') AS brand_code,
       levenshtein(p_brand, p_type)                AS brand_type_dist,
       repeat('ab', p_size % 3 + 1)                AS rep
FROM part
""",
)
def q_str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string battery: padding, trimming, slicing, containment,
    translation, edit distance, repetition."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.reverse("p_brand").alias("brand_rev"),
        F.substring("p_name", 1, 6).alias("name_left"),
        F.expr("right(p_name, 4)").alias("name_right"),
        F.col("p_name").contains("al").alias("has_al"),
        F.col("p_type").startswith("b").alias("starts_b"),
        F.regexp_replace(F.translate("p_brand", "#", "N"), "Brand", "B").alias("brand_code"),
        F.levenshtein("p_brand", "p_type").cast("bigint").alias("brand_type_dist"),
        F.repeat(F.lit("ab"), F.col("p_size") % 3 + 1).alias("rep"),
    )


@register(
    "q_null_funcs",
    oracle="""
SELECT o_orderkey,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN')         AS status_or_open,
       CASE WHEN o_totalprice > 200000 THEN o_totalprice END IS NULL AS not_big,
       greatest(o_totalprice, 100000.0)                     AS at_least_100k,
       least(CAST(o_custkey AS DOUBLE), 50.0)               AS capped_cust,
       ifnull(nullif(o_orderpriority, o_orderpriority), 'same') AS always_same
FROM orders
""",
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling battery: coalesce/nullif/ifnull, null-producing CASE,
    greatest/least (null-safe in both engines)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_or_open"),
        F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice")).isNull().alias("not_big"),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("at_least_100k"),
        F.least(F.col("o_custkey").cast("double"), F.lit(50.0)).alias("capped_cust"),
        F.ifnull(F.nullif("o_orderpriority", "o_orderpriority"), F.lit("same")).alias("always_same"),
    )


@register(
    "q_agg_conditional",
    oracle="""
SELECT l_returnflag,
       count(*) FILTER (WHERE l_quantity > 25)               AS n_big,
       CAST(sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_no_disc,
       bool_or(l_tax > 0.07)                                 AS any_high_tax,
       bool_and(l_quantity > 0)                              AS all_positive,
       max(CASE WHEN l_linestatus = 'F' THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS max_f_price_c
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: filtered counts, boolean aggregates,
    conditional max — one hash agg, predicates folded into partials."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_big"),
        F.sum(F.when(F.col("l_discount") == 0, 1).otherwise(0)).cast("bigint").alias("n_no_disc"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.max(
            F.when(
                F.col("l_linestatus") == "F",
                F.round(F.col("l_extendedprice") * 100).cast("bigint"),
            )
        ).alias("max_f_price_c"),
    )
