"""Scalar function library (SURVEY.md §2B "Scalar function library").

Everything here is built-in `pyspark.sql.functions` — JVM-side,
inside whole-stage codegen, zero Python round-trips. Dialect gotchas
handled per SURVEY.md §7 phase 3: Spark `datediff(end, start)` vs
DuckDB `datediff('day', start, end)`; regexp_replace is global by
default in Spark but needs the 'g' flag in DuckDB; timestamps leave
as epoch-µs BIGINTs or formatted strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import avg_div, cents, unit_div
from ..registry import register
from ..sources import table


@register(
    "q_str_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name)                                   AS name_upper,
       substr(p_name, 1, 8)                            AS name_prefix,
       length(p_name)                                  AS name_len,
       len(string_split(p_name, ' '))                  AS n_words,
       regexp_extract(p_name, '^(\\w+)', 1)            AS first_word,
       concat(p_brand, ':', p_type)                    AS brand_type,
       replace(p_name, ' ', '_')                       AS name_snake
FROM part
""",
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery on part.p_name."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_words"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
    )


@register(
    "q_date_funcs",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)                                    AS o_year,
       month(o_orderdate)                                   AS o_month,
       dayofmonth(o_orderdate)                              AS o_day,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch0,
       strftime(o_orderdate, '%Y-%m-%d')                    AS order_date_str
FROM orders
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery on o_orderdate. datediff argument order is
    opposite between engines — both expressed as (later - 1995-01-01)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        F.month("o_orderdate").cast("bigint").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("o_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("days_since_epoch0"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
    )


@register(
    "q_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ((CAST(round(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(round(l_discount * 100) AS BIGINT)) + 50) // 100) / 100.0 AS disc_price,
       round(abs(l_extendedprice - 1000), 2)               AS abs_delta,
       ((CAST(round(l_quantity * 100) AS BIGINT)
         * CAST(round(l_quantity * 100) AS BIGINT) + 50) // 100) / 100.0 AS qty_sq,
       round(sqrt(l_extendedprice), 2)                     AS price_sqrt,
       CASE WHEN l_discount > 0.05
            THEN ((CAST(round(l_extendedprice * 100) AS BIGINT) * 9 + 5) // 10) / 100.0
            ELSE round(l_extendedprice, 2) END             AS case_price,
       round(l_extendedprice % 97, 2)                      AS price_mod
FROM lineitem
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery incl. conditional arithmetic, all codegen'd.

    Products/discounts of 2-decimal money use exact fixed-point
    (functions/rounding.py) — decimal products land on .xx5 rounding
    ties where float round() is engine-dependent. abs/sqrt/mod keep
    native rounding: their results never sit on decimal ties."""
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    staged = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
        cents(price).alias("pc"),
        cents("l_quantity").alias("qc"),
        cents("l_discount").alias("dc"),
    )
    return staged.select(
        "l_orderkey",
        "l_linenumber",
        unit_div("pc * (100 - dc)", 100).alias("disc_price"),
        F.round(F.abs(price - 1000), 2).alias("abs_delta"),
        unit_div("qc * qc", 100).alias("qty_sq"),
        F.round(F.sqrt(price), 2).alias("price_sqrt"),
        F.when(F.col("l_discount") > 0.05, unit_div("pc * 9", 10))
        .otherwise(F.round(price, 2))
        .alias("case_price"),
        F.round(price % 97, 2).alias("price_mod"),
    )


@register(
    "q_array_funcs",
    oracle="""
SELECT vec_id,
       len(embedding)                                         AS dim,
       round(embedding[1]::DOUBLE, 4)                         AS first_comp,
       round(list_sum(list_transform(embedding[1:8], x -> x::DOUBLE)), 4) AS head_sum,
       round(list_max(list_transform(embedding, x -> x::DOUBLE)), 4)     AS max_comp
FROM embeddings
""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order battery on the 64-dim embedding column: size,
    element access, slice-fold, array max — all with float→double casts
    BEFORE arithmetic so both engines accumulate in double."""
    e = table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at(F.col("embedding"), 1).cast("double"), 4).alias("first_comp"),
        F.round(
            F.aggregate(
                F.slice(as_double, 1, 8), F.lit(0.0), lambda acc, x: acc + x
            ),
            4,
        ).alias("head_sum"),
        F.round(F.array_max(as_double), 4).alias("max_comp"),
    )


@register(
    "q_json_funcs",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
       count(*) AS n_events,
       ((2 * sum(CAST(round(value * 100) AS BIGINT)) + count(*))
        // (2 * count(*))) / 100.0 AS avg_value
FROM events
GROUP BY 1
""",
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction feeding an aggregation — the analytic path
    for the reference's schemaless payloads (SURVEY.md §1.2)."""
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket"),
            "value",
        )
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents("value")).alias("svc"),
        )
        .select(
            "k_bucket",
            "n_events",
            avg_div("svc", "n_events").alias("avg_value"),
        )
    )
