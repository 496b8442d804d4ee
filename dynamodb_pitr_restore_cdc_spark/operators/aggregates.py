"""Aggregation operators (SURVEY.md §2B "Aggregation").

Scale notes (100 TB): all groupBy aggregates here are hash aggregates
with map-side partial aggregation (Spark plans partial_* before the
exchange), so the shuffle carries one row per (partition × group), not
per input row. countDistinct expands to a two-phase expand+agg;
approx_count_distinct (HLL++) is the constant-memory alternative at
scale. rollup/cube are Expand-based — each input row is replicated per
grouping set BEFORE partial aggregation; fine for low-cardinality
grouping columns like these, otherwise prefer explicit grouping sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import avg_div, cents, unit_div
from ..registry import register
from ..sources import table


@register(
    "q_agg_groupby",
    oracle="""
WITH t AS (
    SELECT l_returnflag, l_linestatus,
           CAST(round(l_quantity      * 100) AS BIGINT) AS qc,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
           CAST(round(l_discount      * 100) AS BIGINT) AS dc,
           CAST(round(l_tax           * 100) AS BIGINT) AS tc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
), g AS (
    SELECT l_returnflag, l_linestatus,
           sum(qc) AS sqc, sum(pc) AS spc, sum(dc) AS sdc,
           sum(pc * (100 - dc)) AS sdu,
           sum(pc * (100 - dc) * (100 + tc)) AS scu,
           count(*) AS n
    FROM t GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       sqc / 100.0                                AS sum_qty,
       spc / 100.0                                AS sum_base_price,
       ((sdu + 50)   // 100)     / 100.0          AS sum_disc_price,
       ((scu + 5000) // 10000)   / 100.0          AS sum_charge,
       ((2 * sqc + n) // (2 * n)) / 100.0         AS avg_qty,
       ((2 * spc + n) // (2 * n)) / 100.0         AS avg_price,
       ((2 * sdc + n) // (2 * n)) / 100.0         AS avg_disc,
       n AS count_order
FROM g
""",
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: 2-key hash agg, 8 aggregates, predicate pushed to
    scan. Money aggregates use exact fixed-point (functions/rounding.py):
    integer partial sums are order-independent, so the result is
    bit-identical however AQE schedules the shuffle — a determinism
    property floating-point sums do not have on a cluster."""
    li = table(spark, sf_dir, "lineitem")
    qty_c = cents("l_quantity")
    price_c = cents("l_extendedprice")
    disc_c = cents("l_discount")
    tax_c = cents("l_tax")
    g = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_c).alias("sqc"),
            F.sum(price_c).alias("spc"),
            F.sum(disc_c).alias("sdc"),
            F.sum(price_c * (100 - disc_c)).alias("sdu"),
            F.sum(price_c * (100 - disc_c) * (100 + tax_c)).alias("scu"),
            F.count("*").alias("n"),
        )
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("sqc") / 100.0).alias("sum_qty"),
        (F.col("spc") / 100.0).alias("sum_base_price"),
        unit_div("sdu", 100).alias("sum_disc_price"),
        unit_div("scu", 10000).alias("sum_charge"),
        avg_div("sqc", "n").alias("avg_qty"),
        avg_div("spc", "n").alias("avg_price"),
        avg_div("sdc", "n").alias("avg_disc"),
        F.col("n").alias("count_order"),
    )


@register(
    "q_agg_distinct",
    oracle="""
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_custs,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (two-phase expand under the hood)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count("*").alias("n_orders"),
    )


@register("q_agg_approx_distinct", oracle=None)  # rows-only: HLL estimates differ by engine
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the constant-memory scale path for
    high-cardinality distinct counts (100 TB: never exact-distinct a
    billion-key column you only need to within 1%)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count("*").alias("n_rows"),
    )


@register("q_agg_hll_merge", oracle=None)  # rows-only: sketch binaries are engine-specific
def q_agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct sketches (Apache DataSketches HLL): build one
    sketch per nation partition, union the sketches, estimate — the
    100 TB pattern for distinct counts over pre-aggregated shards
    (sketches are tiny, additive, and never rescan history; the
    reference-shape use case is distinct-keys-seen across CDC
    partitions). Test asserts merged == direct estimate."""
    o = table(spark, sf_dir, "orders")
    per_status = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count("*").alias("n_rows"),
    )
    return per_status.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_distinct_custkeys"),
        F.sum("n_rows").alias("total_rows"),
        F.count("*").alias("n_sketches"),
    )


@register(
    "q_agg_having",
    oracle="""
SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_total
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 12
""",
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        )
        .where(F.col("n_orders") >= 12)
    )


@register(
    "q_agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals; grouping_id disambiguates rolled-up NULLs."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n_rows"),
    ).select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n_rows")


@register(
    "q_agg_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping-set combinations (2^k Expand fan-out — keep k small)."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    ).select("l_returnflag", "l_linestatus", "gid", "sum_price")


@register(
    "q_agg_gsets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def q_agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL entry point (Catalyst plans the
    same Expand as rollup/cube but only for the 3 requested sets).
    Unique view name per call: a fixed name would race under
    concurrent query execution."""
    import uuid

    view = f"lineitem_{uuid.uuid4().hex[:8]}"
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               grouping_id(l_returnflag, l_linestatus) AS gid,
               round(sum(l_quantity), 2) AS sum_qty
        FROM {view}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# Shared derived-moment expressions for q_agg_stats_moments: the SAME
# strings are compiled by Catalyst and DuckDB, so every float op runs
# in the identical order on identical exact-integer inputs — IEEE-754
# determinism instead of per-engine aggregate implementations (Spark
# `skewness` and DuckDB `skewness` don't even agree on population vs
# sample). Quantization is floor(x*Q + 0.5), never round() (see
# llm/kmeans.quantize_expr: HALF_UP vs banker's near ties).
_MOM_RATIOS = {
    "r1": "s1 / n", "r2": "s2 / n", "r3": "s3 / n", "r4": "s4 / n",
}
_MOM_CENTRAL = {
    "m2": "r2 - r1*r1",
    "m3": "r3 - 3*r1*r2 + 2*r1*r1*r1",
    "m4": "r4 - 4*r1*r3 + 6*r1*r1*r2 - 3*r1*r1*r1*r1",
}
_MOM_OUT = {
    "mean_qty": "floor(r1 * 1e6 + 0.5) / 1e6",
    "var_qty": "floor(m2 * 1e6 + 0.5) / 1e6",
    "skew_qty": "floor((m3 / (m2 * sqrt(m2))) * 1e6 + 0.5) / 1e6",
    "kurt_qty": "floor((m4 / (m2 * m2) - 3.0) * 1e6 + 0.5) / 1e6",
    "corr_qty_disc": (
        "floor(((n*qd - s1*d1) / (sqrt(n*s2 - s1*s1) * sqrt(n*d2 - d1*d1)))"
        " * 1e6 + 0.5) / 1e6"
    ),
}


@register(
    "q_agg_stats_moments",
    oracle=f"""
WITH t AS (
    SELECT l_returnflag,
           CAST(l_quantity AS BIGINT) AS q,
           CAST(round(l_discount * 100) AS BIGINT) AS d
    FROM lineitem
), g AS (
    SELECT l_returnflag, count(*) AS n,
           CAST(sum(q) AS BIGINT) AS s1,
           CAST(sum(q*q) AS BIGINT) AS s2,
           CAST(sum(q*q*q) AS BIGINT) AS s3,
           CAST(sum(q*q*q*q) AS BIGINT) AS s4,
           CAST(sum(d) AS BIGINT) AS d1,
           CAST(sum(d*d) AS BIGINT) AS d2,
           CAST(sum(q*d) AS BIGINT) AS qd
    FROM t GROUP BY l_returnflag
), r AS (
    SELECT *, {", ".join(f"{e} AS {k}" for k, e in _MOM_RATIOS.items())} FROM g
), m AS (
    SELECT *, {", ".join(f"{e} AS {k}" for k, e in _MOM_CENTRAL.items())} FROM r
)
SELECT l_returnflag, n,
       {", ".join(f"{e} AS {k}" for k, e in _MOM_OUT.items())}
FROM m
""",
)
def q_agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape statistics per return flag: mean, population
    variance, skewness, excess kurtosis of quantity, and the
    quantity↔discount Pearson correlation — all derived from ONE
    hash-aggregate of exact integer power sums (q ≤ 50, so Σq⁴ fits
    BIGINT up to ~10⁹-row groups; beyond that swap the sums to
    DECIMAL(38,0)). The partial sums are order-independent integers —
    bit-identical under any AQE schedule — and the float derivation is
    the byte-identical expression text in both engines (module-level
    _MOM_* strings), so even the irrational outputs hash-match. The
    built-in `skewness`/`kurtosis`/`corr` aggregates are the
    non-reproducible path this query deliberately avoids: engines
    disagree on sample-vs-population and merge order."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("d"),
    )
    g = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.expr("q*q")).alias("s2"),
        F.sum(F.expr("q*q*q")).alias("s3"),
        F.sum(F.expr("q*q*q*q")).alias("s4"),
        F.sum("d").alias("d1"),
        F.sum(F.expr("d*d")).alias("d2"),
        F.sum(F.expr("q*d")).alias("qd"),
    )
    r = g.selectExpr("*", *[f"{e} AS {k}" for k, e in _MOM_RATIOS.items()])
    m = r.selectExpr("*", *[f"{e} AS {k}" for k, e in _MOM_CENTRAL.items()])
    return m.selectExpr(
        "l_returnflag", "n", *[f"{e} AS {k}" for k, e in _MOM_OUT.items()]
    )


HIST_BIN_CENTS = 25_000 * 100  # $25,000-wide equi-width bins


@register(
    "q_agg_histogram",
    oracle=f"""
WITH t AS (
    SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS pc FROM orders
)
SELECT CAST(pc // {HIST_BIN_CENTS} AS BIGINT) * 25000 AS bin_lo,
       count(*) AS n_orders,
       CAST(sum(pc) AS BIGINT) / 100.0 AS sum_price
FROM t GROUP BY 1
""",
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals ($25k bins): binning is
    integer floor-division on cents (engine-exact bucket edges — a
    float width_bucket would disagree near boundaries), then a plain
    hash aggregate: map-side partials shrink the shuffle to one row
    per (partition × bin), the profile-building primitive every
    numeric-column statistics pass uses at 100 TB."""
    o = table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("pc")
    )
    return (
        o.groupBy(
            (F.expr(f"pc div {HIST_BIN_CENTS}") * 25000).alias("bin_lo")
        )
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum("pc") / 100.0).alias("sum_price"),
        )
    )


@register(
    "q_agg_mode",
    oracle="""
WITH c AS (
    SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q, count(*) AS n
    FROM lineitem GROUP BY 1, 2
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                 ORDER BY n DESC, q) AS rk
    FROM c
)
SELECT l_returnflag,
       q AS mode_qty,
       CAST(n AS BIGINT) AS mode_count
FROM ranked WHERE rk = 1
""",
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: the most frequent quantity per return flag,
    ties broken toward the SMALLEST value — built-in `mode()` leaves
    ties implementation-defined, which is a non-answer for a
    reproducible engine. Two partial-aggregatable passes: the value
    count, then the argmax as min(struct(-n, q)) riding the same
    (flag) partitioning — the full-corpus argmin pattern (min-struct
    beats a row_number window: partial agg pre-reduces per mapper).
    The oracle states the same thing as a window rank."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("q")
    )
    c = li.groupBy("l_returnflag", "q").agg(F.count("*").alias("n"))
    peak = c.groupBy("l_returnflag").agg(
        F.min(F.struct((-F.col("n")).alias("neg"), "q", "n")).alias("p")
    )
    return peak.select(
        "l_returnflag",
        F.col("p.q").alias("mode_qty"),
        F.col("p.n").alias("mode_count"),
    )


@register(
    "q_agg_weighted_avg",
    oracle="""
WITH t AS (
    SELECT l_returnflag,
           CAST(l_quantity AS BIGINT) AS q,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
    FROM lineitem
)
SELECT l_returnflag,
       CAST(sum(q) AS BIGINT) AS total_qty,
       ((2 * CAST(sum(q * pc) AS BIGINT) + CAST(sum(q) AS BIGINT))
        // (2 * CAST(sum(q) AS BIGINT))) / 100.0 AS wavg_price
FROM t GROUP BY l_returnflag
""",
)
def q_agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag: Σ(q·price)/Σq
    with both numerator and denominator as exact integer partial sums
    (q·cents ≤ 50·10⁹ per row — BIGINT headroom to ~10⁸ rows/group),
    rounded half-up in integer space. The float `sum(q*p)/sum(q)`
    formulation would be merge-order sensitive; this one is
    bit-identical under any AQE schedule."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("q"),
        cents("l_extendedprice").alias("pc"),
    )
    return li.groupBy("l_returnflag").agg(
        F.sum("q").alias("total_qty"),
        avg_div("sum(q * pc)", "sum(q)").alias("wavg_price"),
    )
