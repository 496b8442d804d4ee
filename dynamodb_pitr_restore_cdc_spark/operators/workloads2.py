"""TPC-H suite completion: the 16 query shapes not in workloads.py.

Together with workloads.py (Q3/Q5/Q6/Q10/Q14/Q18) this module gives
the engine the full 22-query TPC-H surface, each ADAPTED to the
fixture schema (FIXTURES.md): the fixtures carry no partsupp table and
no commitdate/receiptdate/shipmode/phone/container columns, so those
queries keep their canonical PLAN SHAPE (the thing the optimizer story
is about) with fixture-expressible predicates:

- partsupp is replaced by the distinct (l_partkey, l_suppkey) bridge
  derived from lineitem — same key structure, same join role;
- "commitdate < receiptdate" lateness becomes "l_shipdate more than N
  days after o_orderdate";
- phone country codes (Q22) become market segments.

Why these matter beyond the six already present: they add the
remaining *classic optimizer shapes* — full-table agg with many
aggregates (Q1), min-per-group joined back (Q2), EXISTS with a
non-equi conjunct (Q4), self-pair dimension join (Q7), conditional
market share (Q8), multi-dim profit rollup (Q9), scalar-subquery
threshold against a global total (Q11), conditional counts (Q12),
left-join count distribution (Q13), agg-equals-max selection (Q15),
NOT IN + count-distinct (Q16), correlated per-group average filter
(Q17), disjunctive OR-of-ANDs pushdown (Q19), nested dominance
subquery (Q20), exists/not-exists rewritten as one aggregation (Q21),
and anti-join + scalar threshold (Q22).

Money math is exact integer cents throughout (functions/rounding.py);
ratios divide two exact integer sums cast to double at the division.
Scale notes (100 TB) are per-query in docstrings; the shared
principles: fact stays on the probe side, dims broadcast, derived
aggregates reduce BEFORE joining, and any DataFrame referenced twice
in one plan is tracked_persist-ed (Catalyst has no cross-branch CSE).

Reference parity: the reference (aws-samples/dynamodb-pitr-restore-cdc)
implements no analytics — this suite is part of the engine's declared
§2B-bis generalization of its table-state semantics to an analytic
engine (SURVEY.md §2B note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import cents
from ..registry import register, tracked_persist
from ..sources import table


def _disc_price_cents() -> F.Column:
    # exact: price_cents * (100 - disc_cents) is 1e-4 dollar units
    return cents("l_extendedprice") * (100 - cents("l_discount"))


_DISC_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)
_DISC_SQL_L = (
    "CAST(round(l.l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l.l_discount * 100) AS BIGINT))"
)


@register(
    "q_tpch_q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
       sum({_DISC_SQL}) / 10000.0 AS sum_disc_price,
       sum({_DISC_SQL} * (100 + CAST(round(l_tax * 100) AS BIGINT))) / 1000000.0 AS sum_charge,
       CAST(sum(l_quantity) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / (count(*) * 100.0) AS avg_price,
       CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
         / (count(*) * 100.0) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 shape (pricing summary): the canonical wide-aggregate scan —
    one pass, 2-key groupBy with 8 aggregates including a triple
    product (charge = price·(1-disc)·(1+tax), exact 1e-6 units).
    100 TB: partial (map-side) aggregation reduces each task to ≤6
    rows before the shuffle; averages are exact integer sums divided
    once at the end (order-independent on any partitioning). The
    triple product stays within BIGINT to ~sf10; beyond that the
    charge column moves to DECIMAL(38,0) (rounding.py note)."""
    li = table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    price_c = cents("l_extendedprice")
    disc_c = cents("l_discount")
    tax_c = cents("l_tax")
    disc_price = price_c * (100 - disc_c)
    return (
        li.where(
            F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("bigint").alias("sum_qty"),
            (F.sum(price_c) / 100.0).alias("sum_base_price"),
            (F.sum(disc_price) / 10000.0).alias("sum_disc_price"),
            (F.sum(disc_price * (100 + tax_c)) / 1000000.0).alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price_c).cast("double") / (F.count("*") * 100.0)).alias(
                "avg_price"
            ),
            (F.sum(disc_c).cast("double") / (F.count("*") * 100.0)).alias(
                "avg_disc"
            ),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_tpch_q2_min_cost_supplier",
    oracle="""
WITH bridge AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), ranked AS (
  SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
         CAST(round(s.s_acctbal * 100) AS BIGINT) AS bal_cents,
         row_number() OVER (
           PARTITION BY p.p_partkey
           ORDER BY CAST(round(s.s_acctbal * 100) AS BIGINT), s.s_suppkey
         ) AS rn
  FROM part p
  JOIN bridge b ON b.l_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = b.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 20
)
SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
       bal_cents / 100.0 AS acctbal
FROM ranked
WHERE rn = 1
ORDER BY acctbal DESC, p_partkey
LIMIT 25
""",
)
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (minimum-cost supplier): per part, the supplier with
    the lowest account balance among suppliers that have actually
    shipped it (the distinct (partkey, suppkey) bridge stands in for
    partsupp; cost = s_acctbal in cents). Min-per-group is
    min(struct(bal, suppkey)) — partial agg pre-reduces per mapper,
    2.6x over a row_number window (CLAUDE.md) — with the winning
    supplier's attributes re-attached by a broadcast dim join, never
    carried inside the compared struct. 100 TB: bridge distinct is one
    shuffle on (part, supp); everything downstream is broadcast."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    bridge = li.select("l_partkey", "l_suppkey").distinct()
    joined = bridge.join(p, bridge.l_partkey == p.p_partkey).join(
        F.broadcast(s), bridge.l_suppkey == s.s_suppkey
    )
    best = joined.groupBy("p_partkey", "p_name").agg(
        F.min(
            F.struct(
                cents("s_acctbal").alias("bal"), F.col("s_suppkey").alias("sk")
            )
        ).alias("m")
    )
    s2 = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk2"), "s_name", "s_nationkey"
    )
    n2 = table(spark, sf_dir, "nation")
    return (
        best.join(F.broadcast(s2), best.m.sk == s2.sk2)
        .join(F.broadcast(n2), s2.s_nationkey == n2.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            F.col("m.sk").alias("s_suppkey"),
            "s_name",
            "n_name",
            (F.col("m.bal") / 100.0).alias("acctbal"),
        )
        .orderBy(F.col("acctbal").desc(), "p_partkey")
        .limit(25)
    )


@register(
    "q_tpch_q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def q_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (order priority checking): EXISTS with a non-equi
    conjunct — orders in one quarter having at least one lineitem
    shipped >30 days after the order date (the fixture's lateness
    analog of commitdate<receiptdate). Expressed as a LEFT SEMI join
    whose ON carries both the equi key and the date comparison, so
    Spark plans a semi hash join on l_orderkey with the non-equi part
    as a join residual. 100 TB: the quarter filter prunes orders at
    the scan; the semi join never materializes match multiplicity."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_tpch_q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       strftime(l.l_shipdate, '%Y') AS l_year,
       sum({_DISC_SQL_L}) / 10000.0 AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape (volume shipping): trade volume between a nation PAIR
    in both directions, per ship year — the same dimension (nation)
    joined twice under different roles, with a disjunctive cross-role
    predicate that only resolves after both joins. 100 TB: both
    nation joins broadcast; the pair predicate is evaluated on
    broadcast-joined columns (no extra shuffle); the two-year range
    prunes the fact scan."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("nk1"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("nk2"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("l_year"),
        )
        .agg((F.sum(_disc_price_cents()) / 10000.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q_tpch_q8_market_share",
    oracle=f"""
SELECT strftime(o.o_orderdate, '%Y') AS o_year,
       CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN {_DISC_SQL_L} ELSE 0 END)
            AS DOUBLE)
         / CAST(sum({_DISC_SQL_L}) AS DOUBLE) AS mkt_share,
       sum({_DISC_SQL_L}) / 10000.0 AS total_volume
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
JOIN region r   ON n1.n_regionkey = r.r_regionkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
WHERE r.r_name = 'ASIA'
  AND p.p_type = 'PROMO'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year
ORDER BY o_year
""",
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape (national market share): NATION_3's share of PROMO-part
    revenue sold into ASIA customers, per order year. Eight-table join
    with the nation dim again in two roles; the share is a ratio of
    two EXACT integer cent-sums cast to double only at the division —
    bit-identical across engines and partitionings. 100 TB: every dim
    broadcasts; the fact is filtered by order date through the orders
    join and by p_type through the broadcast part join."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), "n_regionkey"
    )
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation")
    )
    vol = _disc_price_cents()
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("nk1"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("nk2"))
        .groupBy(F.date_format("o_orderdate", "yyyy").alias("o_year"))
        .agg(
            (F.sum(nat_vol).cast("double") / F.sum(vol).cast("double")).alias(
                "mkt_share"
            ),
            (F.sum(vol) / 10000.0).alias("total_volume"),
        )
        .orderBy("o_year")
    )


@register(
    "q_tpch_q9_product_profit",
    oracle=f"""
SELECT n.n_name AS nation, strftime(o.o_orderdate, '%Y') AS o_year,
       sum({_DISC_SQL_L}
           - CAST(l.l_quantity AS BIGINT)
             * CAST(round(p.p_retailprice * 100) AS BIGINT) * 100
       ) / 10000.0 AS profit
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product-type profit): profit per supplier nation per
    order year on parts whose name contains 'red', with supply cost
    adapted to qty x p_retailprice (no partsupp in the fixtures).
    Profit = disc_price - cost in exact 1e-4 dollar units (cost cents
    x100 aligns the scales). 100 TB: the LIKE filter prunes part
    BEFORE its broadcast, so the fact join discards non-matching
    lineitems at the hash probe; nation/supplier broadcast; one
    shuffle for the (nation, year) rollup."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    profit = _disc_price_cents() - (
        F.col("l_quantity").cast("bigint") * cents("p_retailprice") * 100
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
        )
        .agg((F.sum(profit) / 10000.0).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q_tpch_q11_important_stock",
    oracle="""
WITH v AS (
  SELECT l.l_partkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_9'
  GROUP BY l.l_partkey
), tot AS (
  SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM v
)
SELECT v.l_partkey AS p_partkey, v.value_cents / 100.0 AS value
FROM v, tot
WHERE v.value_cents * 1000 > tot.total_cents
ORDER BY value DESC, p_partkey
""",
)
def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (important stock): per-part shipped value from one
    nation's suppliers, kept only where the part exceeds 0.1% of that
    nation's total — a scalar subquery over the SAME aggregate. The
    per-part aggregate is tracked_persist-ed and referenced twice
    (per-part rows + global total) per the reference-once rule; the
    one-row total broadcasts into the filter. The threshold compares
    value*1000 > total in exact integers — no division, no float.
    100 TB: one shuffle (partkey agg); the persist is the aggregated
    (small) side, never the fact."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(cents("l_extendedprice")).alias("value_cents"))
    )
    v = tracked_persist(v)
    tot = v.agg(F.sum("value_cents").alias("total_cents"))
    return (
        v.crossJoin(F.broadcast(tot))
        .where(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_cents") / 100.0).alias("value"),
        )
        .orderBy(F.col("value").desc(), "p_partkey")
    )


@register(
    "q_tpch_q12_ship_priority_classes",
    oracle="""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
""",
)
def q_tpch_q12_ship_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipping mode / priority classes): lineitems shipped
    late (>30 days after order) within one year, counted per
    linestatus split into high/low order-priority classes — the
    conditional-count (pivot-in-agg) shape. The non-equi lateness
    predicate rides the equi join as a residual. 100 TB: year filter
    prunes the fact scan; conditional sums partial-aggregate map-side
    to ≤2 rows per task."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q_tpch_q13_customer_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape (customer order distribution): two stacked
    aggregations — orders per customer through a LEFT join whose
    filter lives in the ON clause (so zero-order customers survive
    with count 0), then the distribution of customers over that
    count. 100 TB: first agg shuffles on custkey (or rides an
    existing bucketing); second input is one row per customer —
    tiny. count(o_orderkey) skips the NULLs of unmatched customers
    in both engines."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q_tpch_q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey,
         CAST(sum({_DISC_SQL}) AS BIGINT) AS rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.rev_e4 / 10000.0 AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.rev_e4 = (SELECT max(rev_e4) FROM revenue)
ORDER BY s.s_suppkey
""",
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape (top supplier): quarterly revenue per supplier, keep
    the supplier(s) equal to the maximum — agg-equals-max selection.
    Revenue is an exact integer (1e-4 units) so the equality is
    well-defined; a float revenue would make `= max` flaky. The
    per-supplier aggregate is tracked_persist-ed (used for rows and
    for max); the one-row max broadcasts. 100 TB: one fact shuffle on
    suppkey; supplier dim broadcasts."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_price_cents()).alias("rev_e4"))
    rev = tracked_persist(rev)
    mx = rev.agg(F.max("rev_e4").alias("max_e4"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("rev_e4") == F.col("max_e4"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", (F.col("rev_e4") / 10000.0).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch_q16_supplier_variety",
    oracle="""
WITH bridge AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT b.l_suppkey) AS supplier_cnt
FROM part p
JOIN bridge b ON p.p_partkey = b.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44)
  AND b.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
)
def q_tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (parts/supplier variety): distinct suppliers per
    (brand, type, size) over the partsupp bridge, excluding suppliers
    on a complaint list (fixture analog: negative account balance) via
    NOT IN -> broadcast anti join. 100 TB: the bridge distinct is the
    only fact shuffle; the exclusion list is tiny and broadcasts; the
    count-distinct rides the (already distinct) bridge keys."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 44)
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    bridge = li.select("l_partkey", "l_suppkey").distinct()
    return (
        bridge.join(
            F.broadcast(bad), bridge.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q_tpch_q17_small_qty_revenue",
    oracle="""
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         count(*) AS cnt
  FROM lineitem
  GROUP BY l_partkey
)
SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         / 700.0 AS avg_yearly,
       count(*) AS n_lines
FROM lineitem l
JOIN per_part a ON l.l_partkey = a.l_partkey
JOIN part p     ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND p.p_type = 'SMALL'
  AND 2 * CAST(l.l_quantity AS BIGINT) * a.cnt < a.sum_qty
""",
)
def q_tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape (small-quantity-order revenue): lineitems of one
    brand/type whose quantity is below half the part's average
    quantity — the correlated per-group average, decorrelated into a
    per-part aggregate joined back to the fact. The comparison
    qty < 0.5*avg is done as 2*qty*cnt < sum in exact integers (no
    float average). 100 TB: the per-part agg is one shuffle and its
    output is dim-sized (one row per part), so the join back to the
    filtered fact broadcasts; lineitem is scanned twice —
    deterministic scans, the agg side reduced before the join."""
    li = table(spark, sf_dir, "lineitem")
    per_part = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.count("*").alias("cnt"),
        )
    )
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .where(
            2 * F.col("l_quantity").cast("bigint") * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg(
            (F.sum(cents("l_extendedprice")) / 700.0).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q_tpch_q19_disjunctive_revenue",
    oracle=f"""
SELECT sum({_DISC_SQL_L}) / 10000.0 AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q_tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape (discounted revenue, disjunctive): an OR-of-ANDs
    predicate mixing part attributes and lineitem attributes. Catalyst
    factors the common-side conjuncts: the part side of each disjunct
    prunes the broadcast build (brand IN + size <= 15 is implied), and
    the quantity bounds (1..30 overall) push to the fact scan, with
    the full disjunction left as the join residual. 100 TB: this is
    THE predicate-factoring test — without pushdown it is a full fact
    x part probe."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    pred = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(pred)
        .agg(
            (F.sum(_disc_price_cents()) / 10000.0).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q_tpch_q20_part_promotion",
    oracle="""
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
), tot AS (
  SELECT l_partkey, CAST(sum(sq) AS BIGINT) AS tq
  FROM shipped GROUP BY l_partkey
), dominant AS (
  SELECT DISTINCT sh.l_suppkey
  FROM shipped sh
  JOIN tot t ON sh.l_partkey = t.l_partkey
  JOIN part p ON p.p_partkey = sh.l_partkey
  WHERE p.p_name LIKE 'red%' AND 4 * sh.sq > t.tq
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_9'
  AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s.s_suppkey
""",
)
def q_tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (potential part promotion): suppliers in one nation
    who were DOMINANT (shipped >25% of the year's volume) for some
    'red%' part — the nested IN-subquery chain, decorrelated into
    aggregate + self-join + semi join. The per-(part,supp) aggregate
    is tracked_persist-ed (rows + per-part total); the dominance test
    4*sq > tq is exact integers. 100 TB: one fact shuffle to
    (part,supp) grain — already near-dim-sized — then all joins are
    broadcast; the final IN is a broadcast semi join into the tiny
    supplier dim."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sq")
    )
    shipped = tracked_persist(shipped)
    tot = shipped.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("sq").alias("tq")
    )
    red = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    dominant = (
        shipped.join(tot, shipped.l_partkey == F.col("pk"))
        .join(F.broadcast(red), shipped.l_partkey == red.p_partkey)
        .where(4 * F.col("sq") > F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(dominant), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch_q21_waiting_supplier",
    oracle="""
WITH per_order AS (
  SELECT l.l_orderkey,
         count(DISTINCT l.l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                             THEN l.l_suppkey END) AS n_late,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN l.l_suppkey END) AS late_supp
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey
)
SELECT s.s_name, s.s_suppkey, count(*) AS numwait
FROM per_order q
JOIN supplier s ON s.s_suppkey = q.late_supp
WHERE q.n_supp > 1 AND q.n_late = 1
GROUP BY s.s_name, s.s_suppkey
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
)
def q_tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers who kept orders waiting): the classic
    EXISTS / NOT-EXISTS pair — for finished orders, a supplier who was
    the ONLY late shipper while other suppliers were on the order —
    rewritten as ONE aggregation per order: n_supp > 1 (the EXISTS),
    n_late = 1 (the NOT EXISTS of another late supplier), and the
    single culprit recovered with max(CASE WHEN late). One shuffle
    replaces two correlated subquery joins over the fact. 100 TB:
    grouping is on orderkey (natural lineitem clustering); the
    supplier attach and final top-20 are broadcast +
    TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    late = li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    late_supp = F.when(late, li.l_suppkey)
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(late_supp).alias("n_late"),
            F.max(late_supp).alias("late_supp"),
        )
    )
    return (
        per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name", "s_suppkey")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q_tpch_q22_sales_opportunity",
    oracle="""
WITH eligible AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal
  FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
), thr AS (
  SELECT CAST(sum(bal) AS BIGINT) AS sb, count(*) AS nb
  FROM eligible WHERE bal > 0
)
SELECT e.c_mktsegment, count(*) AS numcust,
       CAST(sum(e.bal) AS BIGINT) / 100.0 AS totacctbal
FROM eligible e, thr
WHERE e.bal * thr.nb > thr.sb
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = e.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
  )
GROUP BY e.c_mktsegment
ORDER BY e.c_mktsegment
""",
)
def q_tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (global sales opportunity): customers in target
    segments (the fixture analog of phone country codes) with
    above-average positive balance and NO recent orders — scalar
    subquery threshold + anti join. The threshold compares
    bal*n > sum in exact integers (no float average); the eligible
    set is tracked_persist-ed (threshold + main branch). 100 TB: the
    anti join shuffles customer vs date-pruned orders on custkey (or
    broadcasts the recent-customer set if one year of buyers fits);
    the threshold is a one-row broadcast."""
    eligible = (
        table(spark, sf_dir, "customer")
        .where(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE")
        )
        .select("c_custkey", "c_mktsegment", cents("c_acctbal").alias("bal"))
    )
    eligible = tracked_persist(eligible)
    thr = (
        eligible.where(F.col("bal") > 0)
        .agg(F.sum("bal").alias("sb"), F.count("*").alias("nb"))
    )
    recent = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return (
        eligible.crossJoin(F.broadcast(thr))
        .where(F.col("bal") * F.col("nb") > F.col("sb"))
        .join(recent, eligible.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bal") / 100.0).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
