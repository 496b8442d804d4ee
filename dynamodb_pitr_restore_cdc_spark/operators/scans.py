"""Source/sink queries (SURVEY.md §2B "Sources / sinks").

The reference's only I/O is service calls (Streams in, SQS through,
BatchWriteItem out — A1/A4/A13); here the equivalents are columnar
Parquet scans with Catalyst pushdown and a Parquet sink round-trip.
tests/test_plans.py asserts the scan actually prunes columns and pushes
the predicate (ReadSchema / PushedFilters in the formatted plan) — at
100 TB that is the difference between reading 2 columns and reading 40.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register, tracked_persist
from ..sources import table


@register(
    "q_scan_project_filter",
    oracle="""
SELECT l_orderkey, l_partkey, l_quantity, round(l_extendedprice, 2) AS price
FROM lineitem
WHERE l_quantity > 30 AND l_returnflag = 'R'
""",
)
def q_scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + column pruning + predicate pushdown. The filter and
    the 4-column projection both reach the Parquet reader (no full-row
    materialization)."""
    li = table(spark, sf_dir, "lineitem")
    return li.where((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        F.round("l_extendedprice", 2).alias("price"),
    )


@register(
    "q_scan_json_props",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
FROM events
""",
)
def q_scan_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction (`events.props`) — the typed path for the
    reference's schemaless item payloads (SURVEY.md §1.2): stays JVM-side
    via get_json_object, no Python round-trip."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


@register(
    "q_scan_json_source",
    oracle="""
SELECT event_id, user_id, round(value, 2) AS value
FROM events WHERE event_id % 10 = 0
""",
)
def q_scan_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source round trip: a deterministic slice of events is
    written as JSON and read back with an EXPLICIT schema (never
    inference — SURVEY §1.3), proving the second source format's
    value fidelity against the parquet-direct oracle. Doubles survive
    because Spark's JSON writer emits shortest-round-trip decimals."""
    import uuid

    out = os.path.join(
        tempfile.gettempdir(), "spark_cdc_engine_sink", f"events_json-{uuid.uuid4().hex[:8]}"
    )
    subset = (
        table(spark, sf_dir, "events")
        .where(F.col("event_id") % 10 == 0)
        .select("event_id", "user_id", F.round("value", 2).alias("value"))
    )
    subset.write.mode("overwrite").json(out)
    # tracked: harnesses release after consuming the result, so the
    # cached rows don't outlive the run (the backing dir is gone, so
    # the plan is never recomputed after release — it's fully consumed)
    result = tracked_persist(
        spark.read.schema("event_id long, user_id long, value double").json(out)
    )
    result.count()  # materialize before removing the backing dir
    shutil.rmtree(out, ignore_errors=True)
    return result


@register("q_sink_roundtrip", oracle=None)  # rows-only: filesystem side effects
def q_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 analog: write a keyed Parquet sink, read it back, aggregate.
    Partitioned write → the sink layout a restored table would have; the
    read-back proves schema round-trip stability."""
    import uuid

    # unique path per invocation: a fixed path would collide if the
    # harness ever runs two queries concurrently
    out = os.path.join(
        tempfile.gettempdir(), "spark_cdc_engine_sink", f"orders_roundtrip-{uuid.uuid4().hex[:8]}"
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    orders.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    result = tracked_persist(  # see q_scan_json_source: released post-consumption
        back.groupBy("o_orderstatus").agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        )
    )
    result.count()  # materialize before removing the backing dir
    shutil.rmtree(out, ignore_errors=True)
    return result


@register(
    "q_scan_csv_source",
    oracle="""
SELECT event_id, user_id, round(value, 2) AS value
FROM events WHERE event_id % 10 = 3
""",
)
def q_scan_csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source round trip (the third source format beside parquet and
    JSON-lines): a deterministic slice of events is written as
    headered CSV and read back with an EXPLICIT schema (never
    inference — SURVEY §1.3). Doubles survive because Spark's CSV
    writer emits shortest-round-trip decimals, same as the JSON path."""
    import uuid

    out = os.path.join(
        tempfile.gettempdir(), "spark_cdc_engine_sink", f"events_csv-{uuid.uuid4().hex[:8]}"
    )
    subset = (
        table(spark, sf_dir, "events")
        .where(F.col("event_id") % 10 == 3)
        .select("event_id", "user_id", F.round("value", 2).alias("value"))
    )
    subset.write.mode("overwrite").option("header", "true").csv(out)
    result = tracked_persist(  # released post-consumption (see q_scan_json_source)
        spark.read.schema("event_id long, user_id long, value double")
        .option("header", "true")
        .csv(out)
    )
    result.count()  # materialize before removing the backing dir
    shutil.rmtree(out, ignore_errors=True)
    return result


@register(
    "q_scan_orc_source",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
       round(o_totalprice, 2) AS total_price,
       epoch_us(o_orderdate) AS order_date_us
FROM orders WHERE o_orderkey % 7 = 0
""",
)
def q_scan_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source round trip (fourth source format: parquet, JSON-lines,
    CSV, ORC). ORC is the other splittable columnar format a lakehouse
    ingests at scale; unlike CSV/JSON its reader supports the same
    predicate pushdown + column pruning as parquet, so the read-back
    scan stays prunable. Timestamps survive natively (no string round
    trip) and leave as epoch-us per the engine-wide contract."""
    import uuid

    out = os.path.join(
        tempfile.gettempdir(), "spark_cdc_engine_sink", f"orders_orc-{uuid.uuid4().hex[:8]}"
    )
    subset = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("total_price"),
            "o_orderdate",
        )
    )
    subset.write.mode("overwrite").orc(out)
    result = tracked_persist(  # released post-consumption (see q_scan_json_source)
        spark.read.orc(out).select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "total_price",
            F.unix_micros("o_orderdate").alias("order_date_us"),
        )
    )
    result.count()  # materialize before removing the backing dir
    shutil.rmtree(out, ignore_errors=True)
    return result
