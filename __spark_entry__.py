"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``dynamodb_pitr_restore_cdc_spark``; this file
only adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dynamodb_pitr_restore_cdc_spark.registry import all_queries
from dynamodb_pitr_restore_cdc_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (CDC snapshot rebuild) on /root/testdata/sf0.001."""
    tune_session(spark)
    return all_queries()["q_cdc_snapshot_rebuild"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in all_queries().items():
        builder = spec.builder

        def run(spark: SparkSession, sf_dir: str, _b=builder) -> DataFrame:
            tune_session(spark)
            return _b(spark, sf_dir)

        out[name] = run
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
