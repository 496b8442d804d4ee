"""Fixture reader shims (sources/fixtures.py).

The driver hands the engine an externally-built SparkSession whose
parquet confs we don't control. Round-3 regression: naive TIMESTAMP(US)
fixtures read as TIMESTAMP_NTZ under the default
``spark.sql.parquet.inferTimestampNTZ.enabled=true``, and every
``unix_micros``/``window`` call on ``events.ts`` failed with
DATATYPE_MISMATCH. ``table()`` must normalize to plain (LTZ) TIMESTAMP
regardless of session confs.
"""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamodb_pitr_restore_cdc_spark.sources import table

from .conftest import SF_SMOKE


def test_table_normalizes_ntz_timestamps(spark):
    # a sibling session with the vanilla (driver-like) parquet conf
    ntz = spark.newSession()
    ntz.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    ntz.conf.set("spark.sql.session.timeZone", "UTC")
    raw = ntz.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert isinstance(raw.schema["ts"].dataType, T.TimestampNTZType), (
        "precondition: fixtures are naive micros parquet; if this changes, "
        "re-check the shim in sources/fixtures.py"
    )

    df = table(ntz, SF_SMOKE, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    # unix_micros is the engine-wide contract (registry: timestamps leave
    # queries as epoch-us) — it rejects NTZ, so this is the real check
    row = df.agg(F.min(F.unix_micros("ts")).alias("lo")).first()
    assert row.lo is not None

    # values must equal the naive column interpreted as UTC (the oracle's
    # reading): compare against NTZ formatted to string
    a = df.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s")).limit(5).collect()
    b = raw.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s")).limit(5).collect()
    assert [r.s for r in a] == [r.s for r in b]


def test_engine_session_reads_ltz(spark):
    # our own factory sets inferTimestampNTZ=false: plain read is already LTZ
    for name in ("events", "orders", "lineitem"):
        df = table(spark, SF_SMOKE, name)
        for f in df.schema.fields:
            assert not isinstance(f.dataType, T.TimestampNTZType), (name, f.name)


def test_dq_report_catches_planted_violations(spark):
    """The clean fixture yields all-zero metrics; plant one of each
    defect and require the exact counts."""
    import os
    import tempfile

    import pandas as pd

    from dynamodb_pitr_restore_cdc_spark.operators.scans import (
        q_dq_constraint_report,
    )

    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 2, 3, 4, 5],  # one duplicated key (+1 surplus)
            "o_custkey": [10, 10, 20, None, 99, 10],  # one null, one orphan(99)
            "o_orderstatus": ["F"] * 6,
            "o_totalprice": [100.0, -5.0, 50.0, 60.0, 70.0, None],  # negative + null
            "o_orderdate": pd.to_datetime(
                ["1995-01-01", "1996-01-01", "1997-01-01", "1998-01-01",
                 "1980-01-01", "1999-01-01"]  # one out of range
            ),
            "o_orderpriority": ["1-URGENT"] * 6,
        }
    )
    customer = pd.DataFrame(
        {"c_custkey": [10, 20], "c_name": ["a", "b"], "c_nationkey": [0, 0],
         "c_acctbal": [0.0, 0.0], "c_mktsegment": ["BUILDING"] * 2}
    )
    with tempfile.TemporaryDirectory() as d:
        orders.to_parquet(os.path.join(d, "orders.parquet"), coerce_timestamps="us")
        customer.to_parquet(os.path.join(d, "customer.parquet"), coerce_timestamps="us")
        got = (
            q_dq_constraint_report(spark, d)
            .toPandas()
            .set_index("check_name")["metric"]
            .to_dict()
        )
    assert got == {
        "null_custkey": 1,
        "null_totalprice": 1,
        "nonpositive_price": 1,
        "date_out_of_range": 1,
        "dup_orderkeys": 1,
        "orphan_custkeys": 1,
    }
