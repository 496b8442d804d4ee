"""Property test for the union-trick as-of join (operators/joins.py):
on random keyed, timestamped frames it must match pandas.merge_asof
(backward direction, exact semantics) — the oracle-parity test pins it
on the fixture; this pins it on adversarial shapes (empty sides, all
keys missing, duplicate probe timestamps)."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def spark_asof(spark, probes, refs):
    """The q_join_asof union-trick, generalized to given frames."""
    p = spark.createDataFrame(probes, schema="pid long, key long, ts long").select(
        "key", "ts", F.lit(None).cast("double").alias("ref_value"),
        F.lit(1).alias("is_probe"), "pid",
    )
    r = spark.createDataFrame(refs, schema="key long, ts long, ref_value double").select(
        "key", "ts", "ref_value", F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("pid"),
    )
    w = (
        W.partitionBy("key")
        .orderBy("ts", "is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = (
        r.unionByName(p)
        .withColumn("val", F.last("ref_value", ignorenulls=True).over(w))
        .where(F.col("is_probe") == 1)
        .select("pid", "val")
    )
    return {row.pid: row.val for row in out.collect()}


def pandas_asof(probes, refs):
    if not probes:
        return {}
    pdf = pd.DataFrame(probes, columns=["pid", "key", "ts"]).sort_values("ts")
    if not refs:
        return {pid: None for pid in pdf.pid}
    rdf = pd.DataFrame(refs, columns=["key", "ts", "ref_value"]).sort_values("ts")
    m = pd.merge_asof(pdf, rdf, on="ts", by="key", direction="backward")
    return {
        int(r.pid): (None if pd.isna(r.ref_value) else float(r.ref_value))
        for r in m.itertuples()
    }


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.data())
def test_union_trick_asof_matches_merge_asof(spark, data):
    n_ref = data.draw(st.integers(0, 15))
    n_probe = data.draw(st.integers(0, 15))
    # distinct ref (key, ts) — ties between refs are undefined in both
    # implementations; probe ts MAY collide with ref ts (inclusive <=)
    ref_keys = [
        (data.draw(st.integers(0, 3)), data.draw(st.integers(0, 30)))
        for _ in range(n_ref)
    ]
    refs = [
        (k, t, float(i)) for i, (k, t) in enumerate(dict.fromkeys(ref_keys))
    ]
    probes = [
        (i, data.draw(st.integers(0, 3)), data.draw(st.integers(0, 30)))
        for i in range(n_probe)
    ]
    got = spark_asof(spark, probes, refs)
    want = pandas_asof(probes, refs)
    assert got == want
