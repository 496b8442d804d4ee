"""Skew-handling patterns: salted two-stage aggregation + the AQE
skew-join evidence harness.

AQE's skew-join splitting covers joins automatically; hot GROUP BY
keys still concentrate a partition. The salted pattern splits each key
into `salt` sub-groups for the first (partial) aggregation, then
merges — the hot key's work spreads across `salt` tasks and the second
shuffle carries only keys × salt rows.

The registered query proves the invariant that matters: salting is
PLAN-ONLY — the result is identical to the plain aggregation (the
oracle computes the plain one).

AQE skew-split preconditions found the hard way (scripts/skew_bench.py
+ tests/test_plans.py pin them):
- the skewed side needs MULTIPLE map tasks — AQE splits a skewed
  reduce partition at MAPPER boundaries, so a single-mapper shuffle
  (one small parquet file scanned as one task) is unsplittable and
  the rule silently bails;
- `skewedPartitionThresholdInBytes` compares against COMPRESSED
  shuffle bytes — a 9 MB logical hot partition of (long, long) rows
  lz4-compresses far below the 256 MB default, so realistic test-scale
  skew needs the threshold dialed down to fire at all.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import avg_div
from ..operators.cdc import with_changelog
from ..registry import register

DEFAULT_SALT = 16

# dialed for the sf0.1-scale evidence harness: thresholds below the
# compressed hot-partition size so the split fires at test scale (at
# production scale the 256MB defaults play the same role)
SKEW_JOIN_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ, the skewable shape
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
}


@contextmanager
def session_confs(spark: SparkSession, confs: dict[str, str]):
    """Set session confs, RESTORING prior values in a finally — the same
    discipline as the streaming queries' shuffle-width pinning."""
    prev: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def hot_key_join(spark: SparkSession, n_rows: int = 2_000_000, hot_mod: int = 10) -> DataFrame:
    """The synthetic hot-key join: (hot_mod-1)/hot_mod of the fact rows
    share ONE join key, the rest stay unique — one reduce partition
    carries ~90% of the shuffle. Both sides get many map tasks (the
    splittability precondition above). The aggregate keeps the action
    cheap without changing the join's shuffle shape."""
    fact = spark.range(0, n_rows, 1, 32).select(
        F.when(F.col("id") % hot_mod != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 100).alias("q"),
    )
    dim = spark.range(0, n_rows, 1, 8).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return fact.join(dim, "k").select(F.sum(F.col("q") * F.col("w")).alias("s"))


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-stage aggregation with a random-free deterministic salt.

    `aggs` maps output name -> DECOMPOSABLE partial aggregate column
    (sum/count/min/max shapes). The salt is derived from a stable row
    attribute hash, not rand(), so replays/retries keep results and
    tests deterministic.
    """
    salted = df.withColumn("__salt", F.pmod(F.hash(*df.columns), F.lit(salt)))
    partial = salted.groupBy(key, "__salt").agg(
        *[c.alias(f"__p_{n}") for n, c in aggs.items()]
    )
    merge_fn = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}

    def merge(name: str) -> Column:
        kind = name.split("_", 1)[0] if name.split("_", 1)[0] in merge_fn else "sum"
        return merge_fn[kind](f"__p_{name}").alias(name)

    return partial.groupBy(key).agg(*[merge(n) for n in aggs])


@register(
    "q_agg_salted",
    oracle=with_changelog(
        """
SELECT key,
       count(*) AS count_events,
       CAST(sum(CAST(round(payload_value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c,
       max(seq_no) AS max_seq,
       min(seq_no) AS min_seq
FROM changelog
GROUP BY key
"""
    ),
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation over the CDC key (the natural hot-key
    candidate: one entity's change storm). Oracle = the plain single-
    stage aggregation — salting must be invisible in the result."""
    from ..operators.cdc import changelog

    cl = changelog(spark, sf_dir)
    return salted_agg(
        cl,
        "key",
        {
            "count_events": F.count("*"),
            "sum_value_c": F.sum(F.round(F.col("payload_value") * 100).cast("bigint")),
            "max_seq": F.max("seq_no"),
            "min_seq": F.min("seq_no"),
        },
    )
