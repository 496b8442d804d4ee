"""Skew-handling patterns: salted two-stage aggregation.

AQE's skew-join splitting covers joins automatically; hot GROUP BY
keys still concentrate a partition. The salted pattern splits each key
into `salt` sub-groups for the first (partial) aggregation, then
merges — the hot key's work spreads across `salt` tasks and the second
shuffle carries only keys × salt rows.

The registered query proves the invariant that matters: salting is
PLAN-ONLY — the result is identical to the plain aggregation (the
oracle computes the plain one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import avg_div
from ..operators.cdc import with_changelog
from ..registry import register

DEFAULT_SALT = 16


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
