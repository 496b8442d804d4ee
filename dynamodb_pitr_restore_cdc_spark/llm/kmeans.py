"""Distributed k-means over the embedding corpus — the iterative-
algorithm workload (and the offline trainer for the IVF quantizer in
similarity.py).

Determinism at cluster scale: floating-point centroid updates are
schedule-dependent (summation order), which makes k-means results
unreproducible run-to-run on a real cluster. This implementation
quantizes components to integer micro-units once, then every
assignment distance and centroid mean is EXACT integer arithmetic —
bit-identical results under any partitioning, the same discipline as
functions/rounding.py.

Shape per iteration: broadcast K centroids → map-only argmin
assignment → one shuffle keyed (cluster, dim) for the exact integer
means → rebuild centroid arrays (sorted structs, so collect order is
canonical). The driver holds only K×64 ints between iterations —
orchestration, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import table

K = 8
ITERS = 3
QUANT = 1_000_000  # micro-units: float32 components quantized exactly


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.transform(
            F.col("embedding"), lambda x: F.round(x.cast("double") * QUANT).cast("long")
        ).alias("qv"),
    )


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Broadcast-argmin cluster assignment (exact integer distances)."""
    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = W.partitionBy("vec_id").orderBy("d2", "cid")
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "qv", "cid")
    )


def kmeans_fit(vectors: DataFrame, k: int = K, iters: int = ITERS) -> DataFrame:
    """Lloyd iterations with exact integer means; returns assignments."""
    centroids = (
        vectors.where(F.col("vec_id").between(1, k))
        .select(F.col("vec_id").alias("cid"), F.col("qv").alias("cv"))
    )
    assigned = None
    for _ in range(iters):
        assigned = _assign(vectors, centroids)
        dims = assigned.select(
            "cid", F.posexplode("qv").alias("pos", "val")
        )
        means = dims.groupBy("cid", "pos").agg(
            F.expr("sum(val) div count(*)").alias("m")  # exact integer mean
        )
        centroids = means.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cv")
        )
        centroids = centroids.localCheckpoint(eager=True)  # cut the iterative lineage
    return assigned.select("vec_id", "cid")


@register("q_llm_kmeans", oracle=None)  # rows-only: iterative fixpoint isn't ANSI SQL
def q_llm_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration integer k-means (K=8) over the embeddings: outputs per-
    cluster membership stats. Deterministic by construction (exact
    integer math; see module docstring), asserted by running twice in
    tests/test_llm.py."""
    assigned = kmeans_fit(_quantized(spark, sf_dir))
    return assigned.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.sum("vec_id").alias("member_id_sum"),
        F.min("vec_id").alias("min_member"),
    )
