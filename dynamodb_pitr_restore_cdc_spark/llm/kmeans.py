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


def quantize_expr(col):
    # floor(x*Q + 0.5), NOT round(): both engines evaluate floor on the
    # identical double product bit-for-bit, while round() half-way
    # behavior differs between Spark (HALF_UP) and DuckDB near ties —
    # the CLAUDE.md round() gotcha applied to the quantizer itself.
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)).cast("long")
    )


def int_sq_dist():
    """Exact integer squared-L2 between the `qv` and `cv` array columns."""
    return F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.select("vec_id", quantize_expr(F.col("embedding")).alias("qv"))


def assignment_ranking(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Every (vector, centroid) pair ranked by exact integer squared-L2
    (ties broken by cid): rn=1 is the cluster assignment; rn<=nprobe is
    the IVF probe set. K centroids broadcast. Window-based — use only
    on SMALL vector sets (the probe's cell ranking, tests); full-corpus
    assignment goes through _assign's partial-aggregating argmin."""
    w = W.partitionBy("vec_id").orderBy("d2", "cid")
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .withColumn("d2", int_sq_dist())
        .withColumn("rn", F.row_number().over(w))
    )


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Broadcast-argmin cluster assignment (exact integer distances).

    min(struct(d2, cid, qv)) instead of a row_number window: the argmin
    is a partial-aggregatable min, so each map partition pre-reduces
    its n×K candidate rows to one row per vector BEFORE the shuffle —
    the exchange carries O(n) small rows, not the n×K cross product
    with both 64-dim arrays attached (measured 2.6x on q_llm_ann_ivf at
    sf0.1, and the gap widens with K = sqrt(n)). Tie-break (d2, cid)
    is identical to assignment_ranking's ORDER BY; qv rides along via
    first() (one value per vec_id), keeping the min-struct comparisons
    two scalar longs inside codegen."""
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .withColumn("d2", int_sq_dist())
        .groupBy("vec_id")
        .agg(
            F.min(F.struct("d2", "cid")).alias("best"),
            F.first("qv").alias("qv"),
        )
        .select("vec_id", "qv", F.col("best.cid").alias("cid"))
    )


def kmeans_centroids(vectors: DataFrame, k: int = K, iters: int = ITERS) -> DataFrame:
    """The trained quantizer: initial centroids are the vectors with
    vec_id 1..k; `iters` Lloyd updates with exact integer means. The
    returned (cid, cv) DataFrame is localCheckpointed (k tiny rows), so
    downstream plans can reference it from multiple branches without
    re-running the iterative job (no cross-branch CSE in Catalyst)."""
    centroids = (
        vectors.where(F.col("vec_id").between(1, k))
        .select(F.col("vec_id").alias("cid"), F.col("qv").alias("cv"))
    )
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
    return centroids


def kmeans_fit(vectors: DataFrame, k: int = K, iters: int = ITERS) -> DataFrame:
    """Lloyd iterations with exact integer means; returns the final
    assignment (computed against the centroids after iters-1 updates —
    the classic fit loop's last argmin pass)."""
    centroids = kmeans_centroids(vectors, k=k, iters=iters - 1)
    return _assign(vectors, centroids).select("vec_id", "cid")


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
