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
    # rebalance off the one-split scan: every trainer/encoder stage
    # downstream (Lloyd assigns, PQ codebooks, residual encode) inherits
    # this partitioning through its localCheckpoints, so without the
    # exchange the whole ANN family's integer vector math runs on a
    # single core (r15 profile: 0.9-1.4 s one-task stages per iteration)
    e = table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
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


EMBED_DIM = 64  # fixture contract (embeddings.embedding: array<float>[64])


def lloyd_oracle_ctes(k_sql: str, iters: int, train_cond: str | None = None) -> str:
    """DuckDB CTE chain mirroring the exact-integer Lloyd trainer: same
    floor-quantization, same initialization (vec_id 1..k), `iters`
    unrolled updates (tied argmin by cid, truncating integer means),
    then a final assignment ranking (`rank_final`/`asg`). Exact integer
    math is what makes the iterative trainer oracle-expressible at all
    — double centroid means would diverge between engines on summation
    order. `k_sql` is an aggregate expression over `embeddings`
    (a literal for a fixed k). `train_cond` restricts TRAINING to a
    vector subset (the frozen-quantizer index-maintenance shape: train
    once on the loaded corpus, assign later arrivals with the frozen
    centroids); `rank_final`/`asg` still rank EVERY vector. The default
    emits byte-identical text to the pre-parameter version, so existing
    oracles are unchanged."""
    d2 = (
        "list_sum(list_transform(list_zip(q.qv, c.cv), "
        "z -> (z[1] - z[2]) * (z[1] - z[2])))"
    )
    train_src = "qt q" if train_cond else "q"
    parts = [
        "e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)",
        (
            "q AS (SELECT vec_id, list_transform(embedding, "
            f"x -> CAST(floor(x::DOUBLE * {QUANT} + 0.5) AS BIGINT)) AS qv FROM embeddings)"
        ),
        f"kk AS (SELECT {k_sql} AS k FROM embeddings)",
        "c0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id BETWEEN 1 AND (SELECT k FROM kk))",
    ]
    if train_cond:
        parts.append(f"qt AS (SELECT * FROM q WHERE {train_cond})")
    for i in range(1, iters + 1):
        parts += [
            (
                f"a{i} AS (SELECT q.vec_id, c.cid, row_number() OVER "
                f"(PARTITION BY q.vec_id ORDER BY {d2}, c.cid) AS rn "
                f"FROM {train_src} CROSS JOIN c{i - 1} c)"
            ),
            f"asg{i} AS (SELECT vec_id, cid FROM a{i} WHERE rn = 1)",
            (
                f"dims{i} AS (SELECT asg{i}.cid, p.pos, q.qv[p.pos] AS val "
                f"FROM asg{i} JOIN q USING (vec_id) "
                f"CROSS JOIN (SELECT unnest(range(1, {EMBED_DIM + 1})) AS pos) p)"
            ),
            (
                f"m{i} AS (SELECT cid, pos, CAST(sum(val) // count(*) AS BIGINT) AS m "
                f"FROM dims{i} GROUP BY cid, pos)"
            ),
            f"c{i} AS (SELECT cid, list(m ORDER BY pos) AS cv FROM m{i} GROUP BY cid)",
        ]
    parts += [
        (
            f"rank_final AS (SELECT q.vec_id, c.cid, row_number() OVER "
            f"(PARTITION BY q.vec_id ORDER BY {d2}, c.cid) AS rn "
            f"FROM q CROSS JOIN c{iters} c)"
        ),
        "asg AS (SELECT vec_id, cid FROM rank_final WHERE rn = 1)",
    ]
    return ",\n".join(parts)


@register(
    "q_llm_kmeans",
    # fully oracled since round 3: kmeans_fit(iters=3) assigns against
    # the centroids after 2 updates, so the oracle unrolls 2 Lloyd
    # iterations and takes rank_final's argmin as the fit assignment
    oracle=f"""
WITH {lloyd_oracle_ctes(k_sql=str(K), iters=ITERS - 1)}
SELECT cid, count(*) AS n_members,
       CAST(sum(vec_id) AS BIGINT) AS member_id_sum,
       min(vec_id) AS min_member
FROM asg GROUP BY cid
""",
)
def q_llm_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration integer k-means (K=8) over the embeddings: outputs per-
    cluster membership stats. Deterministic by construction (exact
    integer math; see module docstring), asserted by running twice in
    tests/test_llm.py — and, since round 3, hash-checked against a
    DuckDB oracle that unrolls the identical integer Lloyd chain."""
    assigned = kmeans_fit(_quantized(spark, sf_dir))
    return assigned.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.sum("vec_id").alias("member_id_sum"),
        F.min("vec_id").alias("min_member"),
    )
