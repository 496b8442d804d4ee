"""Embedding similarity search (LLM-data-pipeline extension).

- brute-force cosine top-k: the correctness baseline — JVM-side
  higher-order functions (zip_with + aggregate), no Python in the
  scoring loop, probe broadcast so the big side never shuffles.
- LSH-bucketed ANN: the scale path — a fixed set of random hyperplanes
  maps each vector to a bucket; search touches only the probe's bucket
  (≈ n/2^planes of the data). At 100 TB the bucket id is a partition
  key: the probe routes to one partition instead of scanning all.

Float discipline: components are float32 in storage; both engines cast
to double BEFORE any arithmetic and fold sequentially, so cosine
values agree to ~1e-15 and the round(_, 4) outputs hash-match.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register, tracked_persist
from ..sources import table

TOP_K = 10
PROBE_VEC_ID = 0

N_PLANES = 4
_plane_rng = np.random.RandomState(7)
_PLANES = _plane_rng.standard_normal((N_PLANES, 64))


def _as_double(col):
    return F.transform(col if not isinstance(col, str) else F.col(col), lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_col(a, b):
    """cos(a, b) as a pure JVM column expression (codegen'd, no UDF)."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


@register(
    "q_llm_cosine_topk",
    oracle=f"""
WITH p AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS pv
           FROM embeddings WHERE vec_id = {PROBE_VEC_ID}),
c AS (SELECT vec_id,
             list_cosine_similarity(list_transform(embedding, x -> x::DOUBLE), pv) AS cos
      FROM embeddings, p WHERE vec_id <> {PROBE_VEC_ID})
SELECT vec_id, round(cos, 4) AS cos_sim
FROM c ORDER BY cos DESC, vec_id LIMIT {TOP_K}
""",
)
def q_llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against a probe vector (vec_id=0).

    The probe is a 1-row broadcast; scoring is a map-only pass over the
    corpus (zip_with/aggregate inside codegen); top-k is TakeOrdered
    (per-partition heads + small merge), so nothing global ever sorts."""
    e = table(spark, sf_dir, "embeddings").select("vec_id", _as_double("embedding").alias("v"))
    probe = e.where(F.col("vec_id") == PROBE_VEC_ID).select(F.col("v").alias("pv"))
    scored = (
        e.where(F.col("vec_id") != PROBE_VEC_ID)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", cosine_col(F.col("v"), F.col("pv")).alias("cos"))
    )
    return (
        scored.orderBy(F.col("cos").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", F.round("cos", 4).alias("cos_sim"))
    )


N_IVF_CELLS = 8
IVF_PROBE_CELLS = 2


def _sq_l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


@register(
    "q_llm_ann_ivf",
    oracle=f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id BETWEEN 1 AND {N_IVF_CELLS}),
a AS (SELECT e.vec_id, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
      FROM e CROSS JOIN c),
asg AS (SELECT vec_id, cid FROM a WHERE rn = 1),
probe_cells AS (SELECT cid FROM a WHERE vec_id = {PROBE_VEC_ID} AND rn <= {IVF_PROBE_CELLS}),
p AS (SELECT v AS pv FROM e WHERE vec_id = {PROBE_VEC_ID}),
cand AS (SELECT e.vec_id, asg.cid,
                list_cosine_similarity(e.v, p.pv) AS cos
         FROM e JOIN asg USING (vec_id) CROSS JOIN p
         WHERE asg.cid IN (SELECT cid FROM probe_cells) AND e.vec_id <> {PROBE_VEC_ID})
SELECT vec_id, cid, round(cos, 4) AS cos_sim
FROM cand ORDER BY cos DESC, vec_id LIMIT 5
""",
)
def q_llm_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a coarse quantizer partitions the corpus into
    cells; search touches only the nprobe cells nearest the probe.

    The quantizer here is a fixed set of 8 exemplar vectors (vec_ids
    1-8) — in production the centroids come from offline/sampled
    k-means, but assignment, inverted-list layout and probing are
    identical. Cell assignment is a broadcast of K centroids against a
    map-only pass (one argmin per vector, squared-L2 — same ranking as
    L2, no sqrt); at scale `cid` becomes the partition key, so a probe
    reads nprobe/K of the data. Fully oracle-checked: even the ANN
    path is SQL-expressible once the quantizer is fixed."""
    e = table(spark, sf_dir, "embeddings").select("vec_id", _as_double("embedding").alias("v"))
    cents = (
        e.where(F.col("vec_id").between(1, N_IVF_CELLS))
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    from pyspark.sql import Window as W

    ranked = (
        e.crossJoin(F.broadcast(cents))
        .withColumn("d2", _sq_l2(F.col("v"), F.col("cv")))
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("vec_id").orderBy("d2", "cid")),
        )
    )
    assigned = ranked.where(F.col("rn") == 1).select("vec_id", "cid")
    probe_cells = ranked.where(
        (F.col("vec_id") == PROBE_VEC_ID) & (F.col("rn") <= IVF_PROBE_CELLS)
    ).select("cid")
    probe = e.where(F.col("vec_id") == PROBE_VEC_ID).select(F.col("v").alias("pv"))
    cand = (
        e.join(assigned, "vec_id")
        .join(F.broadcast(probe_cells), "cid", "left_semi")
        .where(F.col("vec_id") != PROBE_VEC_ID)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", "cid", cosine_col(F.col("v"), F.col("pv")).alias("cos"))
    )
    return (
        cand.orderBy(F.col("cos").desc(), "vec_id")
        .limit(5)
        .select("vec_id", "cid", F.round("cos", 4).alias("cos_sim"))
    )


NEARDUP_COS = 0.35


@register(
    "q_llm_embed_neardup",
    oracle=f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id BETWEEN 1 AND {N_IVF_CELLS}),
a AS (SELECT e.vec_id, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY list_distance(e.v, c.cv), c.cid) AS rn
      FROM e CROSS JOIN c),
asg AS (SELECT vec_id, cid FROM a WHERE rn = 1),
m AS (SELECT e.vec_id, e.v, asg.cid FROM e JOIN asg USING (vec_id))
SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       round(list_cosine_similarity(x.v, y.v), 4) AS cos_sim
FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id < y.vec_id
WHERE list_cosine_similarity(x.v, y.v) >= {NEARDUP_COS}
""",
)
def q_llm_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, cell-bucketed: vectors are
    assigned to IVF cells (fixed quantizer, as in q_llm_ann_ivf) and
    pairs are scored only WITHIN a cell — the candidate set is
    O(n²/K) instead of O(n²), and `cid` is the shuffle key, so at
    scale each cell's pair generation is an in-partition job. The
    oracle runs the identical cell-restricted pair join, making the
    whole path (assignment + pairing + scoring) hash-checked."""
    e = table(spark, sf_dir, "embeddings").select("vec_id", _as_double("embedding").alias("v"))
    cents_df = (
        e.where(F.col("vec_id").between(1, N_IVF_CELLS))
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    from pyspark.sql import Window as W

    ranked = (
        e.crossJoin(F.broadcast(cents_df))
        .withColumn("d2", _sq_l2(F.col("v"), F.col("cv")))
        .withColumn("rn", F.row_number().over(W.partitionBy("vec_id").orderBy("d2", "cid")))
    )
    member = (
        e.join(ranked.where(F.col("rn") == 1).select("vec_id", "cid"), "vec_id")
        # norm precomputed per vector, not per pair: cos(x,y) needs one
        # dot per pair but each norm only once per vector — recomputing
        # norms inside the pair loop would triple the fold work
        .withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
        .transform(tracked_persist)  # both sides of the pair self-join (no cross-branch CSE)
    )
    pairs = (
        member.alias("x")
        .join(
            member.alias("y"),
            (F.col("x.cid") == F.col("y.cid")) & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            (_dot(F.col("x.v"), F.col("y.v")) / (F.col("x.nrm") * F.col("y.nrm"))).alias("cos"),
        )
        .where(F.col("cos") >= NEARDUP_COS)
    )
    return pairs.select("vec_a", "vec_b", F.round("cos", 4).alias("cos_sim"))


@F.pandas_udf(T.IntegerType())
def lsh_bucket(embeddings: pd.Series) -> pd.Series:
    """Random-hyperplane LSH bucket (sign pattern over N_PLANES planes,
    fixed seed — deterministic across runs and executors)."""
    M = np.array(embeddings.tolist(), dtype=np.float64)
    signs = (M @ _PLANES.T) > 0
    buckets = (signs * (1 << np.arange(N_PLANES))).sum(axis=1)
    return pd.Series(buckets.astype(np.int32))


@register("q_llm_ann_lsh", oracle=None)  # rows-only: hyperplane hashing isn't ANSI SQL
def q_llm_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors with MULTI-PROBE: score the probe's
    LSH bucket plus its Hamming-1 neighbors (flip each plane bit once).

    Single-bucket LSH misses neighbors that fall just across one
    hyperplane; probing the N_PLANES adjacent buckets recovers most of
    that recall for (1 + N_PLANES)/2^N_PLANES of the corpus scored —
    the standard production recall/cost dial. Scores are exact
    (property-tested: LSH changes WHICH vectors are scored, never
    their scores); the probed-bucket set is a tiny broadcast."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _as_double("embedding").alias("v")
    )
    bucketed = e.withColumn("bucket", lsh_bucket("embedding"))
    probe = bucketed.where(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("v").alias("pv"), F.col("bucket").alias("probe_bucket")
    )
    # probe bucket + Hamming-1 neighborhood (bit-flip per plane)
    probe_buckets = probe.select(
        "pv",
        F.explode(
            F.expr(
                f"array_union(array(probe_bucket), "
                f"transform(sequence(0, {N_PLANES - 1}), "
                f"i -> cast(probe_bucket ^ shiftleft(1, i) as int)))"
            )
        ).alias("probed"),
    )
    cand = (
        bucketed.join(
            F.broadcast(probe_buckets),
            (F.col("bucket") == F.col("probed")) & (F.col("vec_id") != PROBE_VEC_ID),
        )
        .select("vec_id", "bucket", cosine_col(F.col("v"), F.col("pv")).alias("cos"))
        .dropDuplicates(["vec_id"])
    )
    return (
        cand.orderBy(F.col("cos").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", "bucket", F.round("cos", 4).alias("cos_sim"))
    )
