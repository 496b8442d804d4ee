"""Product quantization (PQ) ANN — the vector-COMPRESSION scale path.

IVF (similarity.py) prunes which vectors a probe touches; PQ shrinks
what each vector costs to touch: split the 64-dim embedding into M=4
subspaces of 16 dims, train an independent 16-codeword codebook per
subspace, and store each vector as M one-byte codes (4 bytes vs 256
bytes of float32 — 64x). A probe then computes one M x K distance
table against the codebooks and scores every vector by TABLE LOOKUPS
(asymmetric distance computation, ADC) — no per-vector float math at
all. At 100 TB this is the difference between an in-memory index and
one that cannot fit: 10^9 vectors become 4 GB of codes.

Everything reuses the exact-integer discipline of llm/kmeans.py
(floor-quantized micro-units, integer squared-L2, truncating integer
centroid means), which is what makes the WHOLE pipeline — trainer,
encoder, ADC scores — DuckDB-oracle-expressible: the oracle unrolls
the identical Lloyd chain per subspace and must reproduce every code
and every approximate distance bit-for-bit.

All M subspaces train SIMULTANEOUSLY in one dataframe job: the corpus
explodes to (vec_id, m, subvector) grain once, and the subspace id m
simply joins every trainer shuffle key — M independent k-means for
the price of one pipeline (no per-subspace driver loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import table
from .kmeans import EMBED_DIM, QUANT, _quantized

M_SUBSPACES = 4
SUB_DIM = EMBED_DIM // M_SUBSPACES  # 16
PQ_K = 16        # codewords per subspace -> one byte per code
PQ_ITERS = 2     # Lloyd updates before encoding (oracle unrolls these)
PQ_TOP_K = 10
PROBE_VEC_ID = 0

_D2_SQL = (
    "list_sum(list_transform(list_zip(s.sv, c.cv), "
    "z -> (z[1] - z[2]) * (z[1] - z[2])))"
)


def _int_sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _subvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, m, sv): the corpus exploded to subspace grain —
    map-only (slice + posexplode fused into the scan projection)."""
    q = _quantized(spark, sf_dir)
    return q.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {M_SUBSPACES - 1}),"
                f" m -> slice(qv, m * {SUB_DIM} + 1, {SUB_DIM}))"
            )
        ).alias("m", "sv"),
    )


def _pq_assign(sub: DataFrame, centroids: DataFrame) -> DataFrame:
    """Per (vec_id, m) argmin over that subspace's codewords: join on m
    (the codebook rows for one subspace broadcast), then the same
    partial-aggregating min(struct(d2, cid)) as kmeans._assign — the
    exchange carries one row per (vector, subspace), never the xK
    candidate fan-out."""
    cent = centroids.select(
        F.col("m").alias("cm"), "cid", "cv"
    )
    return (
        sub.join(F.broadcast(cent), sub.m == cent.cm)
        .withColumn("d2", _int_sq_dist(F.col("sv"), F.col("cv")))
        .groupBy("vec_id", "m")
        .agg(
            F.min(F.struct("d2", "cid")).alias("best"),
            F.first("sv").alias("sv"),
        )
        .select("vec_id", "m", "sv", F.col("best.cid").alias("cid"))
    )


def pq_codebooks(sub: DataFrame, iters: int = PQ_ITERS) -> DataFrame:
    """M codebooks of PQ_K codewords each, trained by `iters` exact-
    integer Lloyd updates (init: the subvectors of vec_id 1..PQ_K,
    per subspace). Returns (m, cid, cv); localCheckpointed — M x K
    tiny rows — so encode + distance-table branches don't re-run the
    iterative job."""
    centroids = sub.where(F.col("vec_id").between(1, PQ_K)).select(
        "m", F.col("vec_id").alias("cid"), F.col("sv").alias("cv")
    )
    for _ in range(iters):
        assigned = _pq_assign(sub, centroids)
        dims = assigned.select("m", "cid", F.posexplode("sv").alias("pos", "val"))
        means = dims.groupBy("m", "cid", "pos").agg(
            F.expr("sum(val) div count(*)").alias("mean_val")
        )
        centroids = means.groupBy("m", "cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mean_val"))),
                lambda s: s["mean_val"],
            ).alias("cv")
        )
        centroids = centroids.localCheckpoint(eager=True)
    return centroids


def _pq_oracle_ctes() -> str:
    """DuckDB CTE chain mirroring the PQ trainer + encoder + ADC: the
    per-subspace Lloyd unroll is kmeans.lloyd_oracle_ctes with the
    subspace id m threaded through every key."""
    parts = [
        (
            "q AS (SELECT vec_id, list_transform(embedding, "
            f"x -> CAST(floor(x::DOUBLE * {QUANT} + 0.5) AS BIGINT)) AS qv FROM embeddings)"
        ),
        (
            f"sub AS (SELECT vec_id, CAST(t.m AS BIGINT) AS m, "
            f"qv[(t.m*{SUB_DIM}+1):(t.m*{SUB_DIM}+{SUB_DIM})] AS sv "
            f"FROM q, UNNEST(range({M_SUBSPACES})) AS t(m))"
        ),
        (
            f"c0 AS (SELECT m, vec_id AS cid, sv AS cv FROM sub "
            f"WHERE vec_id BETWEEN 1 AND {PQ_K})"
        ),
    ]
    for i in range(1, PQ_ITERS + 1):
        parts += [
            (
                f"a{i} AS (SELECT s.vec_id, s.m, c.cid, row_number() OVER "
                f"(PARTITION BY s.vec_id, s.m ORDER BY {_D2_SQL}, c.cid) AS rn "
                f"FROM sub s JOIN c{i - 1} c ON s.m = c.m)"
            ),
            f"asg{i} AS (SELECT vec_id, m, cid FROM a{i} WHERE rn = 1)",
            (
                f"dims{i} AS (SELECT g.m, g.cid, p.pos, s.sv[p.pos] AS val "
                f"FROM asg{i} g JOIN sub s ON s.vec_id = g.vec_id AND s.m = g.m "
                f"CROSS JOIN (SELECT unnest(range(1, {SUB_DIM + 1})) AS pos) p)"
            ),
            (
                f"mm{i} AS (SELECT m, cid, pos, CAST(sum(val) // count(*) AS BIGINT) "
                f"AS mean_val FROM dims{i} GROUP BY m, cid, pos)"
            ),
            (
                f"c{i} AS (SELECT m, cid, list(mean_val ORDER BY pos) AS cv "
                f"FROM mm{i} GROUP BY m, cid)"
            ),
        ]
    cfin = f"c{PQ_ITERS}"
    parts += [
        (
            f"enc_rank AS (SELECT s.vec_id, s.m, c.cid, row_number() OVER "
            f"(PARTITION BY s.vec_id, s.m ORDER BY {_D2_SQL}, c.cid) AS rn "
            f"FROM sub s JOIN {cfin} c ON s.m = c.m)"
        ),
        "enc AS (SELECT vec_id, m, cid FROM enc_rank WHERE rn = 1)",
        (
            f"dt AS (SELECT c.m, c.cid, {_D2_SQL} AS d FROM {cfin} c "
            f"JOIN (SELECT m, sv FROM sub WHERE vec_id = {PROBE_VEC_ID}) s "
            f"ON s.m = c.m)"
        ),
        (
            f"approx AS (SELECT e.vec_id, CAST(sum(dt.d) AS BIGINT) AS approx_d2 "
            f"FROM enc e JOIN dt ON e.m = dt.m AND e.cid = dt.cid "
            f"WHERE e.vec_id <> {PROBE_VEC_ID} GROUP BY e.vec_id)"
        ),
    ]
    return ",\n".join(parts)


@register(
    "q_llm_ann_pq",
    oracle=f"""
WITH {_pq_oracle_ctes()}
SELECT vec_id, approx_d2
FROM approx
ORDER BY approx_d2, vec_id
LIMIT {PQ_TOP_K}
""",
)
def q_llm_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN: train M=4 x K=16 integer codebooks, encode
    every vector as 4 codes, and answer a probe (vec_id=0) by ADC —
    distance table against the codebooks (M x K = 64 rows, broadcast)
    + per-vector code lookups summed to an EXACT integer approximate
    distance; top-10 nearest by that score.

    Plan: the trainer is PQ_ITERS bounded shuffles at (m, cid, pos)
    grain; encode is one argmin pass (partial-aggregating min-struct);
    ADC is codes ⋈ broadcast(dtable) -> groupBy(vec_id) sum -> top-k
    TakeOrdered. 100 TB: the scored side carries only (vec_id, m,
    cid) — the 64x-compressed representation — so the scan that
    answers a query reads ~4 bytes per vector, and the codebooks +
    distance table stay O(M·K), probe-independent of corpus size.
    Exact-integer scores make the top-k deterministic (ties break on
    vec_id identically in both engines)."""
    sub = _subvectors(spark, sf_dir)
    sub = sub.localCheckpoint(eager=True)  # trainer + encode + probe branches
    books = pq_codebooks(sub)
    codes = _pq_assign(sub, books).select("vec_id", "m", "cid")
    probe = sub.where(F.col("vec_id") == PROBE_VEC_ID).select(
        F.col("m").alias("pm"), F.col("sv").alias("psv")
    )
    dtable = (
        books.join(F.broadcast(probe), books.m == F.col("pm"))
        .select("m", "cid", _int_sq_dist(F.col("psv"), F.col("cv")).alias("d"))
    )
    return (
        codes.where(F.col("vec_id") != PROBE_VEC_ID)
        .join(F.broadcast(dtable), ["m", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("d").alias("approx_d2"))
        .orderBy("approx_d2", "vec_id")
        .limit(PQ_TOP_K)
    )
