"""Near-duplicate clustering: connected components over the LSH pair
graph — the step that turns pairwise near-dup hits into keep-one-per-
cluster decisions in a dedup pipeline.

Spark has no recursive SQL; components are computed by iterative
min-label propagation (small-star style): every node starts as its own
label and repeatedly adopts the minimum label in its neighborhood
until a fixpoint. Each iteration is one join + one aggregation plus a
pointer-jumping self-lookup (label <- label's label) — fully
partition-parallel; the driver only checks the converged flag (a
1-row count, orchestration not data). Compression makes the iteration
count O(log diameter), so the hard cap covers any graph a near-dup
corpus can produce; exhausting it unconverged raises instead of
returning non-minimal labels.

The oracle computes the same components with DuckDB's recursive CTE —
an independent fixpoint formulation, so agreement is meaningful.

Scale notes (100 TB): this is the standard open-source big-data CC
shape (alternating small-star/large-star); label propagation state is
(node, label) — O(nodes in pairs), tiny relative to the corpus since
only docs with near-dup hits enter the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register, release_checkpoint, tracked_checkpoint
from .dedup import q_llm_near_dedup

MAX_CC_ITERS = 20


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected connected components: (node, cluster_id=min reachable).

    `edges` is a DataFrame of undirected pairs; isolated nodes are not
    represented (callers union them in if needed).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # eager localCheckpoint, not persist: each iteration references
        # `labels` TWICE (directly + inside neighbor_min), so the
        # logical plan DOUBLES per iteration — persist caches the data
        # but Catalyst still walks (and stringifies) the exponential
        # tree, which OOMs the driver once a long-diameter graph runs
        # near the iteration cap. Checkpointing truncates the lineage
        # to the materialized O(edges)/O(nodes) blocks, so every
        # iteration's plan is one join + one aggregate deep.
        # Superseded iteration checkpoints are freed IN-LOOP via
        # release_checkpoint; `sym` is freed after the loop; only the
        # FINAL labels survive into the returned plan (released by
        # release_persisted()).
        .transform(tracked_checkpoint)
    )
    labels = tracked_checkpoint(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )

    converged = False
    for _ in range(MAX_CC_ITERS):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(sym.a)
            .agg(F.min("label").alias("nmin"))
            .select(F.col("a").alias("node"), "nmin")
        )
        new_labels = tracked_checkpoint(
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
            )
        )
        # pointer jumping: label <- label's label. Labels are always
        # node ids, so the self-lookup compresses paths and turns
        # O(diameter) convergence into O(log diameter) — without it a
        # >MAX_CC_ITERS-diameter chain would exhaust the cap.
        compressed = tracked_checkpoint(
            new_labels.join(
                new_labels.select(
                    F.col("node").alias("label"), F.col("label").alias("plabel")
                ),
                "label",
                "left",
            ).select("node", F.coalesce("plabel", "label").alias("label"))
        )
        release_checkpoint(new_labels)
        changed = (
            compressed.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        release_checkpoint(labels)
        labels = compressed
        if changed == 0:
            converged = True
            break

    release_checkpoint(sym)
    if not converged:
        # a silent exit here would return labels that are not the
        # component minimum — fail loudly instead (callers see a wrong
        # ANSWER otherwise, not an error)
        raise RuntimeError(
            f"connected_components did not converge in {MAX_CC_ITERS} iterations"
        )
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


@register(
    "q_llm_dedup_clusters",
    oracle="""
WITH RECURSIVE
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_transform(generate_series(1, len(t) - 2),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
edges AS (SELECT doc_a, doc_b FROM pairs
          JOIN sz sa ON doc_a = sa.doc_id
          JOIN sz sb ON doc_b = sb.doc_id
          WHERE i * 2 >= (sa.n + sb.n - i)),
sym AS (SELECT doc_a AS a, doc_b AS b FROM edges
        UNION SELECT doc_b, doc_a FROM edges),
nodes AS (SELECT DISTINCT a AS id FROM sym),
reach(src, dst) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
)
SELECT src AS doc_id, min(dst) AS cluster_id
FROM reach GROUP BY src
""",
)
def q_llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group near-duplicate documents into clusters (cluster_id = min
    doc_id of the component) — MinHash-LSH pairs in, iterative label
    propagation out; oracle recomputes components with a recursive CTE
    over brute-force-verified Jaccard edges."""
    pairs = q_llm_near_dedup(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), "cluster_id"
    )


def _semantic_dedup_oracle() -> str:
    from .similarity import NEARDUP_COS, _ivf_oracle_prefix

    return f"""
WITH RECURSIVE {_ivf_oracle_prefix()},
m AS (SELECT e.vec_id, e.v, asg.cid FROM e JOIN asg USING (vec_id)),
edges AS (SELECT x.vec_id AS a, y.vec_id AS b
          FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id < y.vec_id
          WHERE list_cosine_similarity(x.v, y.v) >= {NEARDUP_COS}),
sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
nodes AS (SELECT DISTINCT a AS id FROM sym),
reach(src, dst) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
),
lab AS (SELECT src AS vec_id, min(dst) AS cluster_id FROM reach GROUP BY src),
allv AS (SELECT e.vec_id, COALESCE(l.cluster_id, e.vec_id) AS cluster_id
         FROM e LEFT JOIN lab l USING (vec_id))
SELECT vec_id, cluster_id,
       (vec_id = cluster_id) AS keep,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
FROM allv
"""


@register("q_llm_semantic_dedup", oracle=_semantic_dedup_oracle())
def q_llm_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup selection (SemDeDup, Abbas et al. 2023): group
    embedding-space near-duplicates and KEEP exactly one document per
    semantic cluster — the per-vector decision table a curation
    pipeline filters against. Composition of two proven stages: the
    IVF-cell-bucketed cosine pairs of q_llm_embed_neardup (O(n²/K)
    candidates, never all-pairs) feed the iterative min-label
    propagation of q_llm_dedup_clusters; the canonical survivor is the
    min vec_id of each component (= its label, by construction), and
    vectors with no near-dup hit keep themselves via the left join —
    the graph only ever holds docs WITH hits, so CC state stays tiny
    relative to the corpus. Oracle re-runs the full chain — Lloyd
    quantizer, cell-restricted pairing, recursive-CTE components —
    under one hash."""
    from ..sources import table
    from .similarity import embed_neardup_pairs

    pairs = embed_neardup_pairs(spark, sf_dir).select("vec_a", "vec_b")
    labels = connected_components(pairs, "vec_a", "vec_b")
    allv = (
        table(spark, sf_dir, "embeddings")
        .select("vec_id")
        .join(labels.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", "vec_id").alias("cluster_id"),
        )
    )
    wc = W.partitionBy("cluster_id")
    return allv.select(
        "vec_id",
        "cluster_id",
        (F.col("vec_id") == F.col("cluster_id")).alias("keep"),
        F.count("*").over(wc).alias("n_members"),
    )
