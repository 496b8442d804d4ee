"""Near-duplicate clustering: connected components over the LSH pair
graph — the step that turns pairwise near-dup hits into keep-one-per-
cluster decisions in a dedup pipeline.

Spark has no recursive SQL; components are computed by iterative
min-label propagation (small-star style): every node starts as its own
label and repeatedly adopts the minimum label in its neighborhood
until a fixpoint. Each iteration is one join + one aggregation — fully
partition-parallel; the driver only checks the converged flag (a
1-row count, orchestration not data). Iteration count is bounded by
the component diameter — near-dup clusters are tiny (pairs/triples),
and a hard cap guards pathological chains.

The oracle computes the same components with DuckDB's recursive CTE —
an independent fixpoint formulation, so agreement is meaningful.

Scale notes (100 TB): this is the standard open-source big-data CC
shape (alternating small-star/large-star); label propagation state is
(node, label) — O(nodes in pairs), tiny relative to the corpus since
only docs with near-dup hits enter the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register, tracked_persist
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
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    # intermediate persists are unpersisted in-loop; the FINAL labels
    # persist survives into the returned (lazy) plan, so it is tracked
    # for release_persisted() — the one leak the loop can't free itself
    sym = sym.persist()
    labels = tracked_persist(labels)

    for _ in range(MAX_CC_ITERS):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(sym.a)
            .agg(F.min("label").alias("nmin"))
            .select(F.col("a").alias("node"), "nmin")
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
            )
        )
        new_labels = tracked_persist(new_labels)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    sym.unpersist()
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
