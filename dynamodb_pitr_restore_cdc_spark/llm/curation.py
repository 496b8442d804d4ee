"""Corpus curation (LLM-data-pipeline extension): deterministic
train/valid/test splitting, sequence packing, and the composed
filter→dedup→split curation pipeline — the operations that turn a raw
document corpus into training data.

Everything is built-in JVM expressions (the textstats.py discipline):
these passes touch every document of the corpus, so no Python in the
row path. Determinism is load-bearing throughout — a training split
must be REPRODUCIBLE across runs, engines, and partitionings, so the
split is a multiplicative hash of the stable doc_id (Knuth's 2654435761
mod 2^32 scheme), not rand(): re-running the pipeline after appending
documents never reassigns an existing document's split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources import table
from .textstats import _STOP_SQL, STOPWORDS

# Knuth multiplicative hashing: doc_id * 2654435761 mod 2^32, then a
# per-mille bucket. Stable across engines (pure BIGINT arithmetic; at
# >2^32 doc_ids widen to the 64-bit constant) and uniform enough for
# split assignment — cryptographic mixing buys nothing here.
SPLIT_MULT = 2654435761
TRAIN_PERMILLE = 800   # 80 / 10 / 10
VALID_PERMILLE = 900
PACK_BUDGET_TOKENS = 1024


def split_bucket(doc_id_col) -> F.Column:
    return F.pmod(doc_id_col * F.lit(SPLIT_MULT), F.lit(2**32)) % F.lit(1000)


_SPLIT_BUCKET_SQL = f"((doc_id * {SPLIT_MULT}) % 4294967296) % 1000"


@register(
    "q_llm_train_test_split",
    oracle=f"""
SELECT doc_id, lang,
       CAST({_SPLIT_BUCKET_SQL} AS BIGINT) AS bucket,
       CASE WHEN {_SPLIT_BUCKET_SQL} < {TRAIN_PERMILLE} THEN 'train'
            WHEN {_SPLIT_BUCKET_SQL} < {VALID_PERMILLE} THEN 'valid'
            ELSE 'test' END AS split
FROM documents
""",
)
def q_llm_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by multiplicative
    doc_id hash — map-only, no shuffle, reproducible under any
    partitioning (the property rand()-based splits lack). At 100 TB
    this is a projection fused into whatever scan runs next."""
    d = table(spark, sf_dir, "documents")
    b = split_bucket(F.col("doc_id"))
    return d.select(
        "doc_id",
        "lang",
        b.cast("bigint").alias("bucket"),
        F.when(b < TRAIN_PERMILLE, "train")
        .when(b < VALID_PERMILLE, "valid")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "q_llm_seq_packing",
    oracle=f"""
WITH t AS (
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
c AS (
    SELECT lang, n_tokens,
           sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM t
)
SELECT lang,
       CAST((cum - n_tokens) // {PACK_BUDGET_TOKENS} AS BIGINT) AS pack_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
FROM c GROUP BY lang, pack_id
""",
)
def q_llm_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: documents are laid end-to-end in a
    stable order (doc_id within lang) and cut into fixed token-budget
    packs — pack_id = prefix-tokens-before-me div budget, the SQL form
    of greedy in-order packing (a straddling document joins the pack it
    starts in). One window + one aggregation, both partitioned by
    lang, so the shuffle key is the same end to end. Order-sensitivity
    is the point: packing must be bit-reproducible for resumable
    training, hence the stable sort key, not arrival order."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.select(
            "lang",
            F.expr(f"(cum - n_tokens) div {PACK_BUDGET_TOKENS}").alias("pack_id"),
            "n_tokens",
        )
        .groupBy("lang", "pack_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("pack_tokens"))
    )


@register(
    "q_llm_corpus_curation",
    oracle=f"""
WITH q AS (
    SELECT doc_id, lang, source, text,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL})) AS n_stop
    FROM documents
),
kept AS (
    SELECT * FROM q
    WHERE n_tokens >= 40 AND n_stop * 5 < n_tokens
),
deduped AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM kept
    ) WHERE rn = 1
),
train AS (
    SELECT * FROM deduped WHERE {_SPLIT_BUCKET_SQL} < {TRAIN_PERMILLE}
)
SELECT lang, source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM train GROUP BY lang, source
""",
)
def q_llm_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline — quality filter ('good' docs only:
    length + stopword-density rules from q_llm_quality_score) → exact
    dedup (keep lowest doc_id per content hash) → train-split selection
    (the q_llm_train_test_split hash) → corpus stats per (lang,
    source). One query, three shuffles (dedup window, final agg, and
    nothing else — filters and the split are map-side), which is the
    whole point: curation over 100 TB is a pipeline of fused scans,
    not a sequence of materialized passes."""
    d = table(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    q = d.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.expr(f"size(filter(split(text, ' '), x -> x IN ({stop_list})))")
        .cast("bigint")
        .alias("n_stop"),
    )
    kept = q.where((F.col("n_tokens") >= 40) & (F.col("n_stop") * 5 < F.col("n_tokens")))
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = kept.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    train = deduped.where(split_bucket(F.col("doc_id")) < TRAIN_PERMILLE)
    return train.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("sum_tokens")
    )
