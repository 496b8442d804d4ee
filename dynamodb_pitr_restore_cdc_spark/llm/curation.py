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

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register, tracked_persist
from ..sources import table
from .textstats import _STOP_SQL, STOPWORDS

# Knuth multiplicative hashing: doc_id * 2654435761 mod 2^32, then a
# per-mille bucket. Stable across engines (pure BIGINT arithmetic) and
# uniform enough for split assignment — cryptographic mixing buys
# nothing here.
SPLIT_MULT = 2654435761
TRAIN_PERMILLE = 800   # 80 / 10 / 10
VALID_PERMILLE = 900
PACK_BUDGET_TOKENS = 1024


def mult_hash32(col, mult: int) -> F.Column:
    """(col mod 2^32) * mult mod 2^32 with every int64 intermediate
    bounded — the naive ``col * mult`` ANSI-overflows once
    col ≥ 2^63/mult (≈3.47e9 for SPLIT_MULT: a real wall for a
    multi-billion-document corpus, found by the round-14 1000× probe).
    Reduce mod 2^32 FIRST (congruent: (x mod 2^32)·m ≡ x·m mod 2^32),
    then multiply in 16-bit halves so nothing exceeds 2^48:

        x = hi·2^16 + lo,  hi,lo < 2^16
        x·m mod 2^32 = ((hi·m mod 2^16)·2^16 + lo·m) mod 2^32

    Value-identical to the old formulation for 0 ≤ col < 2^32 (the
    entire fixture/oracle domain), so no driver hash moves; past 2^32
    it returns the mathematically-intended residue instead of raising.
    """
    x = F.pmod(col, F.lit(2**32))
    hi = F.shiftright(x, 16)
    lo = x.bitwiseAND(F.lit(0xFFFF))
    return F.pmod(
        F.pmod(hi * F.lit(mult), F.lit(2**16)) * F.lit(2**16) + lo * F.lit(mult),
        F.lit(2**32),
    )


def split_bucket(doc_id_col) -> F.Column:
    return mult_hash32(doc_id_col, SPLIT_MULT) % F.lit(1000)


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


SAMPLE_BUDGET_TOKENS = 2000  # per-lang token budget for the mixture sample


@register(
    "q_llm_token_budget_sample",
    oracle=f"""
WITH t AS (
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           (doc_id * {SPLIT_MULT}) % 4294967296 AS hk
    FROM documents
), r AS (
    SELECT doc_id, lang, n_tokens,
           row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS sample_rank,
           CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY hk, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_tokens
    FROM t
)
SELECT doc_id, lang, n_tokens,
       CAST(sample_rank AS BIGINT) AS sample_rank, cum_tokens,
       (cum_tokens <= {SAMPLE_BUDGET_TOKENS}) AS keep
FROM r
""",
)
def q_llm_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget sampling per domain — the data-mixing
    primitive that cuts each language's corpus down to a fixed token
    budget: documents are ranked by the multiplicative doc_id hash (a
    reproducible shuffle — re-running after appending documents never
    reorders the existing prefix), and the kept set is the hash-order
    prefix whose cumulative token count fits the budget. Unlike
    q_llm_domain_cap (top-N DOCS by quality), the budget is in TOKENS —
    what a training mixture actually allocates. 100 TB: the per-lang
    window sort is the exactness step only; because hk is uniform, the
    cutoff is ≈ a hash threshold, so at scale one first aggregates
    token mass per (lang, hash-bucket) to find the cutoff bucket
    (O(buckets) agg), map-filters everything below it, and runs this
    exact window only inside the straddling bucket."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        mult_hash32(F.col("doc_id"), SPLIT_MULT).alias("hk"),
    )
    wo = W.partitionBy("lang").orderBy("hk", "doc_id")
    wrun = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    r = t.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.row_number().over(wo).cast("bigint").alias("sample_rank"),
        F.sum("n_tokens").over(wrun).alias("cum_tokens"),
    )
    return r.withColumn(
        "keep", F.col("cum_tokens") <= SAMPLE_BUDGET_TOKENS
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


def five_grams(df) -> "DataFrame":
    """(doc_id, distinct word 5-gram) over any (doc_id, text) frame —
    THE gram definition (decontaminate, its per-domain report, the
    streaming twin and both corpus-build capstones all derive from it;
    a gram-shape change can never desynchronize their shared oracles).
    Map-side explode only; the size guard keeps sequence() ascending
    (size-4 >= 1). The compact (doc_id, words) rows are rebalanced
    before the gram fan-out: corpus frames arrive as ONE input split,
    so the explode (the pipeline's biggest row multiplier) would run
    on a single core (SCALE.md round-5 pattern, r15 profile)."""
    w = df.select("doc_id", F.split("text", " ").alias("w")).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    return w.where(F.size("w") >= 5).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(w) - 4), "
                    "i -> concat_ws(' ', slice(w, i, 5)))"
                )
            )
        ).alias("gram"),
    )


def quality_exact_dedup(docs) -> "DataFrame":
    """Stages 1-2 of the curation pipeline (quality filter: length ≥ 40
    tokens + stopword density < 20%; exact dedup: keep lowest doc_id
    per content hash) over a (doc_id, lang, source, text) frame — ONE
    implementation for q_llm_corpus_curation and both corpus-build
    capstones (the thresholds live here and in the shared oracle CTEs
    only). Output carries n_tokens/n_stop/rn alongside the input
    columns. Callers that reference the result more than once persist
    it."""
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    q = docs.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.expr(f"size(filter(split(text, ' '), x -> x IN ({stop_list})))")
        .cast("bigint")
        .alias("n_stop"),
    )
    kept = q.where(
        (F.col("n_tokens") >= 40) & (F.col("n_stop") * 5 < F.col("n_tokens"))
    )
    wd = W.partitionBy(F.md5("text")).orderBy("doc_id")
    return kept.withColumn("rn", F.row_number().over(wd)).where(F.col("rn") == 1)


# the q/kept/deduped CTE text matching quality_exact_dedup — shared by
# the corpus-curation and corpus-build oracles (one statement of the
# thresholds per dialect)
QUALITY_DEDUP_CTES = f"""q AS (
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
)"""



@register(
    "q_llm_corpus_curation",
    oracle=f"""
WITH {QUALITY_DEDUP_CTES},
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
    dedup (keep lowest doc_id per content hash; both stages =
    quality_exact_dedup, one implementation with the corpus-build
    capstones) → train-split selection (the q_llm_train_test_split
    hash) → corpus stats per (lang, source). One query, three shuffles
    (dedup window, final agg, and nothing else — filters and the split
    are map-side), which is the whole point: curation over 100 TB is a
    pipeline of fused scans, not a sequence of materialized passes."""
    deduped = quality_exact_dedup(table(spark, sf_dir, "documents"))
    train = deduped.where(split_bucket(F.col("doc_id")) < TRAIN_PERMILLE)
    return train.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("sum_tokens")
    )


# Second multiplicative constant (xxhash PRIME32_2) for the sampling
# hash: independent of the SPLIT_MULT stream so mixture sampling never
# correlates with split assignment (a doc's split must not bias its
# survival probability).
SAMPLE_MULT = 2246822519

_SAMPLE_BUCKET_SQL = f"((doc_id * {SAMPLE_MULT}) % 4294967296) % 1000"
# per-source target keep-rate in permille, derived arithmetically from
# the source ordinal so both dialects compute it without a lookup table
_RATE_SQL = f"(100 + (CAST(substr(source, 4) AS BIGINT) * 97) % 800)"


def sample_bucket(doc_id_col) -> F.Column:
    """Spark twin of _SAMPLE_BUCKET_SQL — the mixture-sampling hash
    bucket (split_bucket's sibling; round-12 promotion so consumers
    stop re-typing the expression). Accepts a column name OR a Column,
    symmetric with mix_rate — a bare NAME would otherwise silently
    become lit-string arithmetic (NULL buckets, every row filtered)."""
    col = F.col(doc_id_col) if isinstance(doc_id_col, str) else doc_id_col
    return mult_hash32(col, SAMPLE_MULT) % F.lit(1000)


def mix_rate(source_col) -> F.Column:
    """Spark twin of _RATE_SQL — the per-source keep-rate in permille.

    Accepts a column name OR a Column, like its sibling sample_bucket
    (round-12 advice: the old F.expr string-interpolation garbled an
    actual Column argument)."""
    col = F.col(source_col) if isinstance(source_col, str) else source_col
    return 100 + (F.substring(col, 4, 2**31 - 1).cast("bigint") * 97) % 800


# Engine-owned bloom filter, built and probed entirely with JVM
# expressions (no Python, no UDF, no driver-side sketch object): k
# xxhash64 positions per key are bit-or'd into 64-bit blocks, the
# block map is collapsed to ONE broadcastable row, and the probe is a
# map lookup + bit test fused into the scan. At 2^22 bits the single
# row is ~0.5 MB; at 100 TB vocabulary scale, m grows linearly with
# the distinct-key estimate (or shards by key range) — the shape stays
# a broadcast row either way.
BLOOM_BITS = 1 << 22
BLOOM_K = 3


def _bloom_pos_sql(col: str, i: int) -> str:
    # identical SQL on build and probe sides: same hash, same position
    return f"pmod(xxhash64({col}, {i}), {BLOOM_BITS})"


def bloom_build(df: DataFrame, col: str = "gram") -> DataFrame:
    """ONE-row DataFrame: {bf: map<block_id, or-of-bits>} over df[col]."""
    pos = df.select(
        F.explode(
            F.array(*[F.expr(_bloom_pos_sql(col, i)) for i in range(BLOOM_K)])
        ).alias("pos")
    )
    blocks = (
        pos.select(
            F.expr("shiftright(pos, 6)").alias("block"),
            F.expr("shiftleft(1L, cast(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("block")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )
    return blocks.agg(
        F.map_from_entries(F.collect_list(F.struct("block", "bits"))).alias("bf")
    )


def bloom_might_contain(col: str = "gram"):
    """Predicate over (row with `col`, broadcast-joined `bf` map): true
    iff all k bloom bits are set. No false negatives; false positives
    are removed by the exact equijoin that follows."""
    return F.expr(
        " AND ".join(
            f"(coalesce(element_at(bf, shiftright({_bloom_pos_sql(col, i)}, 6)), 0L)"
            f" & shiftleft(1L, cast({_bloom_pos_sql(col, i)} % 64 AS INT))) != 0"
            for i in range(BLOOM_K)
        )
    )


# decontamination truth CTEs — ONE text shared by q_llm_decontaminate
# and the per-domain report, so the gram/split semantics cannot
# silently diverge between the oracles. Yields per_doc(doc_id,
# n_shared, contaminated) over the test split.
_DECON_CTES = f"""
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(ws) - 3),
                    i -> array_to_string(ws[i:i+4], ' ')))) AS gram
      FROM w WHERE len(ws) >= 5),
train_grams AS (
    SELECT DISTINCT gram FROM g WHERE {_SPLIT_BUCKET_SQL} < {TRAIN_PERMILLE}),
test_docs AS (
    SELECT doc_id FROM documents WHERE {_SPLIT_BUCKET_SQL} >= {VALID_PERMILLE}),
hits AS (
    SELECT g.doc_id, count(*) AS n_shared
    FROM g JOIN train_grams t ON g.gram = t.gram
    WHERE {_SPLIT_BUCKET_SQL} >= {VALID_PERMILLE}
    GROUP BY g.doc_id),
per_doc AS (
    SELECT d.doc_id,
           COALESCE(h.n_shared, 0) AS n_shared,
           CAST(COALESCE(h.n_shared, 0) > 0 AS INTEGER) AS contaminated
    FROM test_docs d LEFT JOIN hits h ON d.doc_id = h.doc_id)"""


@register(
    "q_llm_decontaminate",
    oracle=f"WITH {_DECON_CTES}\nSELECT doc_id, n_shared, contaminated FROM per_doc\n",
)
def q_llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered entry: `decontaminate` in auto-bloom mode (the
    pre-prune engages above BLOOM_AUTO_MIN_BYTES of corpus; full
    semantics + scale analysis on `decontaminate` below)."""
    return decontaminate(spark, sf_dir, use_bloom=None)


# The bloom build is a FIXED cost (explode k positions over the train
# vocabulary, or-reduce to one broadcast map row) that only pays once
# the probe-side exchange it prunes is large: measured at sf0.1 the
# bloom ADDS ~4 s against a sub-second join (SCALE.md records the
# crossover), so auto mode engages it by corpus bytes — a zero-job,
# deterministic proxy for probe-side volume. Both paths are
# bit-identical by construction (no false negatives; the exact join
# removes false positives) and CI asserts that equality.
BLOOM_AUTO_MIN_BYTES = 256 << 20


def _corpus_bytes(sf_dir: str, name: str = "documents.parquet") -> int:
    p = os.path.join(sf_dir, name)
    if os.path.isfile(p):
        return os.path.getsize(p)
    total = 0
    for dp, _, fs in os.walk(p):
        total += sum(os.path.getsize(os.path.join(dp, f)) for f in fs)
    return total


def decontaminate(
    spark: SparkSession, sf_dir: str, use_bloom: bool | None = None
) -> DataFrame:
    """Benchmark decontamination: flag held-out (test-split) documents
    that share any word 5-gram with the training split — the standard
    n-gram-overlap leak check run before every LLM training job. The
    train side reduces to DISTINCT grams before the join (at 100 TB
    that's the difference between joining the corpus and joining its
    vocabulary); the join key is the gram itself so the check is
    exact, and both sides reuse the deterministic multiplicative-hash
    split (q_llm_train_test_split) — decontamination must see the SAME
    split the trainer will.

    Scale: gram explosion is ~n_words rows per doc but map-side only;
    the single shuffle is the gram-equijoin. Its build side (distinct
    train grams) is the corpus vocabulary, and the probe side is
    PRE-PRUNED by an engine-owned bloom filter (``bloom_build`` /
    ``bloom_might_contain``): one broadcast row of or'd bit blocks,
    probed map-side, so test grams that cannot match never enter the
    exchange — at 100 TB that removes the overwhelmingly-clean test
    corpus from the shuffle (measured reduction in SCALE.md). The
    bloom engages in auto mode only above ``BLOOM_AUTO_MIN_BYTES`` of
    corpus — below the crossover its fixed build cost exceeds the
    join it prunes (measured at sf0.1, SCALE.md). The
    bloom has no false negatives and the exact equijoin removes its
    false positives, so results are bit-identical with or without it.
    The train vocabulary is referenced twice (bloom build + join
    build) and therefore tracked_persist-ed — the one-materialization
    rule for multiply-referenced plans. No Python anywhere."""
    grams = five_grams(
        table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    bucket = split_bucket(F.col("doc_id"))
    train_grams = grams.where(bucket < TRAIN_PERMILLE).select("gram").distinct()
    test_grams = grams.where(bucket >= VALID_PERMILLE)
    if use_bloom is None:
        use_bloom = _corpus_bytes(sf_dir) >= BLOOM_AUTO_MIN_BYTES
    if use_bloom:
        # vocabulary referenced twice (bloom build + join build)
        train_grams = tracked_persist(train_grams)
        test_grams = (
            test_grams.join(F.broadcast(bloom_build(train_grams)))
            .where(bloom_might_contain("gram"))
            .drop("bf")
        )
    hits = (
        test_grams.join(train_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    test_docs = (
        table(spark, sf_dir, "documents")
        .where(split_bucket(F.col("doc_id")) >= VALID_PERMILLE)
        .select("doc_id")
    )
    return test_docs.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
        (F.coalesce("n_shared", F.lit(0)) > 0).cast("int").alias("contaminated"),
    )


@register(
    "q_llm_contamination_report",
    oracle=f"""
WITH {_DECON_CTES}
SELECT s.source,
       CAST(count(*) AS BIGINT) AS n_test_docs,
       CAST(sum(p.contaminated) AS BIGINT) AS n_contaminated,
       CAST(sum(p.n_shared) AS BIGINT) AS shared_grams,
       CAST((2000 * sum(p.contaminated) + count(*)) // (2 * count(*))
            AS BIGINT) AS contamination_permille
FROM per_doc p JOIN documents s ON p.doc_id = s.doc_id
GROUP BY s.source
""",
)
def q_llm_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contamination report (round-9 verdict, north-star
    list): the q_llm_decontaminate per-doc result joined back to the
    corpus's source domain and rolled up — which DOMAINS leak training
    n-grams into the held-out split, at what rate (integer half-up
    permille), and how many grams. This is the artifact a curation
    owner actually reads before re-cutting a split: the per-doc frame
    is diagnosis, the per-domain rate is the decision. Composition of
    existing operators — one extra broadcast-able join + one partial-agg
    groupBy over the test split (~10% of the corpus); the n-gram
    equijoin cost is decontaminate's, unchanged."""
    rep = decontaminate(spark, sf_dir, use_bloom=None)
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        rep.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_test_docs"),
            F.sum(F.col("contaminated").cast("bigint")).alias("n_contaminated"),
            F.sum("n_shared").alias("shared_grams"),
        )
        .withColumn(
            "contamination_permille",
            F.expr(
                "(2000 * n_contaminated + n_test_docs) div (2 * n_test_docs)"
            ),
        )
    )


@register(
    "q_llm_domain_mix",
    oracle=f"""
SELECT source,
       CAST({_RATE_SQL} AS BIGINT) AS target_permille,
       count(*) AS n_total,
       CAST(sum(CASE WHEN {_SAMPLE_BUCKET_SQL} < {_RATE_SQL} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM documents
GROUP BY source
""",
)
def q_llm_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: down-sample each source domain to a
    target keep-rate (permille) so the training mixture matches a
    recipe, using a second independent multiplicative hash of doc_id —
    NOT rand() — so the sample is reproducible across runs, engines,
    and partitionings, and composes with the train/test split without
    correlation. Selection is a map-side predicate (zero shuffle); the
    reported per-domain kept/total summary is one partial-agg
    groupBy. At 100 TB the sampler is a fused scan filter — the only
    full-corpus cost is the scan itself."""
    d = table(spark, sf_dir, "documents")
    # unbounded suffix, matching the oracle's substr(source, 4): a
    # length-capped substring would silently diverge past 10 digits
    rate = 100 + (F.expr("substring(source, 4)").cast("bigint") * 97) % 800
    b_sample = mult_hash32(F.col("doc_id"), SAMPLE_MULT) % F.lit(1000)
    return (
        d.select("source", rate.alias("target_permille"), b_sample.alias("b"))
        .groupBy("source", "target_permille")
        .agg(
            F.count("*").alias("n_total"),
            F.sum((F.col("b") < F.col("target_permille")).cast("bigint")).alias("n_kept"),
        )
        .select("source", "target_permille", "n_total", "n_kept")
    )


@register(
    "q_llm_repetition_filter",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
s AS (SELECT doc_id,
             len(ws) AS n_words,
             list_max(list_transform(list_distinct(ws),
                      x -> len(list_filter(ws, y -> y = x)))) AS top_word_n,
             len(ws) - 1 AS n_bigrams,
             len(list_distinct(list_transform(range(1, len(ws)),
                      i -> ws[i] || ' ' || ws[i + 1]))) AS n_distinct_bigrams
      FROM w WHERE len(ws) >= 2)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(top_word_n AS BIGINT) AS top_word_n,
       CAST(n_bigrams - n_distinct_bigrams AS BIGINT) AS n_dup_bigrams,
       CAST((top_word_n * 10 > n_words * 3)
            OR ((n_bigrams - n_distinct_bigrams) * 10 > n_bigrams * 2)
            AS INTEGER) AS repetitive
FROM s
""",
)
def q_llm_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: drop documents dominated by a
    single word (top-word fraction > 0.3) or by repeated bigrams
    (duplicate-bigram fraction > 0.2). Everything is computed INSIDE
    the row with JVM higher-order array functions — mode-of-array via
    transform+filter over distinct words, duplicate bigrams via
    array_distinct — so the whole filter is map-only: ZERO shuffles,
    no explode, no Python. That is the 100 TB shape: quality filters
    must fuse into the scan, not fan the corpus out into a
    words-exploded shuffle. Thresholds compare in integer space
    (n*10 > m*3), never float ratios."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    stats = d.where(F.size("w") >= 2).select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_words"),
        # mode-of-array as the max adjacent-run length over the SORTED
        # words: O(len log len) per row, vs the O(distinct × len) of
        # transform(distinct, x -> size(filter(...))) — on a 100k-word
        # document that quadratic form is ~10^9 comparisons in one
        # task, the one way a map-only filter can still die at scale
        F.expr(
            "aggregate(array_sort(w),"
            " named_struct('prev', cast(null as string), 'run', 0, 'best', 0),"
            " (acc, x) -> named_struct("
            "   'prev', x,"
            "   'run', IF(x <=> acc.prev, acc.run + 1, 1),"
            "   'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1, 1))),"
            " acc -> acc.best)"
        )
        .cast("bigint")
        .alias("top_word_n"),
        (F.size("w") - 1).cast("bigint").alias("n_bigrams"),
        F.expr(
            "size(array_distinct(transform(sequence(1, size(w) - 1), "
            "i -> concat(w[i - 1], ' ', w[i]))))"
        )
        .cast("bigint")
        .alias("n_distinct_bigrams"),
    )
    return stats.select(
        "doc_id",
        "n_words",
        "top_word_n",
        (F.col("n_bigrams") - F.col("n_distinct_bigrams")).alias("n_dup_bigrams"),
        (
            (F.col("top_word_n") * 10 > F.col("n_words") * 3)
            | ((F.col("n_bigrams") - F.col("n_distinct_bigrams")) * 10 > F.col("n_bigrams") * 2)
        )
        .cast("int")
        .alias("repetitive"),
    )


DOMAIN_CAP = 12  # per-source cap for the cap-based sampler


@register(
    "q_llm_domain_cap",
    oracle=f"""
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
FROM (
    SELECT doc_id, source,
           row_number() OVER (
               PARTITION BY source
               ORDER BY {_SAMPLE_BUCKET_SQL}, doc_id) AS rk
    FROM documents)
WHERE rk <= {DOMAIN_CAP}
""",
)
def q_llm_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap-based mixture control (the complement of q_llm_domain_mix's
    rate-based sampler): keep at most K documents per source domain,
    chosen by the deterministic sampling-hash order — a reproducible
    'uniform random K' that never depends on partitioning or arrival
    order. Spark's WindowGroupLimit rewrite turns the rank filter into
    a per-partition top-K push-down: each map task keeps K rows per
    group BEFORE the shuffle, so the exchange carries O(groups × K),
    not the corpus — the same physical shape as q_win_topk_per_group,
    which is what makes a per-domain cap viable over 100 TB."""
    d = table(spark, sf_dir, "documents")
    b_sample = mult_hash32(F.col("doc_id"), SAMPLE_MULT) % F.lit(1000)
    w = W.partitionBy("source").orderBy(b_sample, F.col("doc_id"))
    return (
        d.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= DOMAIN_CAP)
    )


@register(
    "q_llm_rarity_score",
    oracle="""
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
c AS (
    SELECT doc_id, count(*) OVER (PARTITION BY word) AS wc FROM w)
SELECT doc_id,
       count(*) AS n_words,
       CAST(sum(wc) AS BIGINT) AS sum_freq,
       CAST(min(wc) AS BIGINT) AS min_freq,
       CAST(sum(wc) // count(*) AS BIGINT) AS mean_freq
FROM c GROUP BY doc_id
""",
)
def q_llm_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics quality signal: score each document by the
    global frequency of its words — documents full of corpus-rare
    words (low mean/min frequency) are OOV-heavy or noisy; documents
    of only ultra-common words carry little signal. This is the
    integer-exact stand-in for an n-gram LM perplexity filter: the
    frequency table IS a unigram model, and staying in counts (never
    log-probs) keeps every value engine-stable.

    The frequency attaches via a count window over `word`, NOT a
    groupBy+self-join — the join shape would reference the exploded
    words twice and (no cross-branch CSE) scan the corpus twice. One
    explode, one shuffle on word, one re-shuffle on doc_id. At 100 TB
    the word partition carries heavy-hitter skew; AQE skew-split
    handles it (the stopword partitions split at mapper boundaries)."""
    d = table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    c = w.select("doc_id", F.count("*").over(W.partitionBy("word")).alias("wc"))
    return c.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("wc").alias("sum_freq"),
        F.min("wc").alias("min_freq"),
        F.expr("sum(wc) div count(*)").alias("mean_freq"),
    )


CHUNK_WORDS = 32   # context-window chunk size
CHUNK_STRIDE = 24  # 8-word overlap between consecutive chunks


@register(
    "q_llm_doc_chunking",
    oracle=f"""
WITH t AS (
    SELECT doc_id, len(string_split(text, ' ')) AS n,
           CASE WHEN len(string_split(text, ' ')) <= {CHUNK_WORDS} THEN 0
                ELSE (len(string_split(text, ' ')) - {CHUNK_WORDS} + {CHUNK_STRIDE} - 1)
                     // {CHUNK_STRIDE} END AS k
    FROM documents),
s AS (
    SELECT doc_id, n, unnest(generate_series(0, k * {CHUNK_STRIDE}, {CHUNK_STRIDE})) AS start_word
    FROM t)
SELECT doc_id,
       CAST(start_word // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(start_word AS BIGINT) AS start_word,
       CAST(least({CHUNK_WORDS}, n - start_word) AS BIGINT) AS n_chunk_words
FROM s
""",
)
def q_llm_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking for RAG / training-example construction:
    each document becomes overlapping fixed-size word windows (32-word
    chunks, 24-word stride). The chunk PLAN is computed map-side from
    the word count alone — sequence + explode, no shuffle, no text
    duplication (consumers slice the text lazily by word offsets) —
    because at 100 TB materializing overlapping text copies would
    inflate the corpus ~1.33× before a single chunk is used. The
    start sequence is ascending by construction (k ≥ 0), dodging the
    descending-sequence(1,0) gotcha."""
    d = table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " "))
    k = F.when(n <= CHUNK_WORDS, F.lit(0)).otherwise(
        F.expr(
            f"((size(split(text, ' ')) - {CHUNK_WORDS}) + {CHUNK_STRIDE} - 1)"
            f" div {CHUNK_STRIDE}"
        )
    )
    t = d.select("doc_id", n.alias("n"), k.alias("k"))
    return t.select(
        "doc_id",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("k") * CHUNK_STRIDE, F.lit(CHUNK_STRIDE))
        ).alias("start_word"),
    ).select(
        "doc_id",
        (F.col("start_word") / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
        F.col("start_word").cast("bigint").alias("start_word"),
        F.least(F.lit(CHUNK_WORDS), F.col("n") - F.col("start_word"))
        .cast("bigint")
        .alias("n_chunk_words"),
    )


# Per-token negative log-likelihood under the corpus unigram model,
# quantized to integer micro-nats BEFORE the per-doc sum (exact
# integer partials => order-independent; the BM25 pattern,
# llm/retrieval._BM25_TERM). Byte-identical in both engines: wc and
# total are exact integers, int/int division is IEEE double in both.
_NLL_TERM = "floor((- ln(wc / total)) * 1e6 + 0.5)"


@register(
    "q_llm_unigram_logprob",
    oracle=f"""
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
t AS (SELECT count(*) AS total FROM w),
c AS (
    SELECT doc_id, count(*) OVER (PARTITION BY word) AS wc FROM w),
s AS (
    SELECT doc_id,
           count(*) AS n_words,
           CAST(sum(CAST({_NLL_TERM} AS BIGINT)) AS BIGINT) AS nll_u
    FROM c CROSS JOIN t GROUP BY doc_id)
SELECT doc_id, n_words, (nll_u / n_words) / 1e6 AS avg_nll
FROM s
""",
)
def q_llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score: each document's average per-token
    negative log-likelihood under the corpus's own unigram
    distribution — the classic cheap perplexity filter (high avg-NLL =
    OOV-heavy/noisy, very low = boilerplate). q_llm_rarity_score is
    the counts-only sibling; this one IS the log-prob version, made
    engine-stable by deriving every float from exact integers through
    the byte-identical _NLL_TERM expression and summing in integer
    micro-nats (order-independent partials — a float sum would be
    merge-order sensitive). Same physical shape as rarity: one
    explode, count window on word (AQE skew-split absorbs stopword
    heavy-hitters), re-shuffle on doc_id; the corpus token total rides
    in as a driver scalar (corpus metadata at 100 TB)."""
    d = table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    total = w.count()  # driver scalar: corpus token count (metadata)
    c = w.select(
        "doc_id",
        F.count("*").over(W.partitionBy("word")).alias("wc"),
        F.lit(total).alias("total"),
    )
    s = c.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum(F.expr(_NLL_TERM)).alias("nll_u"),
    )
    return s.select(
        "doc_id",
        "n_words",
        (F.expr("nll_u / n_words") / F.lit(1e6)).alias("avg_nll"),
    )


_SPLIT_A = f"((a.doc_id * {SPLIT_MULT}) % 4294967296) % 1000"
_SPLIT_B = f"((b.doc_id * {SPLIT_MULT}) % 4294967296) % 1000"


@register(
    "q_llm_leakage_audit",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_transform(generate_series(1, len(t) - 2),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       FROM toks),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (SELECT a.doc_id AS train_doc, b.doc_id AS eval_doc, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s
          WHERE {_SPLIT_A} < {TRAIN_PERMILLE}
            AND {_SPLIT_B} >= {TRAIN_PERMILLE}
          GROUP BY 1, 2)
SELECT train_doc, eval_doc,
       CASE WHEN ((eval_doc * {SPLIT_MULT}) % 4294967296) % 1000 < {VALID_PERMILLE}
            THEN 'valid' ELSE 'test' END AS eval_split,
       ((2000 * i + (sa.n + sb.n - i)) // (2 * (sa.n + sb.n - i))) / 1000.0 AS jaccard
FROM pairs
JOIN sz sa ON train_doc = sa.doc_id
JOIN sz sb ON eval_doc = sb.doc_id
-- rounded-milli threshold, matching the Spark side's j_milli >= 500
-- filter exactly at the [0.4995, 0.5) boundary (see q_llm_near_dedup)
WHERE ((2000 * i + (sa.n + sb.n - i)) // (2 * (sa.n + sb.n - i))) >= 500
""",
)
def q_llm_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level train→eval leakage audit: near-duplicate pairs
    (J ≥ 0.5) that CROSS the deterministic split boundary — the
    document-granular complement of n-gram decontamination
    (q_llm_decontaminate drops contaminated grams; this names the
    whole leaked documents so curation can drop or re-split them).
    Composes the session's LSH band-index artifact with the split
    hash: candidates are band-bucket collisions where side a is train
    and side b is not (each cross pair appears in exactly one
    orientation, so no a<b dedup is needed), then exact-Jaccard
    verification over the Arrow UDF. Same O(n·bands) candidate shape
    as q_llm_near_dedup — the audit costs a filtered fraction of the
    dedup pass it reuses the index from. Oracle: brute-force shingle
    join restricted to cross-split pairs (test-SF only)."""
    from .dedup import JACCARD_THRESHOLD, band_buckets, jaccard_milli

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    bands = band_buckets(spark, sf_dir).withColumn(
        "is_train", split_bucket(F.col("doc_id")) < TRAIN_PERMILLE
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & F.col("a.is_train")
            & ~F.col("b.is_train"),
        )
        .select(
            F.col("a.doc_id").alias("train_doc"),
            F.col("b.doc_id").alias("eval_doc"),
        )
        .distinct()
    )
    verified = (
        cand.join(
            d.select(F.col("doc_id").alias("train_doc"), F.col("text").alias("text_a")),
            "train_doc",
        )
        .join(
            d.select(F.col("doc_id").alias("eval_doc"), F.col("text").alias("text_b")),
            "eval_doc",
        )
        .withColumn("j_milli", jaccard_milli("text_a", "text_b"))
        .where(F.col("j_milli") >= int(JACCARD_THRESHOLD * 1000))
    )
    return verified.select(
        "train_doc",
        "eval_doc",
        F.when(split_bucket(F.col("eval_doc")) < VALID_PERMILLE, "valid")
        .otherwise("test")
        .alias("eval_split"),
        (F.col("j_milli") / 1000.0).alias("jaccard"),
    )


@register(
    "q_llm_bigram_logprob",
    oracle="""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bi AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
       FROM d, UNNEST(generate_series(1, len(t) - 1)) AS g(i)),
c AS (SELECT doc_id,
             count(*) OVER (PARTITION BY w1, w2) AS c2,
             count(*) OVER (PARTITION BY w1) AS c1
      FROM bi),
s AS (SELECT doc_id, count(*) AS n_bigrams,
             CAST(sum(CAST(floor((- ln(c2 / c1)) * 1e6 + 0.5) AS BIGINT))
                  AS BIGINT) AS nll_u
      FROM c GROUP BY doc_id)
SELECT doc_id, n_bigrams, (nll_u / n_bigrams) / 1e6 AS avg_nll
FROM s
""",
)
def q_llm_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score — the context-sensitive upgrade of
    q_llm_unigram_logprob: each document's average per-transition
    negative log-likelihood under the corpus's own bigram model,
    P(w2|w1) = c(w1,w2)/c(w1·) estimated from the SAME corpus (MLE —
    every observed transition has count ≥ 1, so no smoothing mass is
    needed; templated/boilerplate text scores low surprise, scrambled
    text scores high). Float discipline identical to the unigram
    scorer: the per-bigram nll is quantized to integer micro-nats
    through byte-identical expression text BEFORE summation, so the
    aggregate is shuffle-order-independent and hash-stable.

    Plan (skew-safe by the paragraph-dedup rule — a count window over
    a hot w1 cannot be split, so NO windows over word keys): bigrams
    from a map-side transform comprehension (no lead window — the
    transition list is in-row), pre-aggregated to (doc, w1, w2,
    multiplicity) grain, then c2 = Σm per bigram and c1 = Σc2 per w1
    — BOTH two-phase hash aggregates whose partial step pre-reduces
    stopword heavy-hitters map-side — joined back (equi-shaped, AQE
    skew-splittable) and rolled up per doc; each occurrence
    contributes m × the quantized term."""
    d = (
        table(spark, sf_dir, "documents")
        # split once (the old expr re-evaluated split(text) three times
        # per row) and rebalance the compact rows before the bigram
        # fan-out: the corpus is one input split, so the explode and
        # the (doc, bigram) partial agg otherwise run on a single core
        # (r15 profile: a 3.3 s one-task stage — the SCALE.md round-5
        # fan-out pattern)
        .select("doc_id", F.split("text", " ").alias("t"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    bi = d.select(
        "doc_id",
        F.explode(
            # size guard first: sequence(1, 0) yields [1, 0] (descending),
            # not empty — the CLAUDE.md comprehension gotcha
            F.expr(
                "CASE WHEN size(t) < 2 THEN"
                " CAST(array() AS array<struct<w1: string, w2: string>>)"
                " ELSE transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1,"
                "             element_at(t, i + 1) AS w2)) END"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    # (doc, bigram) multiplicities: referenced by the count chain AND
    # the scoring join (no cross-branch CSE)
    g = tracked_persist(
        bi.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("m"))
    )
    c2 = tracked_persist(
        g.groupBy("w1", "w2").agg(F.sum("m").alias("c2"))
    )  # feeds c1 AND the scoring join
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    s = (
        g.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.sum(
                F.expr("m * CAST(floor((- ln(c2 / c1)) * 1e6 + 0.5) AS BIGINT)")
            ).alias("nll_u"),
        )
    )
    return s.select(
        "doc_id",
        "n_bigrams",
        (F.expr("nll_u / n_bigrams") / F.lit(1e6)).alias("avg_nll"),
    )
