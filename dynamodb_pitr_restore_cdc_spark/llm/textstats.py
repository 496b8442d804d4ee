"""Text analysis (LLM-data-pipeline extension): corpus statistics,
language-ID heuristic, quality scoring, token counting, fingerprinting.

Everything in this module is built-in JVM expressions (split /
higher-order functions / regexp) — no Python in the row path. That is
deliberate: these run over every document of a 100 TB corpus, so the
per-row cost must stay inside whole-stage codegen; Python (pandas_udf)
is reserved for the signature computations in dedup.py/similarity.py
that genuinely need numpy.

Ratio outputs use exact integer rounding ((2000·a + b) div (2·b) /
1000) — same engine-stability discipline as functions/rounding.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.rounding import avg_div
from ..registry import register
from ..sources import table

STOPWORDS = ("the", "a", "data", "row")
_STOP_SQL = "('the', 'a', 'data', 'row')"


@register(
    "q_llm_text_stats",
    oracle="""
WITH t AS (
    SELECT lang, source, n_chars,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents
)
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       ((2 * sum(n_tokens * 100) + count(*)) // (2 * count(*))) / 100.0 AS avg_tokens,
       max(n_chars) AS max_chars
FROM t GROUP BY lang, source
""",
)
def q_llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics by (lang, source): doc counts, token counts,
    exact-integer-rounded average doc length."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        "source",
        "n_chars",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    return (
        t.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum(F.col("n_tokens") * 100).alias("_tok_c"),
            F.max("n_chars").alias("max_chars"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "sum_tokens",
            avg_div("_tok_c", "n_docs").alias("avg_tokens"),
            "max_chars",
        )
    )


@register(
    "q_llm_lang_topwords",
    oracle="""
WITH w AS (
    SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
), counted AS (
    SELECT lang, word, count(*) AS n FROM w GROUP BY lang, word
), ranked AS (
    SELECT lang, word, n,
           row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rn
    FROM counted
)
SELECT lang, word, n, rn FROM ranked WHERE rn <= 5
""",
)
def q_llm_lang_topwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 words per language: explode → count → windowed top-k. The
    explode fans out ~tokens-per-doc rows but aggregates map-side
    before the shuffle (partial counts per (lang, word))."""
    d = table(spark, sf_dir, "documents")
    counted = (
        d.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), "word")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("lang", "word", "n", F.col("rn").cast("bigint").alias("rn"))
    )


@register(
    "q_llm_lang_id",
    oracle="""
WITH f AS (
    SELECT lang,
           length(regexp_replace(text, '[^aeiou]', '', 'g')) AS n_vowels,
           length(replace(text, ' ', '')) AS n_letters
    FROM documents
), pred AS (
    SELECT lang,
           CASE WHEN n_vowels * 100 < n_letters * 33 THEN 'consonantal'
                WHEN n_vowels * 100 < n_letters * 38 THEN 'balanced'
                ELSE 'vocalic' END AS predicted
    FROM f
)
SELECT lang, predicted, count(*) AS n_docs
FROM pred GROUP BY lang, predicted
""",
)
def q_llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (character n-gram class signal): vowel density
    classes per doc, cross-tabulated against the labeled lang — the
    confusion-matrix shape of a real lang-ID eval. Thresholds compare
    in integer space (n_vowels·100 < n_letters·33), so no float
    boundary exists at all."""
    d = table(spark, sf_dir, "documents")
    f = d.select(
        "lang",
        F.length(F.regexp_replace("text", "[^aeiou]", "")).alias("n_vowels"),
        F.length(F.regexp_replace("text", " ", "")).alias("n_letters"),
    )
    pred = f.select(
        "lang",
        F.when(F.col("n_vowels") * 100 < F.col("n_letters") * 33, "consonantal")
        .when(F.col("n_vowels") * 100 < F.col("n_letters") * 38, "balanced")
        .otherwise("vocalic")
        .alias("predicted"),
    )
    return pred.groupBy("lang", "predicted").agg(F.count("*").alias("n_docs"))


@register(
    "q_llm_quality_score",
    oracle=f"""
WITH f AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL})) AS n_stop
    FROM documents
)
SELECT doc_id, n_tokens,
       ((2000 * n_stop + n_tokens) // (2 * n_tokens)) / 1000.0 AS stop_ratio,
       CASE WHEN n_tokens >= 40 AND n_stop * 5 < n_tokens THEN 'good'
            WHEN n_tokens >= 15 THEN 'fair'
            ELSE 'poor' END AS quality
FROM f
""",
)
def q_llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length + stopword-density rules, the
    standard pre-training corpus filter shape. Stopword count uses a
    higher-order filter (JVM-side), ratio is integer-rounded, class
    thresholds compare in integer space."""
    d = table(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    f = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.expr(
            f"size(filter(split(text, ' '), x -> x IN ({stop_list})))"
        ).cast("bigint").alias("n_stop"),
    )
    return f.select(
        "doc_id",
        "n_tokens",
        (F.expr("(2000 * n_stop + n_tokens) div (2 * n_tokens)") / 1000.0).alias("stop_ratio"),
        F.when((F.col("n_tokens") >= 40) & (F.col("n_stop") * 5 < F.col("n_tokens")), "good")
        .when(F.col("n_tokens") >= 15, "fair")
        .otherwise("poor")
        .alias("quality"),
    )


@register(
    "q_llm_token_count",
    oracle="""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_ws_tokens,
       CAST(sum(len(regexp_extract_all(text, '[a-z]{1,4}'))) AS BIGINT) AS sum_bpe_chunks,
       max(len(string_split(text, ' '))) AS max_tokens
FROM documents
GROUP BY source
""",
)
def q_llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish greedy
    ≤4-char chunks (regexp_extract_all) — the cheap proxy for tokenizer
    budget estimation over a corpus, entirely in codegen."""
    d = table(spark, sf_dir, "documents")
    ws = F.size(F.split("text", " ")).cast("bigint")
    bpe = F.size(F.expr("regexp_extract_all(text, '[a-z]{1,4}', 0)")).cast("bigint")
    return (
        d.select("source", ws.alias("ws_tokens"), bpe.alias("bpe_chunks"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws_tokens").alias("sum_ws_tokens"),
            F.sum("bpe_chunks").alias("sum_bpe_chunks"),
            F.max("ws_tokens").alias("max_tokens"),
        )
    )


@register(
    "q_llm_fingerprint",
    oracle="""
SELECT doc_id,
       list_reduce(
           list_prepend(0::BIGINT,
               list_transform(string_split(text, ' '),
                              x -> (ascii(x) + length(x))::BIGINT)),
           (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
FROM documents
""",
)
def q_llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint over the token stream (order-
    sensitive, unlike the bag-of-shingles hashes in dedup.py) — a
    content-defined document id computed as a pure fold, identical in
    both engines because every step is exact bigint arithmetic."""
    d = table(spark, sf_dir, "documents")
    fp = F.expr(
        "aggregate(transform(split(text, ' '), x -> cast(ascii(x) + length(x) as bigint)), "
        "cast(0 as bigint), (a, b) -> (a * 31 + b) % 1000000007)"
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "q_llm_length_percentiles",
    oracle="""
WITH t AS (
    SELECT lang, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
), r AS (
    SELECT lang, n_tokens,
           row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
           count(*) OVER (PARTITION BY lang) AS n
    FROM t
)
SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
       max(CASE WHEN rn = (n + 1) // 2 THEN n_tokens END) AS p50_tokens,
       max(CASE WHEN rn = (9 * n + 9) // 10 THEN n_tokens END) AS p90_tokens,
       max(CASE WHEN rn = (99 * n + 99) // 100 THEN n_tokens END) AS p99_tokens
FROM r GROUP BY lang
""",
)
def q_llm_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length percentiles (p50/p90/p99 token
    counts) — the corpus profile that calibrates chunking budgets and
    length filters. DISCRETE percentiles on purpose: the value at rank
    ceil(q·n), computed with pure integer arithmetic ((q·n + q) div
    denom), because interpolated percentiles multiply by inexact
    binary decimals (0.9·n can land an ulp above an integer and ceil
    to rank+1 — engine-dependent). One shuffle on lang for the rank
    window, rollup rides the same partitioning."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = W.partitionBy("lang").orderBy("n_tokens", "doc_id")
    r = t.select(
        "lang",
        "n_tokens",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("lang")).alias("n"),
    )
    at = lambda rank_expr: F.max(  # noqa: E731
        F.when(F.col("rn") == F.expr(rank_expr), F.col("n_tokens"))
    )
    return r.groupBy("lang").agg(
        F.max("n").alias("n_docs"),
        at("(n + 1) div 2").alias("p50_tokens"),
        at("(9 * n + 9) div 10").alias("p90_tokens"),
        at("(99 * n + 99) div 100").alias("p99_tokens"),
    )


@register(
    "q_llm_vocab_growth",
    oracle="""
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), firsts AS (
    SELECT word, min(doc_id) AS first_doc FROM w GROUP BY word
), n AS (SELECT max(doc_id) + 1 AS n_docs FROM documents),
deciles AS (
    SELECT CAST(((first_doc * 10) // n.n_docs) + 1 AS BIGINT) AS decile,
           count(*) AS new_words
    FROM firsts, n GROUP BY 1
), spine AS (SELECT unnest(generate_series(1, 10)) AS decile)
SELECT CAST(s.decile AS BIGINT) AS decile,
       CAST(coalesce(d.new_words, 0) AS BIGINT) AS new_words,
       CAST(sum(coalesce(d.new_words, 0))
                OVER (ORDER BY s.decile
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS vocab_size
FROM spine s LEFT JOIN deciles d ON s.decile = d.decile
""",
)
def q_llm_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps'-law audit, pure integers): split
    the corpus into 10 doc_id deciles and report how many NEVER-SEEN
    words each decile introduces plus the cumulative vocabulary —
    the curve a curation run watches to decide whether more data still
    buys lexical diversity (a flattening curve means dedup/filtering
    should tighten instead). No regression fit on purpose: the
    exponent is a float eyeball; the curve itself is exact. Plan: one
    explode, min-aggregate per word (partial min absorbs stopword
    heavy-hitters map-side, the paragraph-dedup discipline), a 10-row
    rollup and a 10-row running sum — the window is over a constant-
    size frame, so the single-partition sort is free."""
    d = table(spark, sf_dir, "documents")
    n_docs = d.agg(F.max("doc_id") + 1).first()[0]  # driver scalar
    firsts = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    deciles = firsts.groupBy(
        (F.expr(f"(first_doc * 10) div {n_docs}") + 1).cast("bigint").alias("decile")
    ).agg(F.count("*").alias("new_words"))
    spine = spark.range(1, 11).select(F.col("id").alias("decile"))
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        spine.join(deciles, "decile", "left")
        .select(
            "decile",
            F.coalesce("new_words", F.lit(0)).alias("new_words"),
        )
        .select(
            "decile",
            "new_words",
            F.sum("new_words").over(w).alias("vocab_size"),
        )
    )
