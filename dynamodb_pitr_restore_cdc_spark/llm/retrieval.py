"""Text retrieval scoring: TF-IDF search and character-n-gram profiles.

Rounding out the text-analysis extension with the two classic corpus
feature extractors: a TF-IDF scorer (the keyword-search / relevance
baseline every corpus pipeline needs next to embedding search) and a
char-bigram frequency profile (the feature representation real
language-ID models are trained on — llm/textstats.py's vowel heuristic
is the inference-time cousin).

Scale notes (100 TB): both are explode → hash-aggregate shapes with
map-side partials; the TF-IDF document-frequency table is tiny (one
row per query term) and broadcasts; nothing touches Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register, tracked_persist
from ..sources import table

QUERY_TERMS = ("spark", "join", "data")
TOP_K_DOCS = 20


@register(
    "q_llm_tfidf_search",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), tf AS (
    SELECT doc_id, w, count(*) AS tf FROM tok
    WHERE w IN {tuple(QUERY_TERMS)}
    GROUP BY doc_id, w
), df AS (
    SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY w
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id,
           sum(tf.tf * ln(n.n_docs / df.df)) AS score
    FROM tf JOIN df USING (w) CROSS JOIN n
    GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {TOP_K_DOCS}
""",
)
def q_llm_tfidf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword search: top-{k} documents for a fixed term set.
    tf comes from a MAP-ONLY pass — one size(filter(tokens, = term))
    per query term stacked to (w, tf) rows — never from exploding the
    full token stream and shuffling it down to 3 terms (the round-1
    shape; the explode put every corpus token on the wire to discard
    all but the query terms). idf is a 3-row broadcast; top-k is
    TakeOrdered. Exact-integer tf/df feed ln() on identical doubles in
    both engines."""
    d = table(spark, sf_dir, "documents")
    n_docs = d.count()  # driver scalar: corpus size (parquet metadata read)
    stack_args = ", ".join(
        f"'{t}', size(filter(t, x -> x = '{t}'))" for t in QUERY_TERMS
    )
    tf = (
        d.select("doc_id", F.split("text", " ").alias("t"))
        .selectExpr("doc_id", f"stack({len(QUERY_TERMS)}, {stack_args}) AS (w, tf)")
        .where(F.col("tf") > 0)
        .select("doc_id", "w", F.col("tf").cast("bigint").alias("tf"))
    )
    # df as a count window over the tf rows ((doc_id, w) is unique, so
    # count(*) per w IS the document frequency): ONE linear plan — no
    # second branch, no persist, no broadcast-join round trip. The tf
    # frame is ≤|terms| rows per matching doc, so the w-window shuffle
    # is tiny at any corpus size.
    scored = (
        tf.withColumn("df", F.count("*").over(W.partitionBy("w")))
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(TOP_K_DOCS)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


@register(
    "q_llm_ngram_profile",
    oracle="""
WITH chars AS (
    SELECT lang, replace(text, ' ', '_') AS t FROM documents
), grams AS (
    SELECT lang,
           unnest(list_transform(generate_series(1, length(t) - 1),
                                 i -> substring(t, i, 2))) AS bigram
    FROM chars
), counted AS (
    SELECT lang, bigram, count(*) AS n FROM grams GROUP BY lang, bigram
), ranked AS (
    SELECT lang, bigram, n,
           row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rn
    FROM counted
)
SELECT lang, bigram, n, rn FROM ranked WHERE rn <= 5
""",
)
def q_llm_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram frequency profile per language (top-5): the
    feature extractor behind n-gram language ID. Bigrams fan out via a
    sequence/substring comprehension — JVM-side, no Python — then the
    standard count + windowed top-k."""
    d = table(spark, sf_dir, "documents")
    # fan-out rebalance: the compact corpus file arrives as ~1 input
    # split, so the ~250x bigram explode would otherwise run on one
    # core; a cheap round-robin exchange of the COMPACT rows spreads
    # the fan-out across the cluster (2.4x measured at sf0.1)
    chars = d.select("lang", F.regexp_replace("text", " ", "_").alias("t")).repartition(
        spark.sparkContext.defaultParallelism
    )
    grams = chars.select(
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("bigram"),
    )
    counted = grams.groupBy("lang", "bigram").agg(F.count("*").alias("n"))
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), "bigram")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("lang", "bigram", "n", F.col("rn").cast("bigint").alias("rn"))
    )


BM25_K1 = 1.2
BM25_B = 0.75

# One byte-identical per-term scoring expression for both engines
# (columns: tf, df, dl, n_docs, total_dl — all exact integers). The
# term score is quantized to integer micro-points BEFORE the per-doc
# sum: integer partial sums are order-independent, so the result is
# stable under any shuffle schedule — a float sum of per-term scores
# would be last-ulp sensitive to merge order.
_BM25_TERM = (
    "floor((ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)"
    " * (tf * CAST(2.2 AS DOUBLE))"
    " / (tf + CAST(1.2 AS DOUBLE) * (1.0 - CAST(0.75 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / (total_dl / n_docs))))"
    " * 1e6 + 0.5)"
)


# One text for the BM25 scoring CTEs (q_llm_bm25_search and the
# cross-feature reranker's recall stage hash against the same body)
_BM25_SCORED_CTES = f"""
dl AS (
    SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
), stats AS (
    SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl FROM dl
), tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), tf AS (
    SELECT doc_id, w, count(*) AS tf FROM tok
    WHERE w IN {tuple(QUERY_TERMS)}
    GROUP BY doc_id, w
), df AS (
    SELECT w, count(*) AS df FROM tf GROUP BY w
), scored AS (
    SELECT tf.doc_id,
           CAST(sum(CAST({_BM25_TERM} AS BIGINT)) AS BIGINT) AS score_u
    FROM tf JOIN df USING (w) JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id
)"""


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score_u) Okapi BM25 micro-point scores for the fixed
    query-term set — the shared recall stage (q_llm_bm25_search ranks
    it; the reranker takes its top candidates)."""
    d = table(spark, sf_dir, "documents")
    # tf and dl each feed TWO plan branches (scored join + their own
    # aggregate); Catalyst has no cross-branch CSE, so without the
    # persists one run scans+explodes the corpus four times
    dl = tracked_persist(
        d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    tf = tracked_persist(
        tok.where(F.col("w").isin(*QUERY_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count("*").alias("df"))
    return (
        tf.join(F.broadcast(df), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(F.expr(_BM25_TERM)).alias("score_u"))
    )


@register(
    "q_llm_bm25_search",
    oracle=f"""
WITH {_BM25_SCORED_CTES}
SELECT doc_id, score_u / 1000000.0 AS score
FROM scored ORDER BY score_u DESC, doc_id LIMIT {TOP_K_DOCS}
""",
)
def q_llm_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranking (k1=1.2, b=0.75) for the fixed query-term set:
    TF-IDF's production-grade successor, adding term-frequency
    saturation and document-length normalization. tf / df / dl /
    corpus stats are all exact integers feeding the byte-identical
    float expression in both engines (_BM25_TERM), per-term scores are
    integer-quantized before the order-independent per-doc sum, and
    top-k is TakeOrdered on the integer score. Scale: the df and
    corpus-stats frames are term-count- and 1-row-sized (broadcast);
    dl is a map-side projection joined on doc_id — one shuffle; the
    documents scan is shared by tok/dl branches at fixture scale and
    worth a persist when the corpus is hot."""
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("score_u").desc(), "doc_id")
        .limit(TOP_K_DOCS)
        .select("doc_id", (F.col("score_u") / 1000000.0).alias("score"))
    )


RERANK_CANDIDATES = 50
RERANK_TOP = 10
_GAP_SENTINEL = 10_000  # single-term docs: "no gap measurable"
_PHRASE_CAP = 99  # phrase hits capped to their packing bucket —
# uncapped, 100+ repeats of one bigram would add a full coverage level
# to rerank_u and let a phrase-spam doc outrank higher-coverage docs
_QUERY_BIGRAMS = tuple(zip(QUERY_TERMS, QUERY_TERMS[1:]))
_BIGRAM_SQL = " OR ".join(
    f"(a.w = '{x}' AND b.w = '{y}')" for x, y in _QUERY_BIGRAMS
)


@register(
    "q_llm_rerank_crossfeat",
    oracle=f"""
WITH {_BM25_SCORED_CTES},
cand AS (
    SELECT doc_id, score_u FROM scored
    ORDER BY score_u DESC, doc_id LIMIT {RERANK_CANDIDATES}),
cd AS (
    SELECT c.doc_id, string_split(d.text, ' ') AS ws
    FROM cand c JOIN documents d USING (doc_id)),
qp AS (
    SELECT doc_id, w, p FROM (
        SELECT doc_id, unnest(ws) AS w,
               unnest(generate_series(1, len(ws))) AS p
        FROM cd)
    WHERE w IN {tuple(QUERY_TERMS)}),
cov AS (SELECT doc_id, count(DISTINCT w) AS coverage FROM qp GROUP BY doc_id),
xf AS (
    -- ONE self-join computes both cross features (the phrase pairs
    -- are a subset of the distinct-term pairs)
    SELECT a.doc_id,
           min(abs(a.p - b.p)) AS min_gap,
           sum(CASE WHEN b.p = a.p + 1 AND ({_BIGRAM_SQL})
                    THEN 1 ELSE 0 END) AS phrase_hits
    FROM qp a JOIN qp b ON a.doc_id = b.doc_id AND a.w <> b.w
    GROUP BY a.doc_id),
feat AS (
    SELECT c.doc_id, c.score_u,
           CAST(cov.coverage AS BIGINT) AS coverage,
           -- capped to its packing bucket, like min_gap: uncapped, a
           -- phrase-spam doc would overflow into the coverage level
           CAST(LEAST(COALESCE(xf.phrase_hits, 0), {_PHRASE_CAP})
                AS BIGINT) AS phrase_hits,
           CAST(COALESCE(xf.min_gap, {_GAP_SENTINEL}) AS BIGINT) AS min_gap
    FROM cand c
    JOIN cov USING (doc_id)
    LEFT JOIN xf USING (doc_id)),
rr AS (
    SELECT *, coverage * 10000000 + phrase_hits * 100000
              + ({_GAP_SENTINEL} - LEAST(min_gap, {_GAP_SENTINEL})) AS rerank_u
    FROM feat)
SELECT CAST(row_number() OVER (ORDER BY rerank_u DESC, score_u DESC, doc_id)
            AS BIGINT) AS rank,
       doc_id, coverage, phrase_hits, min_gap,
       score_u / 1000000.0 AS bm25_score
FROM rr ORDER BY rank LIMIT {RERANK_TOP}
""",
)
def q_llm_rerank_crossfeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval with a cross-encoder-SHAPED reranker
    (round-9 verdict, north-star list): BM25 recalls the top
    {RERANK_CANDIDATES} candidates cheaply (corpus-wide, bag-of-words),
    then a precision stage computes query×document CROSS features that
    need the joint token sequence — distinct-term coverage, query
    bigram (phrase) hits, and minimum position gap between different
    query terms — and re-ranks on an integer score. This is the
    production cost model a neural cross-encoder inherits: the
    expensive pairwise stage touches ONLY the candidate set (positions
    exploded for ≤{RERANK_CANDIDATES} docs, self-joined per doc), never
    the corpus; swapping the integer scorer for a model UDF changes one
    stage. All features are exact integers, so the rerank is
    hash-checkable end to end."""
    cand = tracked_persist(
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("score_u").desc(), "doc_id")
        .limit(RERANK_CANDIDATES)
    )  # referenced by the text join AND the final feature join
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    # positions for candidate docs only — the stage-2 cost contract
    # (0- vs 1-based across engines is irrelevant: only DIFFERENCES
    # of positions feed the features)
    qp = tracked_persist(
        d.join(F.broadcast(cand.select("doc_id")), "doc_id")
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("p", "w"),
        )
        .where(F.col("w").isin(*QUERY_TERMS))
    )  # referenced by cov + both sides of gap/phrase self-joins
    cov = qp.groupBy("doc_id").agg(
        F.countDistinct("w").alias("coverage")
    )
    is_bigram = None
    for x, y in _QUERY_BIGRAMS:
        cond = (F.col("a.w") == x) & (F.col("b.w") == y)
        is_bigram = cond if is_bigram is None else (is_bigram | cond)
    # ONE self-join computes both cross features (the phrase pairs are
    # a subset of the distinct-term pairs) — twin of the oracle's xf
    xf = (
        qp.alias("a")
        .join(
            qp.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.w") != F.col("b.w")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(
            F.min(F.abs(F.col("a.p") - F.col("b.p"))).alias("min_gap"),
            F.sum(
                F.when(
                    (F.col("b.p") == F.col("a.p") + 1) & is_bigram, 1
                ).otherwise(0)
            ).alias("phrase_hits"),
        )
    )
    feat = (
        cand.join(cov, "doc_id")
        .join(xf, "doc_id", "left")
        .select(
            "doc_id",
            "score_u",
            F.col("coverage").cast("bigint").alias("coverage"),
            F.least(
                F.coalesce("phrase_hits", F.lit(0)), F.lit(_PHRASE_CAP)
            ).cast("bigint").alias("phrase_hits"),
            F.coalesce("min_gap", F.lit(_GAP_SENTINEL)).cast("bigint").alias("min_gap"),
        )
        .withColumn(
            "rerank_u",
            F.col("coverage") * 10_000_000
            + F.col("phrase_hits") * 100_000
            + (F.lit(_GAP_SENTINEL) - F.least(F.col("min_gap"), F.lit(_GAP_SENTINEL))),
        )
    )
    w = W.orderBy(
        F.col("rerank_u").desc(), F.col("score_u").desc(), F.col("doc_id")
    )
    # global window over ≤RERANK_CANDIDATES rows (post-TakeOrdered):
    # single-partition by construction, not a scale hazard
    return (
        feat.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= RERANK_TOP)
        .select(
            "rank", "doc_id", "coverage", "phrase_hits", "min_gap",
            (F.col("score_u") / 1000000.0).alias("bm25_score"),
        )
    )
