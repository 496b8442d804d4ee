"""Multimodal column plumbing (LLM-data-pipeline extension).

Pattern for a 100 TB multimodal corpus: media lives as opaque BINARY
columns (or object-store pointers) beside typed metadata; decode /
feature-extract / frame-sample run as Arrow-batched Python over
`mapInPandas`, which streams batches through the worker without ever
materializing a partition in memory — the schema, partitioning, UDF
signature and batch shape here are exactly the production shape.

The actual codec calls are STUBBED (this container has no image/audio
libraries): `decode_media_batch(..., real_codecs=True)` raises
NotImplementedError at the single clearly-marked point where
PIL/ffmpeg would slot in, and the default path computes deterministic
fake features from the bytes themselves so the pipeline is testable
end-to-end (the fixture "media" is the documents' UTF-8 bytes, so the
DuckDB oracle can mirror the fakes from n_chars — ASCII text, one
byte per char).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import table

MEDIA_META_SCHEMA = (
    "doc_id long, media_kind string, n_bytes long, "
    "width long, height long, n_frames long"
)


def decode_media_batch(
    it: Iterator[pd.DataFrame], real_codecs: bool = False
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, media binary) -> typed media metadata.

    Arrow hands us column batches; we never see (or keep) more than one
    batch, which is what makes this safe for 100 MB media blobs — batch
    size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    if real_codecs:
        # Integration point for PIL / soundfile / pyav decoding.
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "deterministic fake features are the test path"
        )
    for pdf in it:
        n_bytes = pdf["media"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_kind": (n_bytes % 3).map({0: "image", 1: "audio", 2: "video"}),
                "n_bytes": n_bytes,
                "width": n_bytes % 640 + 1,
                "height": (n_bytes * 7) % 480 + 1,
                "n_frames": n_bytes % 16 + 1,
            }
        )


def media_metadata(docs: DataFrame) -> DataFrame:
    """Binary media column -> typed metadata via Arrow-batched decode."""
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("media"))
    return media.mapInPandas(decode_media_batch, schema=MEDIA_META_SCHEMA)


@register(
    "q_mm_meta_extract",
    oracle="""
SELECT doc_id,
       CASE n_chars % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_kind,
       n_chars AS n_bytes,
       n_chars % 640 + 1 AS width,
       (n_chars * 7) % 480 + 1 AS height,
       n_chars % 16 + 1 AS n_frames
FROM documents
""",
)
def q_mm_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media metadata extraction over a binary column through the real
    mapInPandas plumbing (stubbed decode, deterministic features). The
    oracle mirrors the fakes from n_chars — ASCII text, 1 byte/char —
    so the whole binary->Arrow->pandas->schema path is value-checked."""
    return media_metadata(table(spark, sf_dir, "documents"))


RESIZE_MAX_DIM = 64


@register(
    "q_mm_resize_plan",
    oracle=f"""
WITH meta AS (
    SELECT doc_id,
           n_chars % 640 + 1 AS width,
           (n_chars * 7) % 480 + 1 AS height
    FROM documents
    WHERE n_chars % 3 = 0
)
SELECT doc_id, width, height,
       CASE WHEN greatest(width, height) <= {RESIZE_MAX_DIM} THEN width
            ELSE (width * {RESIZE_MAX_DIM}) // greatest(width, height) END AS out_width,
       CASE WHEN greatest(width, height) <= {RESIZE_MAX_DIM} THEN height
            ELSE (height * {RESIZE_MAX_DIM}) // greatest(width, height) END AS out_height,
       greatest(width, height) > {RESIZE_MAX_DIM} AS needs_resize
FROM meta
""",
)
def q_mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize planning for the 'image' media rows: compute target
    dimensions (fit within {max}x{max}, aspect preserved, exact integer
    scaling) from the extracted metadata. The pixel-level resample
    itself is the stubbed codec step (decode_media_batch
    real_codecs=True is where PIL's resize would run per Arrow batch);
    the PLAN — which rows need work and their output shapes — is the
    Spark-side contract, and it is fully value-checked."""
    meta = media_metadata(table(spark, sf_dir, "documents")).where(
        F.col("media_kind") == "image"
    )
    longest = F.greatest("width", "height")
    fits = longest <= RESIZE_MAX_DIM
    return meta.select(
        "doc_id",
        "width",
        "height",
        F.when(fits, F.col("width"))
        .otherwise(F.expr(f"(width * {RESIZE_MAX_DIM}) div greatest(width, height)"))
        .alias("out_width"),
        F.when(fits, F.col("height"))
        .otherwise(F.expr(f"(height * {RESIZE_MAX_DIM}) div greatest(width, height)"))
        .alias("out_height"),
        (~fits).alias("needs_resize"),
    )


@register(
    "q_mm_frame_sample",
    oracle="""
SELECT doc_id,
       unnest(generate_series(0, (n_chars % 16 + 1) - 1, 4)) AS frame_idx
FROM documents
WHERE n_chars % 3 = 2
""",
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' media: every 4th frame index fans out
    to its own row (decode of the sampled frame would hang off each
    row via the same mapInPandas pattern). explode(sequence(...)) is
    the JVM-side fan-out — the Python stub is only consulted for the
    frame COUNT, keeping the multiplication out of Python."""
    meta = media_metadata(table(spark, sf_dir, "documents"))
    return (
        meta.where(F.col("media_kind") == "video")
        .select(
            "doc_id",
            F.explode(F.expr("sequence(0, n_frames - 1, 4)")).alias("frame_idx"),
        )
    )


AUDIO_CHUNK_BYTES = 4096


@register(
    "q_mm_media_curation",
    oracle=f"""
WITH meta AS (
    SELECT doc_id,
           CASE n_chars % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_kind,
           n_chars AS n_bytes,
           n_chars % 640 + 1 AS width,
           (n_chars * 7) % 480 + 1 AS height,
           n_chars % 16 + 1 AS n_frames
    FROM documents
),
work AS (
    SELECT media_kind, n_bytes,
           CASE media_kind
                WHEN 'image' THEN CASE WHEN greatest(width, height) > {RESIZE_MAX_DIM} THEN 1 ELSE 0 END
                WHEN 'video' THEN len(generate_series(0, n_frames - 1, 4))
                ELSE (n_bytes + {AUDIO_CHUNK_BYTES} - 1) // {AUDIO_CHUNK_BYTES}
           END AS work_units
    FROM meta
)
SELECT media_kind,
       count(*) AS n_items,
       CAST(sum(n_bytes) AS BIGINT) AS sum_bytes,
       CAST(sum(work_units) AS BIGINT) AS sum_work_units
FROM work GROUP BY media_kind
""",
)
def q_mm_media_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality work planning in ONE metadata pass — the job a
    media-curation scheduler runs before dispatching decoders: images
    count a work unit when they need resizing, videos one per sampled
    frame (every 4th), audio one per fixed-size chunk. The decode stub
    is consulted once per row for metadata; all the arithmetic and the
    aggregation stay JVM-side, so at 100 TB this is a single
    mapInPandas metadata pass + one partial-aggregated shuffle of K=3
    rows per partition."""
    meta = media_metadata(table(spark, sf_dir, "documents"))
    longest = F.greatest("width", "height")
    work = meta.select(
        "media_kind",
        "n_bytes",
        F.when(F.col("media_kind") == "image", F.when(longest > RESIZE_MAX_DIM, 1).otherwise(0))
        .when(F.col("media_kind") == "video", F.size(F.expr("sequence(0, n_frames - 1, 4)")))
        .otherwise(F.expr(f"(n_bytes + {AUDIO_CHUNK_BYTES} - 1) div {AUDIO_CHUNK_BYTES}"))
        .cast("bigint")
        .alias("work_units"),
    )
    return work.groupBy("media_kind").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("sum_bytes"),
        F.sum("work_units").alias("sum_work_units"),
    )
