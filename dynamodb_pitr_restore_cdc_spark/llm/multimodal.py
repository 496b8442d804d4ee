"""Multimodal column plumbing (LLM-data-pipeline extension).

Pattern for a 100 TB multimodal corpus: media lives as opaque BINARY
columns (or object-store pointers) beside typed metadata; decode /
feature-extract / frame-sample run as Arrow-batched Python over
`mapInPandas`, which streams batches through the worker without ever
materializing a partition in memory — the schema, partitioning, UDF
signature and batch shape here are exactly the production shape.

Codec status (round 7, extended round 15): the header-parseable
formats are decoded for real — `parse_media_blob` is a pure-stdlib
parser of the public BMP (BITMAPINFOHEADER and the legacy
BITMAPCOREHEADER) and RIFF/WAVE container specs (magic sniffing,
little-endian header fields, the word-aligned RIFF chunk walk,
top-down-BMP sign handling) plus the JPEG/JFIF marker stream (ITU
T.81 segment walk to any SOFn frame header: big-endian dims live in
marker metadata, so any real .jpg's size reads without a codec). It
would read any real .bmp/.wav/.jpg header from the wild;
`q_mm_meta_real` exercises all three end-to-end over
generated-on-executor real files. The NotImplementedError seam has
therefore SHRUNK to formats whose metadata needs the coded stream
(PNG's zlib IDAT, MP3 frames, H.264 NAL decode — external libs this
container lacks): `decode_media_batch(..., real_codecs=True)` raises
only for those, at the single clearly-marked point where PIL/ffmpeg
would slot in. The default path still computes deterministic fake
features from the bytes themselves so the generic pipeline is
testable end-to-end (the fixture "media" is the documents' UTF-8
bytes, so the DuckDB oracle can mirror the fakes from n_chars —
ASCII text, one byte per char).
"""

from __future__ import annotations

import struct
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
        # Integration point for PIL / soundfile / pyav decoding of the
        # COMPRESSED formats. Uncompressed BMP/WAV headers are decoded
        # for real by parse_media_blob (q_mm_meta_real path).
        raise NotImplementedError(
            "compressed-format codecs (PNG/MP3/H.264 payload decode) are "
            "not available in this environment; parse_media_blob handles "
            "the stdlib-parseable formats (BMP, WAV, JPEG headers) and "
            "deterministic fake features are the generic test path"
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


# --- real codec path: stdlib parsers for the uncompressed formats ----------

MEDIA_REAL_SCHEMA = (
    "doc_id long, media_kind string, n_bytes long, "
    "width long, height long, sample_rate long, n_samples long"
)


def bmp_bytes(width: int, height: int) -> bytes:
    """A real, spec-conformant 24-bpp .bmp: BITMAPFILEHEADER (14 B) +
    BITMAPINFOHEADER (40 B) + bottom-up pixel array with rows padded to
    4-byte boundaries. Any image viewer opens the result."""
    row = (width * 3 + 3) // 4 * 4
    pixels = bytes(row * height)
    size = 14 + 40 + len(pixels)
    file_header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_header + dib + pixels


def wav_bytes(sample_rate: int, n_samples: int) -> bytes:
    """A real, spec-conformant 16-bit mono PCM .wav: RIFF/WAVE container
    with canonical fmt and data chunks (44-byte header + silence)."""
    data = bytes(n_samples * 2)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


# Fixed byte overhead of jpeg_bytes around its entropy payload: SOI(2)
# + APP0 segment(18) + DQT(69) + SOF0(19) + DHT(22) + SOS(14) + EOI(2).
JPEG_FIXED_BYTES = 146


def jpeg_bytes(width: int, height: int, entropy_len: int = 4) -> bytes:
    """A structurally spec-conformant baseline JFIF/JPEG (ITU T.81
    marker stream): SOI, APP0/JFIF, one quantization table, a
    three-component SOF0 frame header carrying the REAL dimensions
    (big-endian, height before width — the field order every JPEG
    sniffer must get right), one Huffman table, SOS, ``entropy_len``
    stuffing-free entropy bytes, EOI. Every segment length field is
    exact, so a marker walker that mis-skips any segment lands off a
    0xFF boundary and fails loudly. len(result) = JPEG_FIXED_BYTES +
    entropy_len."""
    app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    out = b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    dqt = b"\x00" + bytes(range(1, 65))  # Pq/Tq 0 + 64 8-bit entries
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    comps = b"".join(struct.pack("BBB", cid, 0x11, 0) for cid in (1, 2, 3))
    sof = struct.pack(">BHHB", 8, height, width, 3) + comps
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = b"\x00" + bytes([1] + [0] * 15) + b"\x00"  # one 1-bit code
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = b"\x03" + b"".join(
        struct.pack("BB", cid, 0) for cid in (1, 2, 3)
    ) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bytes(entropy_len)  # 0x00 bytes need no 0xFF byte stuffing
    out += b"\xff\xd9"  # EOI
    return out


def parse_media_blob(blob: bytes) -> dict:
    """The real decode contract: bytes -> typed metadata, by actually
    parsing the public format specs (no libraries). Handles .bmp (both
    BITMAPINFOHEADER and the legacy 12-byte BITMAPCOREHEADER; negative
    height = top-down row order), .wav (full word-aligned RIFF chunk
    walk — unknown chunks like LIST/fact are skipped, fmt and data are
    read wherever they sit), and .jpg HEADERS (round 15: the ITU T.81
    marker walk to any SOFn frame header — dimensions and component
    count come from marker metadata, no entropy decode needed, so this
    reads any real JPEG's size with zero codec libs). Anything else is
    a compressed format whose metadata lives INSIDE the coded stream
    and raises at the documented seam."""
    if blob[:2] == b"BM":
        (dib_size,) = struct.unpack_from("<I", blob, 14)
        if dib_size == 12:  # BITMAPCOREHEADER: 16-bit dims
            width, height = struct.unpack_from("<HH", blob, 18)
        else:  # BITMAPINFOHEADER and later: signed 32-bit dims
            width, height = struct.unpack_from("<ii", blob, 18)
        return {
            "media_kind": "image",
            "n_bytes": len(blob),
            "width": width,
            "height": abs(height),  # negative = top-down, same pixel count
            "sample_rate": None,
            "n_samples": None,
        }
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        pos, channels, bits, rate, data_size = 12, None, None, None, None
        while pos + 8 <= len(blob):
            cid, size = struct.unpack_from("<4sI", blob, pos)
            body = pos + 8
            if cid == b"fmt ":
                channels, rate = struct.unpack_from("<HI", blob, body + 2)
                (bits,) = struct.unpack_from("<H", blob, body + 14)
            elif cid == b"data":
                data_size = size
            pos = body + size + (size & 1)  # RIFF chunks are word-aligned
        # sample math AFTER the walk: the spec does not require fmt to
        # precede data, so depending on encounter order would crash on
        # data-first files (round-7 review finding)
        n_samples = (
            data_size // (channels * bits // 8)
            if None not in (data_size, channels, bits)
            else None
        )
        return {
            "media_kind": "audio",
            "n_bytes": len(blob),
            "width": None,
            "height": None,
            "sample_rate": rate,
            "n_samples": n_samples,
        }
    if blob[:2] == b"\xff\xd8":  # JPEG SOI: walk the marker stream
        pos = 2
        while pos + 4 <= len(blob):
            if blob[pos] != 0xFF:
                break  # lost sync: not a well-formed marker stream
            marker = blob[pos + 1]
            if marker == 0xFF:
                pos += 1  # fill bytes before a marker are legal
                continue
            if marker in (0x01, 0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers carry no length field
                continue
            (seg_len,) = struct.unpack_from(">H", blob, pos + 2)
            # any SOFn frame header (C0-CF except DHT C4, JPG C8,
            # DAC CC) carries precision, height, width, n_components
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                _prec, height, width = struct.unpack_from(">BHH", blob, pos + 4)
                return {
                    "media_kind": "image",
                    "n_bytes": len(blob),
                    "width": width,
                    "height": height,
                    "sample_rate": None,
                    "n_samples": None,
                }
            if marker == 0xDA:
                break  # scan data begins; a frame header had to precede it
            pos += 2 + seg_len
        raise ValueError("JPEG marker stream has no SOF frame header")
    raise NotImplementedError(
        "compressed media formats (PNG/MP3/H.264) need external "
        "codec libraries not present in this environment (JPEG "
        "dimensions are header-parsed above; its PIXELS would too)"
    )


def decode_real_media_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, media binary) -> MEDIA_REAL_SCHEMA via
    the real header parsers. Same bounded-batch Arrow shape as the
    generic decode; nullable Int64 keeps the image/audio-specific
    columns typed as long with nulls across the Arrow boundary."""
    for pdf in it:
        metas = [parse_media_blob(bytes(b)) for b in pdf["media"]]
        out = {"doc_id": pdf["doc_id"].reset_index(drop=True)}
        out["media_kind"] = pd.Series([m["media_kind"] for m in metas])
        for c in ("n_bytes", "width", "height", "sample_rate", "n_samples"):
            out[c] = pd.array([m[c] for m in metas], dtype="Int64")
        yield pd.DataFrame(out)


def build_real_media_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, n_chars) -> real media files by
    doc_id mod 3: .bmp images, 16-bit PCM .wav clips, and (round 15)
    baseline JFIF .jpg marker streams — all dims/rates derived from
    n_chars, deterministic, so the oracle can predict every parsed
    field AND the exact on-disk byte count."""
    for pdf in it:
        blobs = []
        for d, n in zip(pdf["doc_id"], pdf["n_chars"]):
            d, n = int(d), int(n)
            if d % 3 == 0:
                blobs.append(bmp_bytes(n % 31 + 1, n % 17 + 1))
            elif d % 3 == 1:
                blobs.append(wav_bytes(8000 * (n % 3 + 1), n % 100 + 1))
            else:
                blobs.append(jpeg_bytes(n % 200 + 16, n % 120 + 16, n % 50 + 4))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].reset_index(drop=True), "media": blobs}
        )


@register(
    "q_mm_meta_real",
    oracle=f"""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'image' END AS media_kind,
       CASE doc_id % 3
            WHEN 0 THEN 54 + (n_chars % 17 + 1) * (((n_chars % 31 + 1) * 3 + 3) // 4 * 4)
            WHEN 1 THEN 44 + (n_chars % 100 + 1) * 2
            ELSE {JPEG_FIXED_BYTES} + n_chars % 50 + 4 END AS n_bytes,
       CASE doc_id % 3 WHEN 0 THEN n_chars % 31 + 1
                       WHEN 2 THEN n_chars % 200 + 16 END AS width,
       CASE doc_id % 3 WHEN 0 THEN n_chars % 17 + 1
                       WHEN 2 THEN n_chars % 120 + 16 END AS height,
       CASE WHEN doc_id % 3 = 1 THEN 8000 * (n_chars % 3 + 1) END AS sample_rate,
       CASE WHEN doc_id % 3 = 1 THEN n_chars % 100 + 1 END AS n_samples
FROM documents
""",
)
def q_mm_meta_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real-codec path end to end: executors GENERATE actual
    .bmp/.wav/.jpg files (spec-conformant headers + payload) as a
    binary column, then a second Arrow stage decodes them with the
    stdlib header parsers — magic sniffing, little-endian field
    extraction, RIFF chunk walk, and (round 15) the JPEG marker walk
    to the SOF0 frame header. The oracle predicts every parsed field
    from the generator arithmetic, including the exact file byte
    counts (BMP row padding, WAV 44-byte canonical header, JPEG
    fixed marker overhead + entropy run), so a parser that misread
    any header field hash-mismatches. This shrinks the media seam
    another format: only stream-embedded-metadata formats (PNG/MP3/
    H.264 payload decode) remain behind NotImplementedError."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    blobs = docs.mapInPandas(
        build_real_media_batch, schema="doc_id long, media binary"
    )
    return blobs.mapInPandas(decode_real_media_batch, schema=MEDIA_REAL_SCHEMA)
