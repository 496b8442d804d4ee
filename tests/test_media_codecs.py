"""The real (stdlib) media codec path: parse_media_blob must read any
spec-conformant .bmp/.wav — not just the ones our generator writes —
so these tests hand-build format corner cases the generator never
emits (legacy core header, top-down BMP, RIFF with extra odd-sized
chunks) and pin the NotImplementedError seam to compressed formats.
No SparkSession needed: the parsers are plain functions by design."""

import struct

import pytest

from dynamodb_pitr_restore_cdc_spark.llm.multimodal import (
    bmp_bytes,
    decode_media_batch,
    parse_media_blob,
    wav_bytes,
)


def test_bmp_roundtrip():
    m = parse_media_blob(bmp_bytes(13, 7))
    assert m["media_kind"] == "image"
    assert (m["width"], m["height"]) == (13, 7)
    # exact file size: 54-byte headers + 7 rows padded to 4 bytes
    assert m["n_bytes"] == 54 + 7 * ((13 * 3 + 3) // 4 * 4)


def test_bmp_legacy_core_header():
    # BITMAPCOREHEADER (OS/2 v1): 12-byte DIB with UNSIGNED 16-bit dims
    row = (5 * 3 + 3) // 4 * 4
    pixels = bytes(row * 3)
    fh = struct.pack("<2sIHHI", b"BM", 14 + 12 + len(pixels), 0, 0, 26)
    dib = struct.pack("<IHHHH", 12, 5, 3, 1, 24)
    m = parse_media_blob(fh + dib + pixels)
    assert (m["width"], m["height"]) == (5, 3)


def test_bmp_top_down_negative_height():
    blob = bytearray(bmp_bytes(4, 6))
    struct.pack_into("<i", blob, 22, -6)  # top-down row order per spec
    m = parse_media_blob(bytes(blob))
    assert (m["width"], m["height"]) == (4, 6)


def test_wav_roundtrip():
    m = parse_media_blob(wav_bytes(16000, 99))
    assert m["media_kind"] == "audio"
    assert (m["sample_rate"], m["n_samples"]) == (16000, 99)
    assert m["n_bytes"] == 44 + 99 * 2


def test_wav_chunk_walk_skips_unknown_odd_chunks():
    # a LIST chunk of ODD size between fmt and data: the walker must
    # honor RIFF word alignment or it lands mid-chunk and misparses
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)  # stereo
    data = bytes(10 * 4)  # 10 stereo 16-bit frames
    body = b"WAVE"
    body += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    m = parse_media_blob(blob)
    assert (m["sample_rate"], m["n_samples"]) == (44100, 10)


def test_compressed_formats_stay_behind_the_seam():
    png = b"\x89PNG\r\n\x1a\n" + bytes(32)
    with pytest.raises(NotImplementedError, match="compressed"):
        parse_media_blob(png)
    with pytest.raises(NotImplementedError, match="compressed"):
        next(decode_media_batch(iter([]), real_codecs=True))


def test_wav_data_chunk_before_fmt_chunk():
    # the spec does not order chunks; the walk must not depend on
    # encountering fmt first (round-7 review finding)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = bytes(7 * 2)
    body = b"WAVE"
    body += b"data" + struct.pack("<I", len(data)) + data
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    m = parse_media_blob(blob)
    assert (m["sample_rate"], m["n_samples"]) == (8000, 7)


def test_jpeg_roundtrip_exact_size():
    from dynamodb_pitr_restore_cdc_spark.llm.multimodal import (
        JPEG_FIXED_BYTES,
        jpeg_bytes,
    )

    blob = jpeg_bytes(211, 97, entropy_len=33)
    m = parse_media_blob(blob)
    assert m["media_kind"] == "image"
    assert (m["width"], m["height"]) == (211, 97)
    assert m["n_bytes"] == len(blob) == JPEG_FIXED_BYTES + 33
    assert m["sample_rate"] is None and m["n_samples"] is None


def test_jpeg_progressive_sof2_and_extra_appn_segments():
    # a camera-style file: APP1/EXIF and a comment before a
    # PROGRESSIVE (SOF2) frame header — the walker must skip unknown
    # segments by their exact length and accept any SOFn, plus legal
    # 0xFF fill bytes before a marker (T.81 B.1.1.2)
    exif = b"Exif\x00\x00" + bytes(20)
    com = b"shot on a real camera"
    sof2 = struct.pack(">BHHB", 8, 480, 640, 3) + bytes.fromhex("011100021100031100")
    blob = (
        b"\xff\xd8"
        + b"\xff\xe1" + struct.pack(">H", 2 + len(exif)) + exif
        + b"\xff\xfe" + struct.pack(">H", 2 + len(com)) + com
        + b"\xff"  # fill byte
        + b"\xff\xc2" + struct.pack(">H", 2 + len(sof2)) + sof2
        + b"\xff\xd9"
    )
    m = parse_media_blob(blob)
    assert (m["width"], m["height"]) == (640, 480)


def test_jpeg_without_frame_header_fails_loudly():
    import pytest as _pytest

    # SOI then straight to SOS: no SOFn before scan data is malformed
    blob = b"\xff\xd8" + b"\xff\xda" + struct.pack(">H", 3) + b"\x00"
    with _pytest.raises(ValueError, match="no SOF"):
        parse_media_blob(blob)
