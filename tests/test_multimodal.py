"""Golden-byte + plumbing tests for the codec-free image header parse.

The parsers (``parse_png_header`` / ``parse_jpeg_header``) are pinned
against HAND-ASSEMBLED byte strings written directly from the public
specs (PNG "Chunk layout"/"IHDR"; ITU T.81 B.2 marker-segment syntax),
NOT against the package's own synthesizer — so a matching bug in
synthesizer and parser cannot cancel out. The registry query's
planted-metadata-twin oracle (``llm_image_header_stats``) then checks
the synthesize→parse roundtrip against arithmetic ground truth.
"""

from __future__ import annotations

import base64
import struct

import pytest
from pyspark.sql import Row

from solana_etl_pipeline_spark.llm.multimodal import (
    decode_image,
    decode_media,
    jpeg_bytes,
    mp4_bytes,
    parse_image_header,
    parse_jpeg_header,
    parse_media_header,
    parse_mp4_header,
    parse_png_header,
    parse_wav_header,
    png_bytes,
    synthesize_image_assets,
    synthesize_media_assets,
    wav_bytes,
)

# A real-world 1x1 RGBA PNG (the canonical transparent-pixel data URI
# payload) — an independent golden, not produced by this package.
GOLDEN_PNG_1X1 = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _golden_jpeg(
    marker: int = 0xC0,
    width: int = 5,
    height: int = 7,
    n_comp: int = 3,
    precision: int = 8,
    fill: bytes = b"",
) -> bytes:
    """Literal ITU T.81 header stream assembled in-test: SOI, APP0,
    COM, optional fill bytes, SOFn. Independent of jpeg_bytes()."""
    sof = struct.pack(">BHHB", precision, height, width, n_comp) + b"".join(
        struct.pack(">BBB", i + 1, 0x11, 0) for i in range(n_comp)
    )
    return (
        b"\xff\xd8"
        + _seg(0xE0, b"JFIF\x00" + bytes(9))
        + _seg(0xFE, b"a comment the walk must skip by length")
        + fill
        + _seg(marker, sof)
        + b"\xff\xd9"
    )


def test_parse_png_golden_real_world():
    h = parse_png_header(GOLDEN_PNG_1X1)
    assert h == {
        "format": "png",
        "width": 1,
        "height": 1,
        "bit_depth": 8,
        "channels": 4,  # color type 6: truecolor + alpha
    }


def test_parse_png_hand_assembled_color_types():
    # Spec-literal IHDR: 8-byte signature, length 13, "IHDR",
    # width/height 4BE each, bit depth, color type (+ the three
    # trailing method bytes and a CRC the parser must not require
    # to be present beyond the read window).
    for color_type, channels in ((0, 1), (2, 3), (3, 1), (4, 2), (6, 4)):
        raw = (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">IIBBBBB", 640, 480, 8, color_type, 0, 0, 0)
        )
        h = parse_png_header(raw)
        assert h["width"] == 640 and h["height"] == 480
        assert h["channels"] == channels, color_type


def test_parse_png_rejects_malformed():
    assert parse_png_header(None) is None
    assert parse_png_header(b"") is None
    assert parse_png_header(b"not a png at all, just text bytes...") is None
    assert parse_png_header(GOLDEN_PNG_1X1[:20]) is None  # truncated IHDR
    # right signature, wrong first chunk
    bad = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IDAT" + bytes(13)
    assert parse_png_header(bad) is None
    # zero dimensions are spec-invalid
    zero = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", 0, 480, 8, 2, 0, 0, 0)
    )
    assert parse_png_header(zero) is None
    # illegal color type
    bad_ct = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", 640, 480, 8, 5, 0, 0, 0)
    )
    assert parse_png_header(bad_ct) is None
    # illegal (bit depth, color type) combos: 16-bit palette, 4-bit RGB
    for depth, ct in ((16, 3), (4, 2), (7, 0)):
        bad_depth = (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">IIBBBBB", 640, 480, depth, ct, 0, 0, 0)
        )
        assert parse_png_header(bad_depth) is None, (depth, ct)
    # dimensions past the spec's 2**31 - 1 cap (which is also the
    # Int32 output bound) quarantine as NULL instead of overflowing
    for w, hgt in ((2**31, 480), (640, 2**32 - 1)):
        too_big = (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + struct.pack(">IIBBBBB", w, hgt, 8, 2, 0, 0, 0)
        )
        assert parse_png_header(too_big) is None, (w, hgt)


def test_parse_jpeg_golden_baseline():
    h = parse_jpeg_header(_golden_jpeg())
    assert h == {
        "format": "jpeg",
        "width": 5,
        "height": 7,
        "bit_depth": 8,
        "channels": 3,
    }


def test_parse_jpeg_sof_family_and_fill_bytes():
    # SOF2 (progressive) carries the same frame header layout
    h2 = parse_jpeg_header(_golden_jpeg(marker=0xC2, n_comp=1))
    assert h2["channels"] == 1 and h2["format"] == "jpeg"
    # 0xFF fill bytes before a marker are legal (T.81 B.1.1.2)
    hf = parse_jpeg_header(_golden_jpeg(fill=b"\xff\xff\xff"))
    assert hf["width"] == 5 and hf["height"] == 7
    # DHT (C4) sits in the SOF numeric range but is NOT a frame header
    dht_then_sof = (
        b"\xff\xd8"
        + _seg(0xC4, bytes(4))
        + _seg(0xC0, struct.pack(">BHHB", 8, 7, 5, 3) + bytes(9))
    )
    hd = parse_jpeg_header(dht_then_sof)
    assert hd["width"] == 5 and hd["height"] == 7


def test_parse_jpeg_rejects_malformed():
    assert parse_jpeg_header(None) is None
    assert parse_jpeg_header(b"\xff\xd8") is None  # SOI alone
    assert parse_jpeg_header(b"\xff\xd8\xff\xd9") is None  # no SOF
    assert parse_jpeg_header(b"plain text") is None
    golden = _golden_jpeg()
    assert parse_jpeg_header(golden[:10]) is None  # truncated mid-APP0
    # SOS before any SOF: entropy data begins, no dimensions
    sos_first = b"\xff\xd8" + _seg(0xDA, b"\x01\x01\x00")
    assert parse_jpeg_header(sos_first) is None


def test_parse_dispatch_and_own_synthesizers_agree():
    # The package synthesizers must of course also parse back — the
    # weaker self-consistency check on top of the independent goldens.
    p = parse_image_header(png_bytes(33, 44, 16, 2))
    assert (p["width"], p["height"], p["bit_depth"], p["channels"]) == (
        33, 44, 16, 3,
    )
    j = parse_image_header(
        jpeg_bytes(21, 12, n_components=1, progressive=True, comment=b"x")
    )
    assert (j["width"], j["height"], j["channels"]) == (21, 12, 1)
    assert parse_image_header(b"neither") is None
    assert parse_image_header(None) is None


def test_decode_image_spark_roundtrip(spark):
    """End-to-end through Arrow: synthesize → decode, including the
    non-image and null-text rows which must yield NULL columns."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="png branch"),
            Row(doc_id=1, text="jpeg branch"),
            Row(doc_id=2, text="raw text, not an image"),
            Row(doc_id=4, text="jpeg, 3 components"),
            Row(doc_id=13, text="jpeg, progressive grayscale"),
            Row(doc_id=8, text=None),
        ],
        "doc_id long, text string",
    )
    out = {
        r.asset_id: r
        for r in decode_image(synthesize_image_assets(docs)).collect()
    }
    assert out[0].format == "png"
    assert (out[0].width, out[0].height) == (16, 16)
    assert out[0].bit_depth == 16  # even id, color type 0 (not palette)
    assert out[0].channels == 1
    assert out[1].format == "jpeg"
    assert (out[1].width, out[1].height) == (17, 17)
    assert out[1].channels == 1  # 1 % 4 == 1 -> grayscale
    assert out[2].format is None and out[2].width is None
    assert out[4].format == "jpeg" and out[4].channels == 3
    assert (out[4].width, out[4].height) == (20, 20)
    # 13 % 8 == 5: progressive SOF2 — parses identically
    assert out[13].format == "jpeg" and out[13].channels == 1
    assert (out[13].width, out[13].height) == (29, 29)
    # 8 % 3 == 2 with null text: null payload rides the whole path
    assert out[8].format is None and out[8].channels is None


# ---- audio/video header parsing (WAV RIFF / MP4 ISO BMFF) ----------


def _golden_wav(
    channels: int = 2,
    rate: int = 44100,
    bits: int = 16,
    data_size: int = 88200,
    chunk_order: str = "fmt_first",
) -> bytes:
    """Spec-literal RIFF assembly, independent of wav_bytes(): chunks
    in either order, with an odd-size junk chunk exercising padding."""
    block = channels * bits // 8
    fmt = b"fmt " + struct.pack(
        "<I", 16
    ) + struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc\x00"  # padded to even
    if chunk_order == "fmt_first":
        # header-only form: the data chunk declares its size but the
        # sample bytes are omitted (nothing after data needs reading)
        body = fmt + junk + b"data" + struct.pack("<I", data_size)
    else:
        # data before fmt: the walk must SKIP the sample bytes by the
        # declared size to reach fmt, so they must be present
        body = (
            junk
            + b"data" + struct.pack("<I", data_size) + bytes(data_size)
            + fmt
        )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_parse_wav_golden():
    h = parse_wav_header(_golden_wav())
    assert h == {
        "format": "wav",
        "channels": 2,
        "sample_rate": 44100,
        "bit_depth": 16,
        "duration_ms": 88200 * 1000 // (44100 * 4),  # 500 ms
        "n_tracks": 1,
    }
    # chunk order must not matter, nor the odd-size chunk's padding
    h2 = parse_wav_header(_golden_wav(chunk_order="data_first"))
    assert h2 == h
    # 8-bit mono
    h3 = parse_wav_header(
        _golden_wav(channels=1, rate=8000, bits=8, data_size=8000)
    )
    assert (h3["channels"], h3["bit_depth"], h3["duration_ms"]) == (1, 8, 1000)


def test_parse_wav_rejects_malformed():
    assert parse_wav_header(None) is None
    assert parse_wav_header(b"RIFF") is None
    assert parse_wav_header(b"RIFFxxxxWAVE") is None  # no chunks at all
    assert parse_wav_header(b"OggS rather than riff data") is None
    g = _golden_wav()
    assert parse_wav_header(g[:20]) is None  # truncated mid-fmt
    # fmt present but no data chunk
    no_data = g[: 12 + 8 + 16]
    assert parse_wav_header(no_data) is None
    # zero sample rate is invalid (a zero rate would divide by zero
    # in the golden builder, so assemble the fmt chunk directly)
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 2, 0, 0, 4, 16
    )
    data = b"data" + struct.pack("<I", 100)
    raw = b"RIFF" + struct.pack("<I", 4 + len(fmt + data)) + b"WAVE" + fmt + data
    assert parse_wav_header(raw) is None
    # sample_rate is u32 on disk but Int32 in the output schema: a
    # corrupt rate past 2**31 - 1 must quarantine as NULL
    big_fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 2, 2**31, 2**32 - 4, 4, 16
    )
    big = (
        b"RIFF" + struct.pack("<I", 4 + len(big_fmt + data)) + b"WAVE"
        + big_fmt + data
    )
    assert parse_wav_header(big) is None


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _golden_mp4(
    timescale: int = 90000,
    duration: int = 450000,
    n_tracks: int = 2,
    version: int = 0,
) -> bytes:
    """Spec-literal ISO BMFF assembly, independent of mp4_bytes()."""
    ftyp = _box(b"ftyp", b"mp42" + struct.pack(">I", 1) + b"mp42isom")
    if version:
        mvhd = _box(
            b"mvhd",
            struct.pack(">B3x", 1)
            + struct.pack(">QQIQ", 10, 20, timescale, duration)
            + bytes(80),
        )
    else:
        mvhd = _box(
            b"mvhd",
            struct.pack(">B3x", 0)
            + struct.pack(">IIII", 10, 20, timescale, duration)
            + bytes(80),
        )
    free = _box(b"free", bytes(4))
    traks = b"".join(_box(b"trak", bytes(16)) for _ in range(n_tracks))
    return ftyp + free + _box(b"moov", free + mvhd + traks)


def test_parse_mp4_golden():
    h = parse_mp4_header(_golden_mp4())
    assert h["format"] == "mp4"
    assert h["duration_ms"] == 5000  # 450000 / 90000 s
    assert h["n_tracks"] == 2
    assert h["channels"] is None and h["sample_rate"] is None
    # version-1 mvhd (64-bit times) parses identically
    h1 = parse_mp4_header(_golden_mp4(version=1, n_tracks=3))
    assert h1["duration_ms"] == 5000 and h1["n_tracks"] == 3


def test_parse_mp4_rejects_malformed():
    assert parse_mp4_header(None) is None
    assert parse_mp4_header(b"\x00\x00\x00\x08ftyp"[:6]) is None
    # first box must be ftyp
    not_ftyp = _box(b"mdat", bytes(8)) + _golden_mp4()
    assert parse_mp4_header(not_ftyp) is None
    g = _golden_mp4()
    assert parse_mp4_header(g[:24]) is None  # truncated before moov
    # moov present but no mvhd inside
    no_mvhd = _box(b"ftyp", b"isom" + bytes(4)) + _box(
        b"moov", _box(b"trak", bytes(8))
    )
    assert parse_mp4_header(no_mvhd) is None
    # corrupt box size (overruns the payload) must not loop or throw
    bad = bytearray(_golden_mp4())
    bad[0:4] = struct.pack(">I", 1 << 30)
    assert parse_mp4_header(bytes(bad)) is None
    # a TRUNCATED mvhd (declares a size too short for its version's
    # fields) followed by a sibling box must parse to None — the
    # bounds check is against the mvhd child's own end, so the
    # sibling's bytes are never misread as timescale/duration
    ftyp = _box(b"ftyp", b"mp42" + struct.pack(">I", 1) + b"mp42isom")
    short_mvhd = _box(b"mvhd", struct.pack(">B3x", 0) + struct.pack(">II", 10, 20))
    sibling = _box(b"trak", struct.pack(">IIII", 90000, 450000, 7, 7))
    assert parse_mp4_header(ftyp + _box(b"moov", short_mvhd + sibling)) is None
    # ... including a zero-length mvhd body (no version byte at all)
    empty_mvhd = _box(b"mvhd", b"")
    assert parse_mp4_header(ftyp + _box(b"moov", empty_mvhd + sibling)) is None
    # version-1 u64 duration that overflows the Int64 duration_ms
    # output column quarantines as NULL
    huge = _golden_mp4(version=1, timescale=1, duration=2**63 - 1)
    assert parse_mp4_header(huge) is None


def test_parse_media_dispatch_and_synthesizers_agree():
    w = parse_media_header(wav_bytes(2, 48000, 16, 24000))
    assert (w["format"], w["duration_ms"]) == ("wav", 500)
    m = parse_media_header(
        mp4_bytes(timescale=1000, duration=2500, n_tracks=1, version=1)
    )
    assert (m["format"], m["duration_ms"], m["n_tracks"]) == ("mp4", 2500, 1)
    assert parse_media_header(b"plain text bytes") is None
    # media parsers must not claim image payloads and vice versa
    assert parse_media_header(GOLDEN_PNG_1X1) is None
    assert parse_image_header(wav_bytes(1, 8000, 8, 80)) is None


def test_decode_media_spark_roundtrip(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="wav branch"),     # 0%3=0: mono 8-bit 8k
            Row(doc_id=9, text="wav branch 2"),   # 9%3=0: stereo 16-bit 48k
            Row(doc_id=4, text="mp4 branch"),     # 4%3=1: even -> ts 90000
            Row(doc_id=13, text="mp4 v1 branch"), # 13%8=5 -> v0; odd -> ts 1000
            Row(doc_id=2, text="not media"),
            Row(doc_id=8, text=None),
        ],
        "doc_id long, text string",
    )
    out = {
        r.asset_id: r
        for r in decode_media(synthesize_media_assets(docs)).collect()
    }
    assert (out[0].format, out[0].channels, out[0].sample_rate,
            out[0].bit_depth) == ("wav", 1, 8000, 8)
    assert out[0].duration_ms == (1000 + 0) * 1000 // 8000
    assert (out[9].channels, out[9].sample_rate, out[9].bit_depth) == (
        2, 48000, 16,  # 9 % 5 == 4 -> rates[4]
    )
    assert out[9].duration_ms == (1000 + 9 % 977) * 1000 // 48000
    assert out[4].format == "mp4"
    assert out[4].n_tracks == 1 + (4 // 3) % 3  # 2
    assert out[4].duration_ms == (90000 * (1 + 4 % 59) + 4 % 7) * 1000 // 90000
    assert out[13].format == "mp4"
    assert out[13].duration_ms == (1000 * (1 + 13 % 59) + 13 % 7) * 1000 // 1000
    assert out[2].format is None and out[2].duration_ms is None
    assert out[8].format is None
