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
    jpeg_bytes,
    parse_image_header,
    parse_jpeg_header,
    parse_png_header,
    png_bytes,
    synthesize_image_assets,
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
