"""Baseline JPEG codec (operators/jpegcodec.py): encode→decode
roundtrips within quantization tolerance across every mode, honest-stub
boundaries, and the media_resize integration."""

from __future__ import annotations

import statistics

import pytest

from bb_bigdata_log_tools_spark.operators.jpegcodec import (
    jpeg_parse_pixels,
    make_jpeg,
)
from bb_bigdata_log_tools_spark.operators.multimodal import (
    bmp_resize,
    image_parse_pixels,
    make_jpeg_header,
    parse_image_dimensions,
)

W, H = 24, 17
ROWS = [
    [((x * 10) % 256, (y * 13) % 256, (x * 3 + y * 5) % 256) for x in range(W)]
    for y in range(H)
]


def _roundtrip_errs(payload):
    out = jpeg_parse_pixels(payload)
    assert out is not None
    ow, oh, orows = out
    assert (ow, oh) == (W, H)
    return [
        abs(a - b)
        for y in range(H)
        for x in range(W)
        for a, b in zip(orows[y][x], ROWS[y][x])
    ]


@pytest.mark.parametrize(
    "kwargs, max_tol, mean_tol",
    [
        ({}, 16, 4.0),  # 4:4:4
        ({"subsample": 2}, 32, 6.0),  # 4:2:0 (chroma detail lost)
        ({"subsample": 2, "restart_interval": 2}, 32, 6.0),  # + RSTn
        ({"restart_interval": 1}, 16, 4.0),  # RST every MCU
    ],
)
def test_roundtrip_modes(kwargs, max_tol, mean_tol):
    errs = _roundtrip_errs(make_jpeg(W, H, ROWS, **kwargs))
    assert max(errs) <= max_tol, max(errs)
    assert statistics.mean(errs) <= mean_tol


def test_solid_color_near_exact():
    """DC-only blocks: quantization loss is a few levels at most."""
    rows = [[(40, 90, 200)] * 16 for _ in range(16)]
    out = jpeg_parse_pixels(make_jpeg(16, 16, rows, subsample=2))
    errs = [
        abs(a - b)
        for y in range(16)
        for x in range(16)
        for a, b in zip(out[2][y][x], rows[y][x])
    ]
    assert max(errs) <= 6


def test_grayscale_single_component():
    p = make_jpeg(W, H, ROWS, grayscale=True)
    out = jpeg_parse_pixels(p)
    assert out is not None and (out[0], out[1]) == (W, H)
    errs = []
    for y in range(H):
        for x in range(W):
            b, g, r = ROWS[y][x]
            luma = 0.299 * r + 0.587 * g + 0.114 * b
            bb, gg, rr = out[2][y][x]
            assert bb == gg == rr  # gray rows replicate the channel
            errs.append(abs(bb - luma))
    assert max(errs) <= 6


def test_determinism():
    assert make_jpeg(W, H, ROWS, subsample=2) == make_jpeg(
        W, H, ROWS, subsample=2
    )


def test_progressive_rejected_but_dims_parse():
    p = bytearray(make_jpeg(8, 8, [[(1, 2, 3)] * 8] * 8))
    p[p.index(b"\xff\xc0") + 1] = 0xC2  # SOF0 → SOF2
    p = bytes(p)
    assert jpeg_parse_pixels(p) is None
    assert image_parse_pixels(p) is None
    # dimension probe still reads the SOF header — honest-stub contract
    assert parse_image_dimensions(p) == ("jpeg", 8, 8)


def test_header_only_skeleton_rejected():
    assert jpeg_parse_pixels(make_jpeg_header(100, 50)) is None


def test_truncated_payload_returns_none():
    p = make_jpeg(W, H, ROWS)
    assert jpeg_parse_pixels(p[: len(p) // 2]) is None
    assert jpeg_parse_pixels(b"\xff\xd8\xff\xd9") is None
    assert jpeg_parse_pixels(b"not a jpeg") is None


def test_bmp_resize_integration():
    """media_resize's decode dispatch reaches JPEG: the resized BMP is
    produced and re-parses to the requested dimensions."""
    out = bmp_resize(make_jpeg(W, H, ROWS, subsample=2), 8, 6)
    assert out is not None
    parsed = parse_image_dimensions(out)
    assert parsed == ("bmp", 8, 6)
