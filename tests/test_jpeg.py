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
        ({"interleaved": False}, 16, 4.0),  # non-interleaved 4:4:4
        ({"interleaved": False, "subsample": 2}, 32, 6.0),
        ({"interleaved": False, "subsample": 2, "restart_interval": 3}, 32, 6.0),
        ({"interleaved": False, "restart_interval": 1}, 16, 4.0),
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


def test_corrupt_progressive_rejected_but_dims_parse():
    """A baseline stream whose SOF is patched to SOF2 is a CORRUPT
    progressive file (its scan header says Ss=0, Se=63 — a DC scan must
    have Se=0, G.1.1.1.1): scan-script validation rejects it, and the
    dimension probe still reads the SOF header."""
    p = bytearray(make_jpeg(8, 8, [[(1, 2, 3)] * 8] * 8))
    p[p.index(b"\xff\xc0") + 1] = 0xC2  # SOF0 → SOF2
    p = bytes(p)
    assert jpeg_parse_pixels(p) is None
    assert image_parse_pixels(p) is None
    assert parse_image_dimensions(p) == ("jpeg", 8, 8)


def test_arithmetic_frame_rejected_but_dims_parse():
    """Arithmetic-coded frames (SOF9) stay an honest stub."""
    p = bytearray(make_jpeg(8, 8, [[(1, 2, 3)] * 8] * 8))
    p[p.index(b"\xff\xc0") + 1] = 0xC9
    p = bytes(p)
    assert jpeg_parse_pixels(p) is None
    assert parse_image_dimensions(p) == ("jpeg", 8, 8)


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"spectral_only": True},
        {"subsample": 2},
        {"subsample": 2, "restart_interval": 2},
        {"subsample": 2, "spectral_only": True},
        {"restart_interval": 1},
        {"grayscale": True},
        {"grayscale": True, "spectral_only": True},
    ],
)
def test_progressive_matches_baseline_exactly(kwargs):
    """Progressive scans carry the SAME quantized coefficients as the
    baseline layouts (the scan script only reorders/refines them), so
    the decode must be bit-identical to the baseline decode — across
    successive approximation, spectral-selection-only, 4:2:0, restart
    markers, and grayscale."""
    ref_kw = {k: v for k, v in kwargs.items() if k != "spectral_only"}
    ref = jpeg_parse_pixels(make_jpeg(W, H, ROWS, **ref_kw))
    out = jpeg_parse_pixels(make_jpeg(W, H, ROWS, progressive=True, **kwargs))
    assert ref is not None and out == ref


def test_progressive_truncated_progression_rejected():
    """Dropping the final refinement scan leaves coefficients pending
    at Al>0 — the completion contract must reject, not render a
    partial-quality image."""
    p = make_jpeg(W, H, ROWS, progressive=True)
    trunc = p[: p.rindex(b"\xff\xda")] + b"\xff\xd9"
    assert jpeg_parse_pixels(trunc) is None


def test_progressive_double_first_scan_rejected():
    """A scan covering a coefficient band already seen at Ah=0 (here:
    the whole last AC scan duplicated) violates the per-coefficient
    scan-script state machine."""
    p = make_jpeg(W, H, ROWS, progressive=True, spectral_only=True)
    i = p.rindex(b"\xff\xda")
    dup = p[:-2] + p[i:-2] + b"\xff\xd9"
    assert jpeg_parse_pixels(dup) is None


def test_progressive_tiny_and_odd_sizes():
    """1×1 and non-MCU-multiple sizes through the full scan script."""
    for w, h in [(1, 1), (7, 3), (17, 9), (16, 16)]:
        rows = [
            [((x * 31) % 256, (y * 17) % 256, (x + y) % 256) for x in range(w)]
            for y in range(h)
        ]
        for kw in ({}, {"subsample": 2}):
            ref = jpeg_parse_pixels(make_jpeg(w, h, rows, **kw))
            out = jpeg_parse_pixels(
                make_jpeg(w, h, rows, progressive=True, **kw)
            )
            assert ref is not None and out == ref, (w, h, kw)


def test_header_only_skeleton_rejected():
    assert jpeg_parse_pixels(make_jpeg_header(100, 50)) is None


def test_truncated_payload_returns_none():
    p = make_jpeg(W, H, ROWS)
    assert jpeg_parse_pixels(p[: len(p) // 2]) is None
    assert jpeg_parse_pixels(b"\xff\xd8\xff\xd9") is None
    assert jpeg_parse_pixels(b"not a jpeg") is None


def test_noninterleaved_multiscan_incomplete_rejected():
    """A file whose only scan covers fewer components than the frame
    (here: an interleaved file whose SOS is patched to Y-only, so Cb/Cr
    never get a scan) must return None at EOI — non-interleaved decode
    finalizes only when EVERY component has been scanned."""
    p = make_jpeg(W, H, ROWS)
    i = p.index(b"\xff\xda")
    seglen = int.from_bytes(p[i + 2 : i + 4], "big")
    body = p[i + 4 : i + 2 + seglen]  # ns, (cs,tt) pairs, ss, se, ahal
    assert body[0] == 3
    new_body = bytes([1]) + body[1:3] + body[-3:]  # Y-only scan header
    patched = (
        p[: i + 2]
        + (2 + len(new_body)).to_bytes(2, "big")
        + new_body
        + p[i + 2 + seglen :]
    )
    assert jpeg_parse_pixels(patched) is None


def test_single_component_subsampled_scan_decodes():
    """ns=1 with sampling factors >1 on a single-component frame: a
    non-interleaved scan rasters the component's OWN block grid, and
    with one component hᵢ=hmax so the grid is unchanged — the decode
    must equal the unpatched grayscale decode (T.81 A.2.2), not
    misplace blocks."""
    p = bytearray(make_jpeg(W, H, ROWS, grayscale=True))
    base = jpeg_parse_pixels(bytes(p))
    assert base is not None
    i = p.index(b"\xff\xc0")
    assert p[i + 11] == 0x11  # SOF0 comp-0 h/v nibbles
    p[i + 11] = 0x22
    assert jpeg_parse_pixels(bytes(p)) == base


def test_fill_bytes_before_restart_marker_tolerated():
    """T.81 B.1.1.2: optional 0xFF fill bytes may precede any marker —
    an extra FF before an RSTn must not fail the decode."""
    p = make_jpeg(W, H, ROWS, restart_interval=2)
    base = jpeg_parse_pixels(p)
    assert base is not None
    j = p.index(b"\xff\xda")
    while True:
        j = p.index(b"\xff", j + 1)
        if 0xD0 <= p[j + 1] <= 0xD7:
            break
    padded = p[:j] + b"\xff" + p[j:]
    assert jpeg_parse_pixels(padded) == base


def test_bmp_resize_integration():
    """media_resize's decode dispatch reaches JPEG: the resized BMP is
    produced and re-parses to the requested dimensions."""
    out = bmp_resize(make_jpeg(W, H, ROWS, subsample=2), 8, 6)
    assert out is not None
    parsed = parse_image_dimensions(out)
    assert parsed == ("bmp", 8, 6)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 34),
        h=st.integers(1, 34),
        sub=st.sampled_from([1, 2]),
        rst=st.sampled_from([0, 1, 3]),
        a=st.integers(0, 12),
        b=st.integers(0, 12),
        c=st.integers(0, 200),
    )
    def test_roundtrip_property_smooth(w, h, sub, rst, a, b, c):
        """Any size (including 1×1 and non-multiples of the MCU), any
        subsampling, with or without restart markers: smooth content
        round-trips within quantization tolerance. (Step-edge content
        legitimately rings at Annex-K quality — that is JPEG, not a
        codec bug — so the tight bound is asserted on gradients.)"""
        rows = [
            [
                (
                    min(a * x + b * y + c, 255),
                    min(b * x + a * y + c // 2, 255),
                    min((a + b) * x + c // 3, 255),
                )
                for x in range(w)
            ]
            for y in range(h)
        ]
        p = make_jpeg(w, h, rows, subsample=sub, restart_interval=rst)
        out = jpeg_parse_pixels(p)
        assert out is not None and (out[0], out[1]) == (w, h)
        errs = [
            abs(u - v)
            for y in range(h)
            for x in range(w)
            for u, v in zip(out[2][y][x], rows[y][x])
        ]
        # the min(·,255) clamp itself introduces a gradient kink, and a
        # steep gradient along the 4:2:0-subsampled axis (e.g. b=12,
        # w=15/h=5) costs up to ~3 extra levels of chroma box-average
        # error, so the bound is looser than the pure-gradient cases
        # (~10); 34 observed on (w=15,h=5,sub=2,a=0,b=12,c=0) with the
        # round-6 decoder too — content, not codec
        assert max(errs) <= 40, max(errs)

    @settings(max_examples=10, deadline=None)
    @given(
        w=st.integers(1, 25),
        h=st.integers(1, 25),
        seed=st.integers(0, 10**6),
    )
    def test_roundtrip_property_noise_decodes(w, h, seed):
        """Arbitrary (high-frequency) content must still DECODE to the
        right dimensions — pixel error may legitimately be large."""
        import random

        rng = random.Random(seed)
        rows = [
            [tuple(rng.randrange(256) for _ in range(3)) for _ in range(w)]
            for _ in range(h)
        ]
        for sub in (1, 2):
            out = jpeg_parse_pixels(make_jpeg(w, h, rows, subsample=sub))
            assert out is not None and (out[0], out[1]) == (w, h)


def test_fill_bytes_between_header_segments_tolerated():
    """T.81 B.1.1.2 also allows 0xFF fill byte runs BETWEEN header
    segments (before DQT/DHT/SOF/SOS, not only before RSTn). The header
    walk must skip the run instead of misreading the marker byte as a
    segment length (ADVICE r6)."""
    p = make_jpeg(W, H, ROWS)
    base = jpeg_parse_pixels(p)
    assert base is not None
    # pad before every header-segment marker up to SOS (DQT/DHT/SOF/SOS)
    padded = bytearray(p[:2])
    pos = 2
    while True:
        marker = p[pos + 1]
        padded += b"\xff\xff\xff"  # a 3-byte fill run before the marker
        if marker == 0xDA:  # SOS: copy the rest verbatim and stop
            padded += p[pos:]
            break
        import struct as _s

        (seglen,) = _s.unpack_from(">H", p, pos + 2)
        padded += p[pos : pos + 2 + seglen]
        pos += 2 + seglen
    assert jpeg_parse_pixels(bytes(padded)) == base


def test_noninterleaved_matches_interleaved_exactly():
    """The two scan layouts carry IDENTICAL quantized coefficients, so
    the decodes must agree bit-for-bit across sampling/restart modes."""
    for kw in [{}, {"subsample": 2}, {"subsample": 2, "restart_interval": 2}]:
        di = jpeg_parse_pixels(make_jpeg(W, H, ROWS, **kw))
        dn = jpeg_parse_pixels(make_jpeg(W, H, ROWS, interleaved=False, **kw))
        assert di is not None and dn == di, kw


def test_fill_byte_runs_before_trailing_eoi():
    """A run of 0xFF fill bytes immediately before the trailing EOI
    (spec-legal padding) must not discard the decoded image — the
    round-7 review found k>=2 fills tripping the pos+4 loop guard."""
    p = make_jpeg(W, H, ROWS)
    base = jpeg_parse_pixels(p)
    assert base is not None
    assert p[-2:] == b"\xff\xd9"
    for k in (1, 2, 3, 7):
        padded = p[:-2] + b"\xff" * k + b"\xff\xd9"
        assert jpeg_parse_pixels(padded) == base, k


def test_partial_interleave_y_cbcr_split():
    """T.81 allows any component subset per scan: the classic
    non-interleaved-Y + interleaved-CbCr pair must decode bit-identical
    to the single fully-interleaved scan (the frame MCU grid is the
    same for every subset)."""
    for kw in [{}, {"subsample": 2}, {"subsample": 2, "restart_interval": 2}]:
        di = jpeg_parse_pixels(make_jpeg(W, H, ROWS, **kw))
        ds = jpeg_parse_pixels(make_jpeg(W, H, ROWS, y_cbcr_split=True, **kw))
        assert di is not None and ds == di, kw


def test_progressive_duplicate_component_scan_rejected():
    """A DC scan naming the same component twice is corrupt — the
    per-scan duplicate guard must reject before any entropy decode
    (states only update after a successful scan, so without the guard
    the duplicate would decode garbage without tripping validation)."""
    p = make_jpeg(16, 16, [[(1, 2, 3)] * 16] * 16, progressive=True)
    i = p.index(b"\xff\xda")
    seglen = int.from_bytes(p[i + 2 : i + 4], "big")
    body = bytearray(p[i + 4 : i + 2 + seglen])
    assert body[0] == 3
    body[3] = body[1]  # second component id := first
    patched = p[: i + 4] + bytes(body) + p[i + 2 + seglen :]
    assert jpeg_parse_pixels(patched) is None
    assert jpeg_parse_pixels(p) is not None


if HAVE_HYPOTHESIS:

    @settings(max_examples=15, deadline=None)
    @given(
        w=st.integers(1, 30),
        h=st.integers(1, 30),
        sub=st.sampled_from([1, 2]),
        rst=st.sampled_from([0, 2]),
        so=st.booleans(),
        seed=st.integers(0, 10**6),
    )
    def test_progressive_property_bit_identical(w, h, sub, rst, so, seed):
        """Any size, any subsampling, with/without restarts, full
        successive-approximation or spectral-only script, arbitrary
        (high-frequency) content: the progressive decode must be
        BIT-IDENTICAL to the baseline decode of the same source —
        noise content drives the EOBn-extension / ZRL-in-refinement /
        correction-bit paths a smooth gradient never reaches."""
        import random

        rng = random.Random(seed)
        rows = [
            [tuple(rng.randrange(256) for _ in range(3)) for _ in range(w)]
            for _ in range(h)
        ]
        ref = jpeg_parse_pixels(
            make_jpeg(w, h, rows, subsample=sub, restart_interval=rst)
        )
        out = jpeg_parse_pixels(
            make_jpeg(w, h, rows, subsample=sub, restart_interval=rst,
                      progressive=True, spectral_only=so)
        )
        assert ref is not None and out == ref
