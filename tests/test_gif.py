"""GIF codec (operators/gifcodec.py): lossless encode→decode
round-trips across palette sizes / interlace / sub-rectangle frames /
transparency, LZW inverse property, honest-reject boundaries, and the
media_resize integration."""

from __future__ import annotations

import random

from bb_bigdata_log_tools_spark.operators.gifcodec import (
    gif_parse_pixels,
    lzw_decode,
    lzw_encode,
    make_gif,
)
from bb_bigdata_log_tools_spark.operators.multimodal import (
    bmp_resize,
    image_parse_pixels,
    parse_image_dimensions,
)

W, H = 21, 13
ROWS = [
    [((x % 5) * 40, (y % 4) * 50, ((x + y) % 6) * 30) for x in range(W)]
    for y in range(H)
]


def test_lzw_inverse_property():
    rng = random.Random(11)
    for mcs in (2, 3, 5, 8):
        for n in (1, 7, 300, 6000):
            idx = bytes(rng.randrange(1 << mcs) for _ in range(n))
            assert lzw_decode(lzw_encode(idx, mcs), mcs, n) == idx, (mcs, n)


def test_roundtrip_lossless_plain_and_interlaced():
    """GIF is an indexed lossless format: decode must equal the input
    rows exactly, in both row orders."""
    for interlace in (False, True):
        out = gif_parse_pixels(make_gif(W, H, ROWS, interlace=interlace))
        assert out == (W, H, ROWS), interlace


def test_roundtrip_odd_sizes_and_full_palette():
    for w, h in [(1, 1), (7, 3), (16, 16), (33, 17)]:
        rows = [
            [((x % 4) * 37, (y % 4) * 53, ((x + y) % 8) * 30) for x in range(w)]
            for y in range(h)
        ]
        assert gif_parse_pixels(make_gif(w, h, rows)) == (w, h, rows)
    # all 256 palette entries (mcs=8, the widest start width)
    rows = [
        [((y * 16 + x) % 256, ((y * 16 + x) * 7) % 256, ((y * 16 + x) * 13) % 256)
         for x in range(16)]
        for y in range(16)
    ]
    assert gif_parse_pixels(make_gif(16, 16, rows)) == (16, 16, rows)


def test_subframe_composes_on_background():
    rows = [
        [(10, 20, 30) if (x + y) % 3 else (200, 100, 50) for x in range(6)]
        for y in range(4)
    ]
    out = gif_parse_pixels(make_gif(12, 9, rows, frame_rect=(3, 2, 6, 4)))
    assert out is not None
    _, _, orows = out
    bg = orows[0][0]  # background = palette entry 0
    assert orows[2][3] == rows[0][0]  # frame top-left lands at (3, 2)
    assert orows[5][8] == rows[3][5]  # frame bottom-right
    assert orows[8][11] == bg  # outside the frame rect


def test_transparent_pixels_render_as_background():
    rows = [
        [(10, 20, 30) if (x + y) % 3 else (200, 100, 50) for x in range(6)]
        for y in range(4)
    ]
    p = make_gif(
        12, 9, rows, frame_rect=(3, 2, 6, 4), transparent_bgr=(10, 20, 30)
    )
    out = gif_parse_pixels(p)
    assert out is not None
    _, _, orows = out
    bg = orows[0][0]
    assert orows[2][4] == bg  # (fy=0, fx=1) is transparent
    assert orows[2][3] == rows[0][0]  # opaque pixel unchanged


def test_reject_truncated_and_malformed():
    p = make_gif(W, H, ROWS)
    assert gif_parse_pixels(p[: len(p) // 2]) is None
    assert gif_parse_pixels(p[:13]) is None  # header only, no frame
    assert gif_parse_pixels(b"GIF89a\x00\x00") is None
    assert gif_parse_pixels(b"not a gif") is None
    # desynced LZW: corrupt a mid-stream data byte beyond the code space
    i = p.index(b"\x2c") + 11  # into the first data sub-block
    bad = bytearray(p)
    bad[i + 2] ^= 0xFF
    out = gif_parse_pixels(bytes(bad))
    # either an out-of-range code (None) or a decoded-but-different
    # raster — it must never raise, and never equal the original
    assert out != (W, H, ROWS)


def test_header_only_skeleton_rejected_but_dims_parse():
    from bb_bigdata_log_tools_spark.operators.multimodal import make_gif_header

    p = make_gif_header(40, 30)
    assert gif_parse_pixels(p) is None
    assert parse_image_dimensions(p) == ("gif", 40, 30)


def test_media_resize_integration():
    out = bmp_resize(make_gif(W, H, ROWS, interlace=True), 8, 6)
    assert out is not None
    assert parse_image_dimensions(out) == ("bmp", 8, 6)
    assert image_parse_pixels(make_gif(W, H, ROWS)) == (W, H, ROWS)


def test_determinism():
    assert make_gif(W, H, ROWS) == make_gif(W, H, ROWS)


def test_animated_frame_count_and_first_frame_decode():
    from bb_bigdata_log_tools_spark.operators.gifcodec import gif_frame_count
    from bb_bigdata_log_tools_spark.operators.multimodal import make_gif_header

    f0 = [[((x % 4) * 60, (y % 3) * 70, 0) for x in range(10)] for y in range(8)]
    f1 = [[((x % 4) * 60, (y % 3) * 70, 40) for x in range(10)] for y in range(8)]
    p = make_gif(10, 8, f0, extra_frames=[(f1, None), (f1, (2, 1, 8, 7))])
    assert gif_frame_count(p) == 3
    # decoder reads the FIRST frame only
    assert gif_parse_pixels(p) == (10, 8, f0)
    # single-frame and skeleton counts
    assert gif_frame_count(make_gif(10, 8, f0)) == 1
    assert gif_frame_count(make_gif_header(5, 5)) == 0
    assert gif_frame_count(b"not a gif") is None
    # extract_features: animated GIF n_frames is the descriptor count,
    # skeleton keeps the single-image default
    from bb_bigdata_log_tools_spark.operators.multimodal import _decode_payload

    assert _decode_payload("image", p) == (10, 8, 3, True)
    assert _decode_payload("image", make_gif_header(5, 5)) == (5, 5, 1, True)


def test_dictionary_cap_roundtrip():
    """A raster large and random enough to push the LZW string table
    past its 4096-entry cap (codes stop being added, width pinned at
    12) must still round-trip exactly, plain and interlaced — the
    boundary where encoder/decoder table-growth desyncs would show."""
    rng = random.Random(42)
    pal = [((i * 37) % 256, (i * 91) % 256, (i * 13) % 256) for i in range(256)]
    rows = [[pal[rng.randrange(256)] for _ in range(120)] for _ in range(90)]
    assert gif_parse_pixels(make_gif(120, 90, rows)) == (120, 90, rows)
    assert gif_parse_pixels(make_gif(120, 90, rows, interlace=True)) == (
        120, 90, rows,
    )


def test_last_gce_wins_clears_transparency():
    """Two GCEs before the first frame, the second WITHOUT the
    transparency flag: the superseding GCE clears the earlier
    transparent index (reference-renderer last-wins behavior) —
    without the reset, stale transparency painted those pixels as
    background (review-found)."""
    rows = [
        [(10, 20, 30) if (x + y) % 3 else (200, 100, 50) for x in range(6)]
        for y in range(4)
    ]
    p = make_gif(6, 4, rows, transparent_bgr=(10, 20, 30))
    i = p.index(b"\x21\xf9")
    gce_off = p[i : i + 8]
    cleared = bytearray(gce_off)
    cleared[3] &= ~0x01  # drop the transparency flag
    # original (transparent) decode differs from the plain decode...
    plain = gif_parse_pixels(make_gif(6, 4, rows))
    assert gif_parse_pixels(p) != plain
    # ...but inserting a superseding flagless GCE restores plain pixels
    superseded = p[: i + 8] + bytes(cleared) + p[i + 8 :]
    assert gif_parse_pixels(superseded) == plain
