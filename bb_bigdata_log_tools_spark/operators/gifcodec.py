"""GIF codec — pure Python, from the public GIF89a specification.

Closes the last header-only image class with real-world crawl weight:
:func:`gif_parse_pixels` is a REAL decoder for the FIRST frame of a
GIF87a/GIF89a stream — sub-block reassembly, the GIF flavor of LZW
(variable code width 3..12 bits, LSB-first packing, late code-width
change, clear/end codes, 4095-entry dictionary), global and local
color tables, the 4-pass interlace order, frame sub-rectangles
composed onto a background-filled logical screen, and GIF89a graphic
control transparency (transparent pixels render as the background
color — the deterministic choice a fixture oracle needs; browsers
composite onto the page, which has no analog here).
:func:`make_gif` is the matching fixture encoder with a REAL greedy
LZW compressor (not the clear-code-spam degenerate form), palette
built from the pixel rows.

Honest-stub boundary (returns None → ``decoded=false`` downstream):
streams with no color table at all, LZW code streams that desync, and
truncated files. Later frames of an animation are NOT composed — the
first frame is the decode target (the thumbnail/dedup use case);
frame COUNTS stay with the header walk in :mod:`.multimodal`.

Reference parity note: the reference repo (/root/reference) ships no
image decoding — this module serves the training-data-pipeline
extension scope (multimodal columns), like :mod:`.jpegcodec`.
"""

from __future__ import annotations

import struct


# --------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, late code-width change)
# --------------------------------------------------------------------------


class _LsbBitReader:
    """LSB-first bit reader over the reassembled data-sub-block bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int | None:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return None
            self.acc |= self.data[self.pos] << self.nbits
            self.nbits += 8
            self.pos += 1
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray | None:
    """GIF LZW → exactly ``n_pixels`` palette indices, or None on a
    desynced/truncated code stream. Dictionary capped at 4095 (codes
    stop being added until the next clear, per the spec); the code
    width grows when the NEXT code to assign would not fit (late
    change — the flavor every GIF writer uses)."""
    if not 2 <= min_code_size <= 11:
        return None
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    br = _LsbBitReader(data)
    # dict as list: codes 0..clear-1 are single bytes
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = br.read(width)
        if code is None:
            return None
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None  # desync
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        return None
    del out[n_pixels:]  # spec-legal trailing output beyond the raster
    return out


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Greedy GIF LZW compressor — exact inverse of :func:`lzw_decode`
    (round-trip unit-tested): emit clear, grow the string table until
    4095, stop adding when full (no mid-stream re-clears needed for
    fixture-sized rasters), end code last."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step)


def gif_parse_pixels(payload: bytes) -> tuple[int, int, list] | None:
    """(width, height, rows) from the FIRST frame of a GIF, or None.
    rows[y][x] = (b, g, r) top row first — the module's BMP-native
    convention (multimodal.make_bmp). Malformed/truncated payloads
    return None, never raise."""
    try:
        return _gif_parse_pixels(payload)
    except (struct.error, IndexError, ValueError):
        return None


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int] | None:
    chunks = []
    n = len(payload)
    while True:
        if pos >= n:
            return None
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            return None
        chunks.append(payload[pos : pos + size])
        pos += size


def _gif_parse_pixels(payload: bytes) -> tuple[int, int, list] | None:
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack_from("<HH", payload, 6)
    if w == 0 or h == 0:
        return None
    from bb_bigdata_log_tools_spark.operators.multimodal import (
        MAX_DECODE_PIXELS,
    )

    if w * h > MAX_DECODE_PIXELS:
        return None  # decompression-bomb guard (screen raster alloc)
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        if pos + 3 * size > len(payload):
            return None
        gct = [
            (payload[pos + 3 * i], payload[pos + 3 * i + 1], payload[pos + 3 * i + 2])
            for i in range(size)
        ]
        pos += 3 * size
    transparent: int | None = None
    n = len(payload)
    while pos < n:
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            return None  # no image descriptor seen
        if b0 == 0x21:  # extension
            if pos + 2 > n:
                return None
            label = payload[pos + 1]
            # GCE layout: 0x21 0xF9 04 <flags> <delay lo> <delay hi>
            # <transparent index> 00. Last GCE wins (the reference-
            # renderer behavior): a later GCE WITHOUT the transparency
            # flag clears an earlier one's transparent index.
            if label == 0xF9 and pos + 8 <= n and payload[pos + 2] == 4:
                if payload[pos + 3] & 0x01:  # transparency flag
                    transparent = payload[pos + 6]
                else:
                    transparent = None
            sub = _read_subblocks(payload, pos + 2)
            if sub is None:
                return None
            _, pos = sub
            continue
        if b0 != 0x2C:  # image descriptor is the only other block type
            return None
        left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos + 1)
        fpacked = payload[pos + 9]
        pos += 10
        lct = None
        if fpacked & 0x80:
            size = 2 << (fpacked & 0x07)
            if pos + 3 * size > n:
                return None
            lct = [
                (
                    payload[pos + 3 * i],
                    payload[pos + 3 * i + 1],
                    payload[pos + 3 * i + 2],
                )
                for i in range(size)
            ]
            pos += 3 * size
        palette = lct or gct
        if palette is None or fw == 0 or fh == 0:
            return None
        if fw * fh > MAX_DECODE_PIXELS:
            return None  # frame raster bomb guard
        if pos >= n:
            return None
        mcs = payload[pos]
        sub = _read_subblocks(payload, pos + 1)
        if sub is None:
            return None
        data, pos = sub
        idx = lzw_decode(data, mcs, fw * fh)
        if idx is None:
            return None
        # de-interlace into frame raster order
        if fpacked & 0x40:
            raster = bytearray(fw * fh)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, fh, step):
                    raster[y * fw : (y + 1) * fw] = idx[src : src + fw]
                    src += fw
            idx = raster
        # compose onto the background-filled logical screen; transparent
        # pixels keep the background (deterministic, documented)
        bg = (
            gct[bg_index]
            if gct is not None and bg_index < len(gct)
            else (0, 0, 0)
        )
        bgr_bg = (bg[2], bg[1], bg[0])
        rows = [[bgr_bg] * w for _ in range(h)]
        plen = len(palette)
        for fy in range(fh):
            y = top + fy
            if y >= h:
                break
            row = rows[y]
            base = fy * fw
            for fx in range(fw):
                x = left + fx
                if x >= w:
                    break
                ci = idx[base + fx]
                if ci == transparent:
                    continue
                if ci >= plen:
                    return None  # index outside the color table
                r, g, b = palette[ci]
                row[x] = (b, g, r)
        return (w, h, rows)
    return None


def gif_frame_count(payload: bytes) -> int | None:
    """Number of COMPLETE image descriptors (frames) in a GIF stream,
    or None for a non-GIF payload. Animated GIFs report their true
    frame count; a dimension-only skeleton (no descriptor) reports 0.
    Walks block headers only — no LZW decode, O(#blocks)."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = payload[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n = len(payload)
    count = 0
    while pos < n:
        b0 = payload[pos]
        if b0 == 0x3B:
            break
        if b0 == 0x21:
            sub = _read_subblocks(payload, pos + 2)
            if sub is None:
                break
            _, pos = sub
            continue
        if b0 != 0x2C or pos + 10 > n:
            break
        fpacked = payload[pos + 9]
        pos += 10
        if fpacked & 0x80:
            pos += 3 * (2 << (fpacked & 0x07))
        if pos >= n:
            break
        sub = _read_subblocks(payload, pos + 1)  # skip mcs byte + data
        if sub is None:
            break
        _, pos = sub
        count += 1
    return count


# --------------------------------------------------------------------------
# Encoder (fixture generator)
# --------------------------------------------------------------------------


def make_gif(
    width: int,
    height: int,
    rows,
    interlace: bool = False,
    transparent_bgr: tuple | None = None,
    frame_rect: tuple | None = None,
    extra_frames: list | None = None,
) -> bytes:
    """REAL GIF89a from pixel rows (top row first, (b, g, r) tuples —
    the module convention) with greedy-LZW-compressed raster data.
    The palette is built from the distinct colors (≤ 256 required —
    fixture content, not a quantizer). ``interlace=True`` writes the
    4-pass row order. ``transparent_bgr`` marks that color transparent
    via a GIF89a graphic control extension (decodes as the background,
    which is palette entry 0). ``frame_rect=(left, top, fw, fh)``
    writes the frame as a sub-rectangle of the logical screen (the
    remainder renders as background). ``extra_frames`` is a list of
    (rows, frame_rect) pairs appended as further image descriptors
    (an ANIMATED GIF, each frame preceded by a graphic-control delay;
    colors must share the global palette budget) — the decoder reads
    only the first frame, :func:`gif_frame_count` counts them all.
    Deterministic: palette ordered by first appearance."""
    if frame_rect is None:
        frame_rect = (0, 0, width, height)
    frames = [(rows, frame_rect)] + [
        (fr, rect if rect is not None else (0, 0, width, height))
        for fr, rect in (extra_frames or [])
    ]
    palette: dict[tuple, int] = {}
    for frows, (left, top, fw, fh) in frames:
        if left + fw > width or top + fh > height:
            raise ValueError("frame_rect outside the logical screen")
        for y in range(fh):
            for px in frows[y][:fw]:
                if px not in palette:
                    palette[px] = len(palette)
    if transparent_bgr is not None and transparent_bgr not in palette:
        palette[transparent_bgr] = len(palette)
    if len(palette) > 256:
        raise ValueError("fixture encoder needs <= 256 distinct colors")
    ncol = max(2, len(palette))
    gct_bits = max(1, (ncol - 1).bit_length())
    table_size = 1 << gct_bits
    colors = list(palette)  # bgr tuples in first-appearance order
    colors += [(0, 0, 0)] * (table_size - len(colors))
    mcs = max(2, gct_bits)
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HH", width, height)
    out.append(0x80 | (gct_bits - 1))  # GCT present, size
    out += b"\x00\x00"  # bg index 0, no aspect
    for b, g, r in colors:
        out += bytes((r, g, b))
    if transparent_bgr is not None:
        out += bytes((0x21, 0xF9, 4, 0x01, 0, 0, palette[transparent_bgr], 0))
    for fi, (frows, (left, top, fw, fh)) in enumerate(frames):
        if fi > 0:  # animation delay GCE before each later frame
            out += bytes((0x21, 0xF9, 4, 0x00, 10, 0, 0, 0))
        il = interlace and fi == 0
        indices = bytes(
            palette[frows[y][x]]
            for y in _row_order(fh, il)
            for x in range(fw)
        )
        lzw = lzw_encode(indices, mcs)
        out += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh)
        out.append(0x40 if il else 0x00)  # no LCT
        out.append(mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def _row_order(fh: int, interlace: bool) -> list[int]:
    if not interlace:
        return list(range(fh))
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, fh, step))
    return order
