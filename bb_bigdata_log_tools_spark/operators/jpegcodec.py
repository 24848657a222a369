"""Baseline JPEG codec — pure Python, from the public ITU T.81 spec.

Closes the one multimodal stub with real-world weight (web crawls are
overwhelmingly JPEG): :func:`jpeg_parse_pixels` is a REAL baseline
sequential DCT decoder (Huffman entropy decode with byte-unstuffing and
restart markers, dequantize, zigzag, separable IDCT, chroma upsampling,
JFIF YCbCr→RGB), and :func:`make_jpeg` is the matching baseline encoder
used for deterministic fixtures. Both read/write the tables carried IN
the file (DQT/DHT segments), so the pair is self-consistent regardless
of table choice; the encoder emits the T.81 Annex K example tables.

Progressive (SOF2) files ALSO really decode — spectral selection and
successive approximation, all four Annex G procedures (DC/AC ×
first/refinement), with EOB block runs and restart markers; the
encoder can emit a full successive-approximation scan script for
fixtures. Honest-stub boundary (returns None → ``decoded=false``
downstream): lossless/hierarchical frame types, arithmetic coding
(DAC), 12-bit precision, and component counts other than 1 or 3.
A production deployment plugs libjpeg-turbo/Pillow into the same
``image_parse_pixels`` seam for throughput; this decoder is
dependency-free and deterministic, which is what the value-hash oracle
needs.

Reference parity note: the reference repo
(/root/reference) ships no image decoding at all — this module serves
the training-data-pipeline extension scope (multimodal columns), not a
reference component.
"""

from __future__ import annotations

import math
import struct

# Zigzag scan: ZIGZAG[k] = natural (row-major) index of the k-th
# coefficient in zigzag order (T.81 Figure 5).
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K example quantization tables (natural order).
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [17, 18, 24, 47, 99, 99, 99, 99,
                18, 21, 26, 66, 99, 99, 99, 99,
                24, 26, 56, 99, 99, 99, 99, 99,
                47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32

# T.81 Annex K example Huffman tables: (BITS[1..16], HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Progressive AC scans emit EOBn symbols (0x10..0xE0) that the Annex K
# tables do not contain (their code space is full but for the reserved
# all-ones slot), so progressive files carry this flat table instead —
# every 8-bit symbol at length 8 or 9, Kraft sum 49152 < 65536 with the
# all-ones prefix left unused, exactly like real optimized-table files
# carry their own DHT. The decoder always builds from the file's DHT,
# so this is encoder-only.
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = list(range(256))

# Separable IDCT/FDCT basis: M[x][u] = 0.5 * C(u) * cos((2x+1)uπ/16),
# so spatial = M · F · Mᵀ and F = Mᵀ · spatial · M.
_BASIS = [
    [
        0.5 * (1.0 / math.sqrt(2.0) if u == 0 else 1.0)
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for u in range(8)
    ]
    for x in range(8)
]


# --------------------------------------------------------------------------
# Huffman code construction (T.81 Annex C)
# --------------------------------------------------------------------------


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol for the bit-at-a-time decoder."""
    return {(ln, c): s for s, (c, ln) in _huff_codes(bits, vals).items()}


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    marker (0xFF followed by non-zero), exposing it to the MCU loop for
    restart handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 < len(d) and d[self.pos + 1] == 0x00:
                self.pos += 2  # stuffed FF
            else:
                self.marker = d[self.pos + 1] if self.pos + 1 < len(d) else None
                return False  # real marker: stop
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def align_and_skip_marker(self) -> int | None:
        """Byte-align and consume the pending marker (for RSTn)."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        # scan forward to the 0xFF of the marker
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                # T.81 B.1.1.2: any number of 0xFF fill bytes may
                # precede the marker code byte
                j = self.pos + 1
                while j < len(d) and d[j] == 0xFF:
                    j += 1
                if j >= len(d):
                    return None
                if d[j] == 0x00:
                    # stuffed data byte after the fill run — not a
                    # marker; keep scanning
                    self.pos = j + 1
                    continue
                m = d[j]
                self.pos = j + 1
                self.marker = None
                return m
            self.pos += 1
        return None


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map the s-bit received value to its signed level."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    code = 0
    for length in range(1, 17):
        b = br.read_bit()
        if b is None:
            return None
        code = (code << 1) | b
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _idct_block(coef: list[float]) -> list[int]:
    """8x8 natural-order coefficients → 64 clamped pixels (row-major)."""
    m = _BASIS
    # tmp = F · Mᵀ  (i.e. tmp[v][x] = Σu F[v][u] m[x][u])
    tmp = [[0.0] * 8 for _ in range(8)]
    for v in range(8):
        row = coef[v * 8 : v * 8 + 8]
        if not any(row):
            continue
        for x in range(8):
            mx = m[x]
            tmp[v][x] = (
                row[0] * mx[0] + row[1] * mx[1] + row[2] * mx[2]
                + row[3] * mx[3] + row[4] * mx[4] + row[5] * mx[5]
                + row[6] * mx[6] + row[7] * mx[7]
            )
    out = [0] * 64
    for y in range(8):
        my = m[y]
        for x in range(8):
            s = (
                my[0] * tmp[0][x] + my[1] * tmp[1][x] + my[2] * tmp[2][x]
                + my[3] * tmp[3][x] + my[4] * tmp[4][x] + my[5] * tmp[5][x]
                + my[6] * tmp[6][x] + my[7] * tmp[7][x]
            )
            v = int(round(s)) + 128
            out[y * 8 + x] = 0 if v < 0 else (255 if v > 255 else v)
    return out


def jpeg_parse_pixels(payload: bytes) -> tuple[int, int, list] | None:
    """(width, height, rows) from a BASELINE sequential JPEG, or None.
    rows[y][x] = (b, g, r) top row first — the module's BMP-native
    convention (see multimodal.make_bmp). Malformed / truncated
    payloads return None (honest-stub contract), never raise."""
    try:
        return _jpeg_parse_pixels(payload)
    except (struct.error, IndexError, ValueError):
        return None


def _jpeg_parse_pixels(payload: bytes) -> tuple[int, int, list] | None:
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    restart_interval = 0
    n = len(payload)
    # multi-scan accumulation (baseline non-interleaved: one SOS per
    # component, T.81 A.2.2): coefficient blocks per FRAME component
    # index, finalized at EOI once every component has a scan
    blocks_store: dict[int, list] = {}
    # progressive accumulation (T.81 Annex G): per-component quantized
    # coefficient arrays refined across scans, finalized at EOI
    prog: dict[int, dict] = {}
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            return None
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip the run so the marker byte is never
        # misread as a segment length (the entropy path's
        # align_and_skip_marker already tolerates these). The pos+2
        # bound (not pos+4) keeps a fill run before a trailing EOI
        # in-reach — only segment markers need the 2 length bytes.
        while pos + 2 <= n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n:
            break  # fill run to EOF: finalize with what was decoded
        marker = payload[pos + 1]
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7) or marker == 0x01:
            pos += 2
            continue
        if marker == 0xD9:
            break  # EOI: fall through to the finalize check below
        if pos + 4 > n:
            break  # truncated segment header: finalize check decides
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                b += 1
                vals = []
                for _ in range(64):
                    if pq:
                        vals.append(struct.unpack_from(">H", body, b)[0])
                        b += 2
                    else:
                        vals.append(body[b])
                        b += 1
                qt[tq] = vals  # zigzag order, as stored
        elif marker == 0xC4:  # DHT
            b = 0
            while b + 17 <= len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                huff[(tc, th)] = _huff_decode_map(bits, vals)
                b += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            precision, h, w = struct.unpack_from(">BHH", body, 0)
            if precision != 8:
                return None
            from bb_bigdata_log_tools_spark.operators.multimodal import (
                MAX_DECODE_PIXELS,
            )

            if w * h > MAX_DECODE_PIXELS:
                return None  # decompression-bomb guard (coef stores ~ w*h)
            ncomp = body[5]
            if ncomp not in (1, 3):
                return None
            comps = []
            for c in range(ncomp):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                     "tq": body[8 + 3 * c]}
                )
            frame = (w, h, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF, 0xCC):
            return None  # lossless / hierarchical / arithmetic: stub
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                return None
            w, h, comps = frame
            ns = body[0]
            if not 1 <= ns <= len(comps):
                return None
            scan = []
            for c in range(ns):
                cs = body[1 + 2 * c]
                tt = body[2 + 2 * c]
                comp = next(
                    (i for i, cc in enumerate(comps) if cc["id"] == cs), None
                )
                if comp is None:
                    return None
                scan.append((comp, tt >> 4, tt & 0x0F))
            if progressive:
                if len(body) < 1 + 2 * ns + 3:
                    return None
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
                nxt = _progressive_decode_scan(
                    payload, pos + 2 + seglen, frame, prog, scan,
                    ss, se, ah, al, huff, restart_interval,
                )
                if nxt is None:
                    return None
                pos = nxt
                continue
            scan_cis = [ci for ci, _, _ in scan]
            if len(set(scan_cis)) != len(scan_cis) or any(
                ci in blocks_store for ci in scan_cis
            ):
                return None  # component repeated / scanned twice: corrupt
            # T.81 A.2: a scan is interleaved iff Ns > 1; an Ns=1 scan
            # rasters the component's own block grid (sampling only
            # sets the component's dimensions, MCU = one data unit)
            decoded = _entropy_decode_scan(
                payload, pos + 2 + seglen, w, h, comps, scan, qt, huff,
                restart_interval, interleaved=ns > 1,
            )
            if decoded is None:
                return None
            scan_blocks, pos = decoded
            blocks_store.update(scan_blocks)
            continue  # pos now sits at the next marker's 0xFF
        # all other markers (APPn, COM): skip
        pos += 2 + seglen
    # EOI (or end of data after the last scan): finalize once every
    # frame component has its scan; header-only skeletons and
    # incomplete multi-scan files stay rejected
    if progressive:
        return _progressive_finalize(frame, prog, qt)
    if frame is not None and blocks_store and set(blocks_store) == set(
        range(len(frame[2]))
    ):
        return _idct_assemble(frame[0], frame[1], frame[2], blocks_store)
    return None


def _scan_end(data: bytes, pos: int) -> int:
    """First real-marker position (0xFF + non-stuffing byte) at or
    after ``pos`` — where the header walk resumes after a scan's
    entropy segment (padding bits and stuffed 0xFF00 pairs skipped)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            return pos
        pos += 1
    return n


def _entropy_decode_scan(
    data, pos, w, h, comps, scan, qt, huff, restart_interval, interleaved
):
    """Entropy-decode ONE scan into dequantized coefficient blocks.

    ``scan`` holds (frame-component index, dc table id, ac table id)
    per scan component. Returns ({component index: [(px0, py0, coef)]},
    next-marker position) or None on malformed input. Also records each
    scanned component's plane size on its comp dict.

    Interleaved (Ns > 1): MCU = hᵢ×vᵢ blocks per component, raster over
    the frame MCU grid (T.81 A.2.3). Non-interleaved (Ns = 1): MCU =
    one data unit; the component rasters its OWN block grid of
    ceil(ceil(w·hᵢ/hmax)/8) × ceil(ceil(h·vᵢ/vmax)/8) blocks
    (T.81 A.2.2) — the multi-scan baseline layout. Restart markers
    count MCUs in both cases.
    """
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    br = _BitReader(data, pos)
    blocks: dict[int, list] = {ci: [] for ci, _, _ in scan}
    tabs = []
    for ci, td, ta in scan:
        dc_tab = huff.get((0, td))
        ac_tab = huff.get((1, ta))
        q = qt.get(comps[ci]["tq"])
        if dc_tab is None or ac_tab is None or q is None:
            return None
        tabs.append((dc_tab, ac_tab, q))
    preds = [0] * len(scan)
    mcu_count = 0

    def check_restart() -> bool:
        nonlocal preds
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            m = br.align_and_skip_marker()
            if m is None or not (0xD0 <= m <= 0xD7):
                return False
            preds = [0] * len(scan)
        return True

    if interleaved:
        mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
        for ci, _, _ in scan:
            comps[ci]["pw"] = mcus_x * comps[ci]["h"] * 8
            comps[ci]["ph"] = mcus_y * comps[ci]["v"] * 8
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if not check_restart():
                    return None
                for si, (ci, _, _) in enumerate(scan):
                    comp = comps[ci]
                    dc_tab, ac_tab, q = tabs[si]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            coef = _decode_block_coefs(
                                br, dc_tab, ac_tab, q, preds, si
                            )
                            if coef is None:
                                return None
                            blocks[ci].append(
                                (
                                    (mx * comp["h"] + bx) * 8,
                                    (my * comp["v"] + by) * 8,
                                    coef,
                                )
                            )
                mcu_count += 1
    else:
        ci, _, _ = scan[0]
        comp = comps[ci]
        dc_tab, ac_tab, q = tabs[0]
        xc = -(-w * comp["h"] // hmax)  # component dims (ceil)
        yc = -(-h * comp["v"] // vmax)
        bxs, bys = -(-xc // 8), -(-yc // 8)
        comp["pw"], comp["ph"] = bxs * 8, bys * 8
        for by in range(bys):
            for bx in range(bxs):
                if not check_restart():
                    return None
                coef = _decode_block_coefs(br, dc_tab, ac_tab, q, preds, 0)
                if coef is None:
                    return None
                blocks[ci].append((bx * 8, by * 8, coef))
                mcu_count += 1
    return blocks, _scan_end(data, br.pos)


# --------------------------------------------------------------------------
# Progressive decoding (T.81 Annex G: spectral selection + successive
# approximation). Coefficients stay QUANTIZED integers across scans —
# DC refinements OR in bit Al (two's complement, exact with Python
# ints), AC refinements apply the G.1.2.3 correction-bit algorithm —
# and are dequantized once at EOI.
# --------------------------------------------------------------------------


def _prog_own_grid(w, h, comp, hmax, vmax) -> tuple[int, int]:
    """Non-interleaved block grid: ceil(ceil(dim·sampling/max)/8)
    (T.81 A.2.2) — SMALLER than the MCU-padded allocation at edges."""
    xc = -(-w * comp["h"] // hmax)
    yc = -(-h * comp["v"] // vmax)
    return -(-xc // 8), -(-yc // 8)


def _progressive_decode_scan(
    data, pos, frame, prog, scan, ss, se, ah, al, huff, restart_interval
):
    """Decode ONE progressive scan into the persistent per-component
    coefficient store ``prog``; returns the next-marker position or
    None on malformed input / scan-script violations.

    Scan-script validation (per coefficient, per component): the first
    scan covering a coefficient must have Ah=0 (any Al); a refinement
    must have Ah = previous Al and Al = Ah-1; AC scans are Ns=1 and
    must follow the component's DC scan (T.81 G.1.1.1.1)."""
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    for ci, c in enumerate(comps):
        if ci not in prog:
            bw_, bh_ = mcus_x * c["h"], mcus_y * c["v"]
            prog[ci] = {
                "coef": [[0] * 64 for _ in range(bw_ * bh_)],
                "bw": bw_,
                "bh": bh_,
                "state": [-1] * 64,  # per-coefficient current Al; -1 unseen
            }
        c["pw"], c["ph"] = prog[ci]["bw"] * 8, prog[ci]["bh"] * 8
    is_dc = ss == 0
    if is_dc:
        if se != 0:
            return None
    elif not (1 <= ss <= se <= 63) or len(scan) != 1:
        return None
    if ah and al != ah - 1:
        return None
    if len({ci for ci, _, _ in scan}) != len(scan):
        return None  # component repeated within one scan: corrupt
    band = (0,) if is_dc else tuple(range(ss, se + 1))
    for ci, _, _ in scan:
        st = prog[ci]["state"]
        for k in band:
            if (st[k] != -1) if ah == 0 else (st[k] != ah):
                return None
        if not is_dc and st[0] == -1:
            return None  # AC scan before the component's DC scan
    br = _BitReader(data, pos)
    ok = (
        _prog_dc_scan(br, w, h, comps, prog, scan, ah, al, huff,
                      restart_interval, mcus_x, mcus_y, hmax, vmax)
        if is_dc
        else _prog_ac_scan(br, w, h, comps, prog, scan[0], ss, se, ah, al,
                           huff, restart_interval, hmax, vmax)
    )
    if not ok:
        return None
    for ci, _, _ in scan:
        st = prog[ci]["state"]
        for k in band:
            st[k] = al
    return _scan_end(data, br.pos)


def _prog_dc_scan(
    br, w, h, comps, prog, scan, ah, al, huff, restart_interval,
    mcus_x, mcus_y, hmax, vmax
):
    """DC scan: first pass (Ah=0) Huffman-decodes shifted diffs per
    T.81 G.2; a refinement appends one raw bit per block at position
    Al. Interleaved (Ns>1) rasters the frame MCU grid including edge
    dummy blocks; Ns=1 rasters the component's own grid."""
    tabs = []
    if ah == 0:
        for _, td, _ in scan:
            t = huff.get((0, td))
            if t is None:
                return False
            tabs.append(t)
    preds = [0] * len(scan)
    mcu_count = 0

    def check_restart() -> bool:
        nonlocal preds
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            m = br.align_and_skip_marker()
            if m is None or not (0xD0 <= m <= 0xD7):
                return False
            preds = [0] * len(scan)
        return True

    def decode_one(blk, si) -> bool:
        if ah == 0:
            s = _decode_huff(br, tabs[si])
            if s is None or s > 15:
                return False  # bounded size category (fuzz-found)
            diff = 0
            if s:
                v = br.receive(s)
                if v is None:
                    return False
                diff = _extend(v, s)
            preds[si] += diff
            blk[0] = preds[si] << al
        else:
            b = br.read_bit()
            if b is None:
                return False
            if b:
                blk[0] |= 1 << al
        return True

    if len(scan) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if not check_restart():
                    return False
                for si, (ci, _, _) in enumerate(scan):
                    comp, p = comps[ci], prog[ci]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = p["coef"][
                                (my * comp["v"] + by) * p["bw"]
                                + mx * comp["h"] + bx
                            ]
                            if not decode_one(blk, si):
                                return False
                mcu_count += 1
    else:
        ci, _, _ = scan[0]
        p = prog[ci]
        bxs, bys = _prog_own_grid(w, h, comps[ci], hmax, vmax)
        for by in range(bys):
            for bx in range(bxs):
                if not check_restart():
                    return False
                if not decode_one(p["coef"][by * p["bw"] + bx], 0):
                    return False
                mcu_count += 1
    return True


def _prog_ac_scan(
    br, w, h, comps, prog, sc, ss, se, ah, al, huff, restart_interval,
    hmax, vmax
):
    """AC scan (always Ns=1, own block grid). First pass (Ah=0):
    run-length symbols place ``value << Al`` with EOBn block-run
    skips. Refinement (Ah>0): the correction-bit procedure — newly
    nonzero coefficients arrive as ±2^Al, every already-nonzero
    coefficient in the traversed span contributes one appended bit
    (T.81 G.1.2.3 decode, mirroring the encoder's buffered-bit
    order)."""
    ci, _, ta = sc
    ac_tab = huff.get((1, ta))
    if ac_tab is None:
        return False
    p = prog[ci]
    bxs, bys = _prog_own_grid(w, h, comps[ci], hmax, vmax)
    p1, m1 = 1 << al, -(1 << al)
    eobrun = 0
    mcu_count = 0
    for by in range(bys):
        for bx in range(bxs):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                m = br.align_and_skip_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    return False
                eobrun = 0
            blk = p["coef"][by * p["bw"] + bx]
            if ah == 0:
                if eobrun:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = _decode_huff(br, ac_tab)
                        if rs is None:
                            return False
                        r, s = rs >> 4, rs & 0x0F
                        if s:
                            k += r
                            if k > se:
                                return False
                            v = br.receive(s)
                            if v is None:
                                return False
                            blk[ZIGZAG[k]] = _extend(v, s) << al
                            k += 1
                        elif r == 15:
                            k += 16  # ZRL
                        else:
                            eobrun = (1 << r) - 1
                            if r:
                                ext = br.receive(r)
                                if ext is None:
                                    return False
                                eobrun += ext
                            break
            else:
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _decode_huff(br, ac_tab)
                        if rs is None:
                            return False
                        r, s = rs >> 4, rs & 0x0F
                        if s:
                            if s != 1:
                                return False  # refinements carry ±1 only
                            b = br.read_bit()
                            if b is None:
                                return False
                            v = p1 if b else m1
                        elif r != 15:
                            eobrun = 1 << r
                            if r:
                                ext = br.receive(r)
                                if ext is None:
                                    return False
                                eobrun += ext
                            break
                        else:
                            v = 0  # ZRL: 16 zero-history positions
                        # advance over r zero-history coefficients,
                        # absorbing correction bits for nonzero ones
                        while k <= se:
                            z = ZIGZAG[k]
                            if blk[z]:
                                b = br.read_bit()
                                if b is None:
                                    return False
                                if b and not (blk[z] & p1):
                                    blk[z] += p1 if blk[z] > 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if v:
                            if k > se:
                                return False
                            blk[ZIGZAG[k]] = v
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        z = ZIGZAG[k]
                        if blk[z]:
                            b = br.read_bit()
                            if b is None:
                                return False
                            if b and not (blk[z] & p1):
                                blk[z] += p1 if blk[z] > 0 else m1
                        k += 1
                    eobrun -= 1
            mcu_count += 1
    return True


def _progressive_finalize(frame, prog, qt):
    """Dequantize the accumulated coefficient store and IDCT-assemble.
    Completion contract (the module's honest-stub stance — truncated
    progressions return None, they don't render a blurry partial):
    every component's DC must be fully refined (state 0) and every
    AC coefficient that has appeared must be refined to Al=0; bands an
    encoder never shipped decode as zero, like any DCT decoder."""
    if frame is None or not prog or set(prog) != set(range(len(frame[2]))):
        return None
    w, h, comps = frame
    blocks_store: dict[int, list] = {}
    for ci, comp in enumerate(comps):
        p = prog[ci]
        st = p["state"]
        if st[0] != 0 or any(s > 0 for s in st[1:]):
            return None
        q = qt.get(comp["tq"])
        if q is None:
            return None
        qnat = [0] * 64
        for k in range(64):
            qnat[ZIGZAG[k]] = q[k]
        out = []
        bw_ = p["bw"]
        for i, blk in enumerate(p["coef"]):
            coef = [blk[j] * qnat[j] for j in range(64)]
            out.append(((i % bw_) * 8, (i // bw_) * 8, coef))
        blocks_store[ci] = out
    return _idct_assemble(w, h, comps, blocks_store)


def _idct_assemble(w, h, comps, blocks_store):
    """IDCT + pixel scatter over the accumulated blocks of ALL scans,
    BATCHED in numpy (one einsum over all blocks of a component instead
    of 1024 Python multiplies per block — the decode hot spot; Huffman
    bit-reading stays scalar by nature). Rounding (half-to-even)
    matches the scalar reference :func:`_idct_block` kept for unit
    comparison."""
    import numpy as np

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    m = np.asarray(_BASIS)  # m[x][u]
    planes = []
    for ci, comp in enumerate(comps):
        plane = np.zeros((comp["ph"], comp["pw"]), dtype=np.uint8)
        blks = blocks_store.get(ci, [])
        if blks:
            coefs = np.asarray([b[2] for b in blks]).reshape(-1, 8, 8)
            # out[n,y,x] = Σv Σu m[y][v]·C[n,v,u]·m[x][u] (== _idct_block)
            spatial = np.einsum("yv,nvu,xu->nyx", m, coefs, m)
            pix = np.clip(np.rint(spatial) + 128, 0, 255).astype(np.uint8)
            for (px0, py0, _), blk in zip(blks, pix):
                plane[py0 : py0 + 8, px0 : px0 + 8] = blk
        planes.append(plane)
    return _planes_to_rows(w, h, comps, planes, hmax, vmax)


def _decode_block_coefs(br, dc_tab, ac_tab, q, preds, ci):
    """One block's Huffman decode → 64 dequantized natural-order
    coefficients (floats), or None on malformed input."""
    s = _decode_huff(br, dc_tab)
    if s is None or s > 15:
        # a corrupt DHT can carry any byte as the DC size category;
        # T.81 allows at most 11 (8-bit) — values beyond 15 would
        # receive() astronomically large ints (fuzz-found crash)
        return None
    diff = 0
    if s:
        v = br.receive(s)
        if v is None:
            return None
        diff = _extend(v, s)
    preds[ci] += diff
    coef = [0.0] * 64
    coef[0] = preds[ci] * q[0]
    k = 1
    while k < 64:
        rs = _decode_huff(br, ac_tab)
        if rs is None:
            return None
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            return None
        v = br.receive(size)
        if v is None:
            return None
        coef[ZIGZAG[k]] = _extend(v, size) * q[k]
        k += 1
    return coef


def _planes_to_rows(w, h, comps, planes, hmax, vmax):
    """Vectorized chroma upsampling + JFIF YCbCr→RGB over whole planes;
    rows come out in the module's (b, g, r) tuple convention."""
    import numpy as np

    if len(comps) == 1:
        rows = [
            [(v, v, v) for v in line] for line in planes[0][:h, :w].tolist()
        ]
        return (w, h, rows)

    def up(ci):
        yi = (np.arange(h) * comps[ci]["v"]) // vmax
        xi = (np.arange(w) * comps[ci]["h"]) // hmax
        return planes[ci][np.ix_(yi, xi)].astype(np.float64)

    yy, pb, pr = up(0), up(1) - 128.0, up(2) - 128.0
    r = np.clip(np.rint(yy + 1.402 * pr), 0, 255).astype(np.uint8)
    g = np.clip(np.rint(yy - 0.344136 * pb - 0.714136 * pr), 0, 255).astype(np.uint8)
    b = np.clip(np.rint(yy + 1.772 * pb), 0, 255).astype(np.uint8)
    bgr = np.stack([b, g, r], axis=-1)
    rows = [[tuple(px) for px in line] for line in bgr.tolist()]
    return (w, h, rows)


# --------------------------------------------------------------------------
# Encoder (baseline, 4:4:4, Annex K tables) — fixture generator
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _fdct_block(pixels: list[int]) -> list[float]:
    """64 level-shifted pixels (row-major) → natural-order coefficients."""
    m = _BASIS
    # tmp[u][x] = Σy m[y][u] * p[y][x]
    tmp = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        for x in range(8):
            s = 0.0
            for y in range(8):
                s += m[y][u] * pixels[y * 8 + x]
            tmp[u][x] = s
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                s += tmp[u][x] * m[x][v]
            out[u * 8 + v] = s
    return out


def _size_of(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _encode_block(bw, coef_zz, pred, dc_codes, ac_codes):
    dc = coef_zz[0]
    diff = dc - pred
    s = _size_of(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = coef_zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _size_of(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _emit_progressive_scans(
    width, height, grayscale, s, spectral_only, restart_interval,
    blk_coefzz, planes_meta, mcu_geom, code_tabs,
):
    """Entropy-encode a progressive scan script over the already-
    quantized coefficient blocks (T.81 Annex G encode procedures:
    G.1.2.1 DC with point transform, G.1.2.2 AC first with EOBn block
    runs, G.1.2.3 AC refinement with buffered correction bits).
    Returns (scan entropy-bytes list, (scomps, Ss, Se, Ah, Al) list).

    Interleaved DC scans raster the frame MCU grid (the padded planes
    make every MCU real); AC scans are Ns=1 over each component's OWN
    block grid — the encoder must NOT ship the MCU-padding dummy
    blocks there (they exist only in interleaved scans, T.81 A.2.2),
    which the own-grid bounds below enforce."""
    dc_l, dc_c, ac_l, ac_c = code_tabs
    mcus_x, mcus_y = mcu_geom
    # quantized coefficient blocks per component, padded-grid raster
    blocks = [
        [
            blk_coefzz(plane, plane_w, bx, by, ci)
            for by in range(bh_)
            for bx in range(bw_)
        ]
        for ci, (plane, plane_w, bw_, bh_) in enumerate(planes_meta)
    ]

    def own_grid(ci):
        if ci == 0:
            xc, yc = width, height
        else:
            xc, yc = -(-width // s), -(-height // s)
        return -(-xc // 8), -(-yc // 8)

    def rst_marker(bw2, cnt):
        bw2.flush()
        bw2.out += bytes(
            [0xFF, 0xD0 + ((cnt // restart_interval - 1) % 8)]
        )

    def emit_dc_scan(scomps, ah, al):
        bw2 = _BitWriter()
        preds = [0] * len(scomps)
        cnt = 0
        if len(scomps) > 1:
            order = []  # (scan idx, block idx) per MCU, frame MCU grid
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    mcu = []
                    for si, ci in enumerate(scomps):
                        hv = s if ci == 0 else 1
                        bw_pad = planes_meta[ci][2]
                        for by in range(hv):
                            for bx in range(hv):
                                mcu.append((si, ci, (my * hv + by) * bw_pad
                                            + mx * hv + bx))
                    order.append(mcu)
        else:
            ci = scomps[0]
            bxs, bys = own_grid(ci)
            bw_pad = planes_meta[ci][2]
            order = [
                [(0, ci, by * bw_pad + bx)]
                for by in range(bys)
                for bx in range(bxs)
            ]
        for mcu in order:
            if restart_interval and cnt and cnt % restart_interval == 0:
                rst_marker(bw2, cnt)
                preds = [0] * len(scomps)
            for si, ci, bi in mcu:
                dc = blocks[ci][bi][0]
                if ah == 0:
                    v = dc >> al  # DC point transform: arithmetic shift
                    diff = v - preds[si]
                    preds[si] = v
                    sz = _size_of(diff)
                    code, ln = (dc_l if ci == 0 else dc_c)[sz]
                    bw2.write(code, ln)
                    if sz:
                        bw2.write(
                            diff if diff >= 0 else diff + (1 << sz) - 1, sz
                        )
                else:
                    bw2.write((dc >> al) & 1, 1)
            cnt += 1
        bw2.flush()
        return bytes(bw2.out)

    def emit_ac_first(ci, ss, se, al):
        bw2 = _BitWriter()
        ac_codes = ac_l if ci == 0 else ac_c
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_codes[r << 4]
                bw2.write(code, ln)
                if r:
                    bw2.write(eobrun - (1 << r), r)
                eobrun = 0

        bxs, bys = own_grid(ci)
        bw_pad = planes_meta[ci][2]
        cnt = 0
        for by in range(bys):
            for bx in range(bxs):
                if restart_interval and cnt and cnt % restart_interval == 0:
                    flush_eob()
                    rst_marker(bw2, cnt)
                blk = blocks[ci][by * bw_pad + bx]
                run = 0
                for k in range(ss, se + 1):
                    t = blk[k]
                    # AC point transform truncates toward zero (G.1.2.2)
                    tv = -((-t) >> al) if t < 0 else (t >> al)
                    if tv == 0:
                        run += 1
                        continue
                    flush_eob()
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        bw2.write(code, ln)
                        run -= 16
                    sz = _size_of(tv)
                    code, ln = ac_codes[(run << 4) | sz]
                    bw2.write(code, ln)
                    bw2.write(tv if tv >= 0 else tv + (1 << sz) - 1, sz)
                    run = 0
                if run:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                cnt += 1
        flush_eob()
        bw2.flush()
        return bytes(bw2.out)

    def emit_ac_refine(ci, ss, se, al):
        bw2 = _BitWriter()
        ac_codes = ac_l if ci == 0 else ac_c
        eobrun = 0
        pending: list[int] = []  # correction bits deferred to the EOBn

        def flush_eob():
            nonlocal eobrun, pending
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = ac_codes[r << 4]
                bw2.write(code, ln)
                if r:
                    bw2.write(eobrun - (1 << r), r)
                for b in pending:
                    bw2.write(b, 1)
                pending = []
                eobrun = 0

        bxs, bys = own_grid(ci)
        bw_pad = planes_meta[ci][2]
        cnt = 0
        for by in range(bys):
            for bx in range(bxs):
                if restart_interval and cnt and cnt % restart_interval == 0:
                    flush_eob()
                    rst_marker(bw2, cnt)
                blk = blocks[ci][by * bw_pad + bx]
                absv = [abs(blk[k]) >> al for k in range(ss, se + 1)]
                eob_k = ss - 1  # last NEWLY-nonzero position
                for k in range(ss, se + 1):
                    if absv[k - ss] == 1:
                        eob_k = k
                run = 0
                br_bits: list[int] = []  # in-block buffered corrections
                for k in range(ss, se + 1):
                    tv = absv[k - ss]
                    if tv == 0:
                        run += 1
                        continue
                    # ZRLs only when not foldable into the EOB run
                    while run > 15 and k <= eob_k:
                        flush_eob()
                        code, ln = ac_codes[0xF0]
                        bw2.write(code, ln)
                        run -= 16
                        for b in br_bits:
                            bw2.write(b, 1)
                        br_bits = []
                    if tv > 1:
                        # already nonzero: one correction bit, no run use
                        br_bits.append(tv & 1)
                        continue
                    flush_eob()
                    code, ln = ac_codes[(run << 4) | 1]
                    bw2.write(code, ln)
                    bw2.write(1 if blk[k] > 0 else 0, 1)
                    for b in br_bits:
                        bw2.write(b, 1)
                    br_bits = []
                    run = 0
                if run or br_bits:
                    eobrun += 1
                    pending.extend(br_bits)
                    if eobrun == 0x7FFF or len(pending) > 900:
                        flush_eob()
                cnt += 1
        flush_eob()
        bw2.flush()
        return bytes(bw2.out)

    allc = [0] if grayscale else [0, 1, 2]
    if spectral_only:
        script = [("dc", allc, 0, 0, 0, 0)] + [
            ("ac", c, 1, 63, 0, 0) for c in allc
        ]
    elif grayscale:
        script = [
            ("dc", allc, 0, 0, 0, 1), ("ac", 0, 1, 63, 0, 1),
            ("dc", allc, 0, 0, 1, 0), ("ac", 0, 1, 63, 1, 0),
        ]
    else:  # the classic simple-progression shape
        script = [
            ("dc", allc, 0, 0, 0, 1),
            ("ac", 0, 1, 5, 0, 2), ("ac", 1, 1, 63, 0, 1),
            ("ac", 2, 1, 63, 0, 1), ("ac", 0, 6, 63, 0, 2),
            ("ac", 0, 1, 63, 2, 1), ("dc", allc, 0, 0, 1, 0),
            ("ac", 1, 1, 63, 1, 0), ("ac", 2, 1, 63, 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]
    scans, meta = [], []
    for kind, who, ss, se, ah, al in script:
        if kind == "dc":
            scans.append(emit_dc_scan(who, ah, al))
            meta.append((who, ss, se, ah, al))
        else:
            scans.append(
                emit_ac_first(who, ss, se, al) if ah == 0
                else emit_ac_refine(who, ss, se, al)
            )
            meta.append(([who], ss, se, ah, al))
    return scans, meta


def make_jpeg(
    width: int, height: int, rows, subsample: int = 1,
    restart_interval: int = 0, grayscale: bool = False,
    interleaved: bool = True, y_cbcr_split: bool = False,
    progressive: bool = False, spectral_only: bool = False,
) -> bytes:
    """REAL baseline JPEG (Annex K tables) from pixel rows (top row
    first, (b, g, r) tuples — the module convention). ``subsample=1`` →
    4:4:4; ``subsample=2`` → 4:2:0 (2×2-averaged chroma, the dominant
    real-world shape — exercises the decoder's MCU interleave and
    upsampling paths). ``restart_interval=N`` emits a DRI segment and
    RSTn markers every N MCUs (exercises the decoder's predictor-reset
    path). ``interleaved=False`` emits one SOS per component
    (non-interleaved baseline, T.81 A.2.2: each component rasters its
    own block grid; the restart MCU count and marker modulo reset per
    scan) — the multi-scan layout real crawls contain.
    ``y_cbcr_split=True`` emits the classic PARTIAL-interleave pair: a
    non-interleaved Y scan followed by ONE interleaved Cb+Cr scan
    (T.81 allows any component subset per scan; the frame MCU grid is
    identical for every subset). ``progressive=True`` emits an SOF2
    frame with a full successive-approximation scan script (DC first
    Al=1 → AC-first bands at Al=1/2 → AC refinements → DC refinement —
    exercising all four Annex G decode procedures);
    ``spectral_only=True`` narrows that to the spectral-selection-only
    script (every scan Ah=Al=0). The quantized coefficients are
    identical to the baseline layouts, so decodes are bit-identical
    across all of these modes. Deterministic: integer quantization
    of a fixed float FDCT, so fixture bytes are platform-stable."""
    if subsample not in (1, 2):
        raise ValueError("subsample must be 1 (4:4:4) or 2 (4:2:0)")
    if spectral_only and not progressive:
        raise ValueError("spectral_only requires progressive=True")
    if progressive and (y_cbcr_split or not interleaved):
        raise ValueError("progressive replaces the scan-layout options")
    s = 1 if grayscale else subsample
    # luma padded to multiples of 8s (full MCUs); chroma to multiples of 8
    pw = -(-width // (8 * s)) * 8 * s
    ph = -(-height // (8 * s)) * 8 * s
    cw, ch = pw // s, ph // s
    yplane = [0.0] * (pw * ph)
    cbf = [0.0] * (pw * ph)
    crf = [0.0] * (pw * ph)
    for y in range(ph):
        sy = min(y, height - 1)
        for x in range(pw):
            b, g, r = rows[sy][min(x, width - 1)]
            i = y * pw + x
            yplane[i] = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
            cbf[i] = -0.168736 * r - 0.331264 * g + 0.5 * b
            crf[i] = 0.5 * r - 0.418688 * g - 0.081312 * b
    if s == 1:
        cb, cr = cbf, crf
    else:  # 2x2 box-average downsample
        cb = [0.0] * (cw * ch)
        cr = [0.0] * (cw * ch)
        for y in range(ch):
            for x in range(cw):
                i0 = (2 * y) * pw + 2 * x
                i1 = i0 + pw
                cb[y * cw + x] = (cbf[i0] + cbf[i0 + 1] + cbf[i1] + cbf[i1 + 1]) / 4.0
                cr[y * cw + x] = (crf[i0] + crf[i0 + 1] + crf[i1] + crf[i1 + 1]) / 4.0
    qz_l = [QUANT_LUMA[ZIGZAG[k]] for k in range(64)]
    qz_c = [QUANT_CHROMA[ZIGZAG[k]] for k in range(64)]
    dc_l = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    dc_c = _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    if progressive:
        ac_l = ac_c = _huff_codes(PROG_AC_BITS, PROG_AC_VALS)
    else:
        ac_l = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
        ac_c = _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    bw = _BitWriter()
    preds = [0, 0, 0]

    def blk_coefzz(plane, plane_w, bx, by, ci):
        px = [
            plane[(by * 8 + y) * plane_w + bx * 8 + x]
            for y in range(8)
            for x in range(8)
        ]
        coef = _fdct_block(px)
        qz = qz_l if ci == 0 else qz_c
        return [int(round(coef[ZIGZAG[k]] / qz[k])) for k in range(64)]

    def emit(plane, plane_w, bx, by, ci):
        coef_zz = blk_coefzz(plane, plane_w, bx, by, ci)
        preds[ci] = _encode_block(
            bw, coef_zz, preds[ci],
            dc_l if ci == 0 else dc_c,
            ac_l if ci == 0 else ac_c,
        )

    scans: list[bytes] = []  # entropy bytes per SOS (1, 2, or 3)
    prog_meta: list[tuple] = []  # progressive: (scomps, ss, se, ah, al)
    if progressive:
        scans, prog_meta = _emit_progressive_scans(
            width, height, grayscale, s, spectral_only, restart_interval,
            blk_coefzz,
            [(yplane, pw, pw // 8, ph // 8)] if grayscale
            else [(yplane, pw, pw // 8, ph // 8),
                  (cb, cw, cw // 8, ch // 8),
                  (cr, cw, cw // 8, ch // 8)],
            (pw // (8 * s), ph // (8 * s)),
            (dc_l, dc_c, ac_l, ac_c),
        )
    elif y_cbcr_split and not grayscale:
        # scan 1: non-interleaved Y over its own block grid
        bw = _BitWriter()
        blk_count = 0
        for by in range(-(-height // 8)):
            for bx in range(-(-width // 8)):
                if restart_interval and blk_count and blk_count % restart_interval == 0:
                    bw.flush()
                    bw.out += bytes(
                        [0xFF, 0xD0 + ((blk_count // restart_interval - 1) % 8)]
                    )
                    preds[0] = 0
                emit(yplane, pw, bx, by, 0)
                blk_count += 1
        bw.flush()
        scans.append(bytes(bw.out))
        # scan 2: INTERLEAVED Cb+Cr over the frame MCU grid (one block
        # of each per MCU since chroma sampling is 1×1)
        bw = _BitWriter()
        mcu_count = 0
        for my in range(ch // 8):
            for mx in range(cw // 8):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    bw.flush()
                    bw.out += bytes(
                        [0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)]
                    )
                    preds[1] = preds[2] = 0
                emit(cb, cw, mx, my, 1)
                emit(cr, cw, mx, my, 2)
                mcu_count += 1
        bw.flush()
        scans.append(bytes(bw.out))
    elif interleaved or grayscale:
        # MCU interleave (T.81 A.2.3): s×s luma blocks, then one Cb,
        # one Cr (grayscale scans are non-interleaved: one luma block
        # per MCU — identical geometry for a 1-component frame).
        mcu_count = 0
        for my in range(ch // 8):
            for mx in range(cw // 8):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    bw.flush()
                    bw.out += bytes(
                        [0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)]
                    )
                    preds[0] = preds[1] = preds[2] = 0
                if grayscale:
                    emit(yplane, pw, mx, my, 0)
                else:
                    for by in range(s):
                        for bx in range(s):
                            emit(yplane, pw, mx * s + bx, my * s + by, 0)
                    emit(cb, cw, mx, my, 1)
                    emit(cr, cw, mx, my, 2)
                mcu_count += 1
        bw.flush()
        scans.append(bytes(bw.out))
    else:
        # non-interleaved: one scan per component over its OWN block
        # grid (luma dims = image dims; chroma dims = ceil(dim/s));
        # restart MCU count (= blocks) and marker modulo reset per scan
        cwd, chd = -(-width // s), -(-height // s)  # chroma dims (ceil)
        grids = [
            (yplane, pw, 0, -(-width // 8), -(-height // 8)),
            (cb, cw, 1, -(-cwd // 8), -(-chd // 8)),
            (cr, cw, 2, -(-cwd // 8), -(-chd // 8)),
        ]
        for plane, plane_w, ci, bxs, bys in grids:
            bw = _BitWriter()
            preds[ci] = 0
            blk_count = 0
            for by in range(bys):
                for bx in range(bxs):
                    if (
                        restart_interval
                        and blk_count
                        and blk_count % restart_interval == 0
                    ):
                        bw.flush()
                        bw.out += bytes(
                            [0xFF, 0xD0 + ((blk_count // restart_interval - 1) % 8)]
                        )
                        preds[ci] = 0
                    emit(plane, plane_w, bx, by, ci)
                    blk_count += 1
            bw.flush()
            scans.append(bytes(bw.out))

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tq: int, table_nat: list[int]) -> bytes:
        return seg(
            0xDB,
            bytes([tq]) + bytes(table_nat[ZIGZAG[k]] for k in range(64)),
        )

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    app0 = seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00"
    )
    sof_marker = 0xC2 if progressive else 0xC0
    if grayscale:
        sof = seg(
            sof_marker,
            struct.pack(">BHH", 8, height, width) + b"\x01" + bytes([1, 0x11, 0]),
        )
        sos_headers = [seg(0xDA, b"\x01" + bytes([1, 0x00]) + b"\x00\x3f\x00")]
    else:
        sof = seg(
            sof_marker,
            struct.pack(">BHH", 8, height, width)
            + b"\x03"
            + bytes([1, (s << 4) | s, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        if y_cbcr_split:
            sos_headers = [
                seg(0xDA, b"\x01" + bytes([1, 0x00]) + b"\x00\x3f\x00"),
                seg(
                    0xDA,
                    b"\x02" + bytes([2, 0x11, 3, 0x11]) + b"\x00\x3f\x00",
                ),
            ]
        elif interleaved:
            sos_headers = [
                seg(
                    0xDA,
                    b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00",
                )
            ]
        else:
            sos_headers = [
                seg(0xDA, b"\x01" + bytes([cid, tt]) + b"\x00\x3f\x00")
                for cid, tt in ((1, 0x00), (2, 0x11), (3, 0x11))
            ]
    if progressive:
        # DC scans carry (cid, td<<4), AC scans (cid, ta); table ids
        # follow the baseline assignment (0 luma, 1 chroma).
        sos_headers = [
            seg(
                0xDA,
                bytes([len(scomps)])
                + b"".join(
                    bytes([
                        ci + 1,
                        ((0 if ci == 0 else 1) << 4)
                        if ss_ == 0 else (0 if ci == 0 else 1),
                    ])
                    for ci in scomps
                )
                + bytes([ss_, se_, (ah_ << 4) | al_]),
            )
            for scomps, ss_, se_, ah_, al_ in prog_meta
        ]
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    body_out = b"".join(hdr + ent for hdr, ent in zip(sos_headers, scans))
    if progressive:
        ac_tabs = (
            dht(1, 0, PROG_AC_BITS, PROG_AC_VALS)
            + dht(1, 1, PROG_AC_BITS, PROG_AC_VALS)
        )
    else:
        ac_tabs = (
            dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
            + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        )
    return (
        b"\xff\xd8" + app0 + dqt(0, QUANT_LUMA) + dqt(1, QUANT_CHROMA)
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + ac_tabs + dri + sof + body_out + b"\xff\xd9"
    )
