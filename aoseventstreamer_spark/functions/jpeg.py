"""Baseline JPEG codec on stdlib + numpy — no media libraries.

Closes the last stubbed capability from the round-4 verdict (item #5):
the multimodal pipeline's JPEG branch now has REAL pixels, the same
way functions/png.py did it for PNG. Scope is the profile that covers
the overwhelming majority of real-world JPEGs:

- **decode**: baseline + extended-sequential Huffman JPEG (SOF0/SOF1)
  — DQT (8/16-bit), multiple DHT segments, restart intervals (DRI +
  RSTn with DC-predictor reset), byte-stuffed entropy stream, 1- or
  3-component scans, any sampling factors (chroma upsampled by sample
  replication), JFIF YCbCr -> RGB.
- **encode**: baseline sequential, 4:4:4 (no subsampling), Annex K
  quantization tables scaled by libjpeg's quality formula, Annex K
  Huffman tables, optional restart interval (used by tests to
  exercise the decoder's RST path).
- **out of scope** (raise UnsupportedJPEGError -> callers fall back
  to the documented stub, never a task failure): progressive (SOF2),
  arithmetic coding (SOF9+), hierarchical, 12-bit precision, CMYK.

Everything is uint8/int32/float64 numpy; the 2-D DCT runs as two
matmuls against the orthonormal DCT-II basis (A @ block @ A.T), so
encode/decode are exact inverses up to quantization.

The entropy decoder is pure Python bit-walking — fine for the
fixture-scale payloads that flow through mapInPandas here; a
production swap-in (PIL/libjpeg-turbo) changes only this module, per
the multimodal tiering contract (operators/multimodal.py docstring).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "JPEGError",
    "UnsupportedJPEGError",
    "decode_jpeg",
    "encode_jpeg",
]


class JPEGError(ValueError):
    """Malformed JPEG payload."""


class UnsupportedJPEGError(JPEGError):
    """Valid JPEG outside the supported profile (progressive,
    arithmetic, 12-bit, CMYK); callers should fall back, not fail."""


# --------------------------------------------------------------------------
# shared constants
# --------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# orthonormal 8x8 DCT-II basis: A[u, x] = 0.5 * c(u) * cos((2x+1)u*pi/16)
_A = np.array([
    [0.5 * (1 / np.sqrt(2) if u == 0 else 1.0)
     * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])

# ITU-T T.81 Annex K.1 — example quantization tables
QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QTBL_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# ITU-T T.81 Annex K.3 — typical Huffman tables: (bits[1..16], values)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)


def _huff_decode_table(bits: list[int], values: list[int]) -> dict:
    """(code_length, code) -> symbol, canonical Huffman assignment
    (T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], values: list[int]) -> dict:
    """symbol -> (code, length)."""
    out = {}
    for (length, code), sym in _huff_decode_table(bits, values).items():
        out[sym] = (code, length)
    return out


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; stops at any real marker (0xFF xx, xx != 0)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos  # byte position
        self.cur = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        p = self.pos
        if p >= len(d):
            raise JPEGError("entropy stream truncated")
        byte = d[p]
        if byte == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos = p + 2  # stuffed 0xFF data byte
            else:
                # real marker: T.81 F.2.2.5 — missing bits read as 0
                # (the MCU loop stops at the marker independently)
                self.cur = (self.cur << 8) | 0
                self.nbits += 8
                return
        else:
            self.pos = p + 1
        self.cur = (self.cur << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Drop partial byte and any stuffed padding; position at the
        next 0xFF marker byte."""
        self.cur = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                return
            self.pos += 1

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JPEGError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map the s-bit magnitude pattern to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline/extended-sequential JPEG to uint8 pixels:
    (h, w) for 1-component (grayscale), (h, w, 3) RGB for YCbCr."""
    b = bytes(data)
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        raise JPEGError("not a JPEG (missing SOI)")

    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (h, w, [(cid, hi, vi, tq), ...])
    pos = 2
    try:
        return _parse_segments(
            b, pos, qtables, huff_dc, huff_ac, restart_interval, frame
        )
    except JPEGError:
        raise
    except (struct.error, ValueError, IndexError) as e:
        # any structural garbage classifies as malformed — the
        # multimodal fallback contract (never a task failure)
        raise JPEGError(f"malformed JPEG structure: {e}") from e


def _parse_segments(b, pos, qtables, huff_dc, huff_ac, restart_interval, frame):
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise JPEGError(f"expected marker at {pos}")
        marker = b[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            raise JPEGError("EOI before scan")
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        body = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    vals = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = vals
                qtables[tq] = q.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            if len(body) < 6:
                raise JPEGError("truncated SOF")
            precision = body[0]
            if precision != 8:
                raise UnsupportedJPEGError(f"{precision}-bit precision")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise UnsupportedJPEGError(f"{ncomp}-component scan")
            if len(body) < 6 + 3 * ncomp:
                raise JPEGError("truncated SOF component list")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise UnsupportedJPEGError("progressive JPEG (SOF2)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedJPEGError(f"SOF marker 0x{marker:02x}")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                i += 17 + n
                tbl = _huff_decode_table(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise JPEGError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            pos = pos + 2 + seglen
            return _decode_scan(
                b, pos, frame, scan, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / anything else: skip
        pos += 2 + seglen
    raise JPEGError("no scan found")


def _decode_scan(b, pos, frame, scan, qtables, huff_dc, huff_ac, dri):
    h, w, comps = frame
    if h == 0 or w == 0:
        raise JPEGError("zero dimension")
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    planes = {}
    for cid, hi, vi, tq in comps:
        planes[cid] = np.zeros((mcus_y * vi * 8, mcus_x * hi * 8), dtype=np.float64)

    reader = _BitReader(b, pos)
    pred = {cid: 0 for cid, _, _ in scan}
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and n_mcu and n_mcu % dri == 0:
                reader.align_to_marker()
                d = reader.data
                if reader.pos + 1 < len(d) and d[reader.pos] == 0xFF and \
                        0xD0 <= d[reader.pos + 1] <= 0xD7:
                    reader.pos += 2
                    pred = {cid: 0 for cid in pred}
                else:
                    raise JPEGError("missing restart marker")
            for cs, td, ta in scan:
                hi, vi, tq = by_id[cs]
                qt = qtables.get(tq)
                if qt is None:
                    raise JPEGError(f"missing quant table {tq}")
                dct = huff_dc.get(td)
                act = huff_ac.get(ta)
                if dct is None or act is None:
                    raise JPEGError("missing Huffman table")
                for v in range(vi):
                    for hblk in range(hi):
                        coef = np.zeros(64, dtype=np.int32)
                        s = reader.huff(dct)
                        if s > 11:
                            raise JPEGError("bad DC size")
                        diff = _extend(reader.receive(s), s)
                        pred[cs] += diff
                        coef[0] = pred[cs]
                        k = 1
                        while k < 64:
                            rs = reader.huff(act)
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JPEGError("AC index overflow")
                            coef[k] = _extend(reader.receive(size), size)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = coef * qt.reshape(-1)[ZIGZAG]
                        spatial = _A.T @ blk.reshape(8, 8) @ _A + 128.0
                        y0 = (my * vi + v) * 8
                        x0 = (mx * hi + hblk) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = spatial
            n_mcu += 1

    # upsample to full resolution and crop
    full = []
    for cid, hi, vi, tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.cur = (self.cur << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.cur >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing

    def flush(self, pad_with_ones: bool = True):
        if self.nbits:
            pad = (1 << (8 - self.nbits)) - 1 if pad_with_ones else 0
            byte = ((self.cur << (8 - self.nbits)) | pad) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.cur = 0
            self.nbits = 0


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality -> table scaling."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, bit pattern) for a signed coefficient (T.81 F.1.2.1.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    pattern = v if v > 0 else v + (1 << size) - 1
    return size, pattern


def _encode_block(bw, block, qt, dc_tbl, ac_tbl, pred):
    """Forward DCT + quantize + Huffman one 8x8 block; returns new DC
    predictor."""
    coefs = _A @ (block - 128.0) @ _A.T
    q = np.round(coefs / qt).astype(np.int32)
    zz = q.reshape(-1)[ZIGZAG]  # raster -> zigzag stream order
    dc = int(zz[0])
    diff = dc - pred
    size, pattern = _magnitude(diff)
    code, length = dc_tbl[size]
    bw.write(code, length)
    if size:
        bw.write(pattern, size)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k] != 0:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, pattern = _magnitude(v)
        code, length = ac_tbl[(run << 4) | size]
        bw.write(code, length)
        bw.write(pattern, size)
        run = 0
    if last_nz < 63:
        code, length = ac_tbl[0x00]  # EOB
        bw.write(code, length)
    return dc


def encode_jpeg(
    arr: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """Encode uint8 pixels — (h, w) grayscale or (h, w, 3) RGB — as a
    baseline sequential 4:4:4 JFIF JPEG. ``restart_interval`` > 0
    emits DRI + RSTn markers every that many MCUs (mainly to exercise
    the decoder's restart path without external fixtures)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise JPEGError(f"expected uint8 pixels, got {a.dtype}")
    if a.ndim == 3 and a.shape[2] == 4:
        a = a[:, :, :3]  # drop alpha
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    if a.ndim not in (2, 3) or (a.ndim == 3 and a.shape[2] != 3):
        raise JPEGError(f"unsupported pixel shape {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise JPEGError("empty image")
    gray = a.ndim == 2

    qt_l = _quality_scale(QTBL_LUMA, quality)
    qt_c = _quality_scale(QTBL_CHROMA, quality)

    if gray:
        planes = [a.astype(np.float64)]
        qts = [qt_l]
    else:
        rgb = a.astype(np.float64)
        r, g, bl = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        planes = [y, np.clip(cb, 0, 255), np.clip(cr, 0, 255)]
        qts = [qt_l, qt_c, qt_c]

    # pad to multiples of 8 by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
    for tq, qt in ((0, qt_l),) if gray else ((0, qt_l), (1, qt_c)):
        zz = qt.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for c in range(ncomp):
        out += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    hts = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if not gray:
        hts += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    for tcth, (bits, values) in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) \
            + bytes([tcth]) + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for c in range(ncomp):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    dc_l = _huff_encode_table(*HUFF_DC_LUMA)
    ac_l = _huff_encode_table(*HUFF_AC_LUMA)
    dc_c = _huff_encode_table(*HUFF_DC_CHROMA)
    ac_c = _huff_encode_table(*HUFF_AC_CHROMA)
    if gray:
        enc_tbls = [(dc_l, ac_l)]
    else:
        enc_tbls = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]

    bw = _BitWriter()
    preds = [0] * ncomp
    n_mcu = 0
    rst = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * ncomp
            for c in range(ncomp):
                dc_tbl, ac_tbl = enc_tbls[c]
                preds[c] = _encode_block(
                    bw,
                    planes[c][by : by + 8, bx : bx + 8],
                    qts[0 if c == 0 else 1].astype(np.float64),
                    dc_tbl,
                    ac_tbl,
                    preds[c],
                )
            n_mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
