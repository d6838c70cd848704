"""Baseline JPEG codec on stdlib + numpy — no media libraries.

Closes the last stubbed capability from the round-4 verdict (item #5):
the multimodal pipeline's JPEG branch now has REAL pixels, the same
way functions/png.py did it for PNG. Scope is the profile that covers
the overwhelming majority of real-world JPEGs:

- **decode**: baseline + extended-sequential Huffman JPEG (SOF0/SOF1)
  — DQT (8/16-bit), multiple DHT segments, restart intervals (DRI +
  RSTn with DC-predictor reset), byte-stuffed entropy stream, 1- or
  3-component scans, any sampling factors (chroma upsampled by sample
  replication), JFIF YCbCr -> RGB — 12-bit SOF1 frames included
  (uint16 output in [0, 4095], DC categories to 15 — the medical/
  scientific profile) — AND progressive Huffman JPEG (SOF2, T.81
  Annex G): multi-scan coefficient accumulation with spectral
  selection and FULL successive approximation (DC refinement bits,
  AC correction-bit scans with EOBRUN and ZRL), inter-scan
  DHT/DQT/DRI updates.
- **encode**: sequential 4:4:4 (no subsampling), Annex K quantization
  tables scaled by libjpeg's quality formula, optional restart
  interval — baseline SOF0 for 8-bit with the Annex K Huffman tables,
  extended-sequential SOF1 for 12-bit with 16-bit DQT entries and
  flat canonical Huffman tables (Annex K publishes no 12-bit
  examples); plus ``encode_jpeg_progressive`` (SOF2 scan script with
  Al=1 first passes + refinement scans) — primarily the test-vector
  generators for the decoder, pixel-exact roundtrips asserted.
- **out of scope** (raise UnsupportedJPEGError -> callers fall back
  to the documented stub, never a task failure): arithmetic coding
  (SOF9+), hierarchical, CMYK, per-component sequential scans
  (ns < ncomp), 12-bit progressive.

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
    "encode_jpeg_progressive",
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


def _flat_table(symbols: list[int], length: int) -> tuple[list[int], list[int]]:
    """Canonical Huffman table with every symbol at ``length`` bits —
    valid iff len(symbols) < 2^length (keeps the all-ones code free,
    T.81 C.2). Annex K has no 12-bit example tables, so the 12-bit
    encoder uses these flat ones; any T.81 decoder reads them fine."""
    if len(symbols) >= (1 << length):
        raise ValueError("too many symbols for flat code length")
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, list(symbols)


# 12-bit precision: DC categories 0..15, AC (run, size) with size 1..14
# plus EOB (0x00) and ZRL (0xF0) — 226 symbols
HUFF_DC_12 = _flat_table(list(range(16)), 5)
HUFF_AC_12 = _flat_table(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 15)],
    8,
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


def _check_sampling(comps) -> None:
    """r9 fresh-eyes guards: a sampling factor of 0 (corrupt SOF)
    previously crashed the MCU geometry with ZeroDivisionError instead
    of a typed error, and NON-DIVISIBLE ratios (e.g. 3:2 — legal but
    exotic; T.81 only bounds factors to 1..4) mis-shaped _assemble's
    integer np.repeat upsampling. Both now raise typed errors so the
    batch decode path degrades to its documented skip/stub behavior."""
    for cid, hi, vi, _tq in comps:
        if not (1 <= hi <= 4 and 1 <= vi <= 4):
            raise JPEGError(f"component {cid}: sampling {hi}x{vi} out of range")
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    for cid, hi, vi, _tq in comps:
        if hmax % hi or vmax % vi:
            raise UnsupportedJPEGError(
                f"non-integer sampling ratio ({hi}x{vi} vs max {hmax}x{vmax})"
            )


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
            # baseline (SOF0) is 8-bit by definition; extended
            # sequential (SOF1) additionally allows 12-bit samples
            if precision != 8 and not (marker == 0xC1 and precision == 12):
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
            _check_sampling(comps)
            frame = (h, w, comps, precision)
        elif marker == 0xC2:  # SOF2 — progressive: hand the rest of
            # the stream to the multi-scan coefficient decoder
            if len(body) < 6:
                raise JPEGError("truncated SOF")
            precision = body[0]
            if precision != 8:
                raise UnsupportedJPEGError(f"{precision}-bit precision")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise UnsupportedJPEGError(f"{ncomp}-component scan")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            _check_sampling(comps)
            return _decode_progressive(
                b, pos + 2 + seglen, (h, w, comps), qtables,
                huff_dc, huff_ac, restart_interval,
            )
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
            if ns != len(frame[2]):
                # legal baseline variant (per-component sequential
                # scans, ns < ncomp) that _decode_scan's single
                # interleaved-MCU walk would render with the missing
                # planes zeroed — corrupt colors, silently. Out of the
                # supported profile: typed raise -> stub fallback.
                raise UnsupportedJPEGError(
                    f"non-interleaved scan ({ns} of {len(frame[2])} components)"
                )
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
    h, w, comps, prec = frame
    center = 1 << (prec - 1)
    max_dc_size = 11 if prec == 8 else 15  # T.81 tables F.1 / F.6
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
                        if s > max_dc_size:
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
                        spatial = _A.T @ blk.reshape(8, 8) @ _A + float(center)
                        y0 = (my * vi + v) * 8
                        x0 = (mx * hi + hblk) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = spatial
            n_mcu += 1

    return _assemble(planes, comps, h, w, hmax, vmax, prec)


def _assemble(planes, comps, h, w, hmax, vmax, prec=8):
    """Upsample component planes to full resolution, crop, and color
    convert — shared by the sequential and progressive paths. 12-bit
    frames come back as uint16 in [0, 4095] (the medical/scientific
    profile); 8-bit as uint8."""
    center = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    dtype = np.uint8 if prec == 8 else np.uint16
    full = []
    for cid, hi, vi, tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, maxv).astype(dtype)
    y, cb, cr = full
    r = y + 1.402 * (cr - center)
    g = y - 0.344136 * (cb - center) - 0.714136 * (cr - center)
    bl = y + 1.772 * (cb - center)
    rgb = np.stack([r, g, bl], axis=-1)
    return np.clip(np.round(rgb), 0, maxv).astype(dtype)


# --------------------------------------------------------------------------
# progressive decoder (SOF2, T.81 Annex G) — spectral selection AND
# successive approximation, Huffman only
# --------------------------------------------------------------------------


def _decode_progressive(b, pos, frame, qtables, huff_dc, huff_ac, dri):
    """Multi-scan decode: every SOS updates per-component coefficient
    grids (zigzag order, FULL precision accumulated across approximation
    passes); DHT/DQT/DRI segments between scans take effect for the
    scans that follow; EOI triggers dequantize + IDCT + assemble."""
    h, w, comps = frame
    if h == 0 or w == 0:
        raise JPEGError("zero dimension")
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # coefficient store: (block_rows, block_cols, 64) int32 per comp,
    # allocated on the MCU-padded grid (interleaved scans touch it all)
    coefs = {
        cid: np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int32)
        for cid, hi, vi, tq in comps
    }
    # non-interleaved scans cover only the component's REAL block grid
    ndims = {
        cid: (-(-(h * vi) // (8 * vmax)), -(-(w * hi) // (8 * hmax)))
        for cid, hi, vi, tq in comps
    }

    saw_scan = False
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise JPEGError(f"expected marker at {pos}")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RSTn between scans: a scan
            # whose entropy data ends exactly at a restart boundary
            # leaves its marker for this walker — skip, it has no body
            pos += 2
            continue
        if pos + 4 > len(b):
            raise JPEGError("truncated segment header")
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        body = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                i += 17 + n
                tbl = _huff_decode_table(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
            pos += 2 + seglen
        elif marker == 0xDB:  # DQT between scans
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                n = 64 if pq == 0 else 128
                dt = np.uint8 if pq == 0 else ">u2"
                vals = np.frombuffer(body[i : i + n], dtype=dt).astype(np.int32)
                i += n
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = vals
                qtables[tq] = q.reshape(8, 8)
            pos += 2 + seglen
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
            pos += 2 + seglen
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos = _decode_prog_scan(
                b, pos + 2 + seglen, scan, ss, se, ah, al, coefs, ndims,
                by_id, huff_dc, huff_ac, dri, mcus_x, mcus_y,
            )
            saw_scan = True
        else:  # APPn/COM/...: skip
            pos += 2 + seglen
    if not saw_scan:
        raise JPEGError("no scan found")

    planes = {}
    for cid, hi, vi, tq in comps:
        qt = qtables.get(tq)
        if qt is None:
            raise JPEGError(f"missing quant table {tq}")
        grid = coefs[cid]
        rows, cols = grid.shape[:2]
        plane = np.zeros((rows * 8, cols * 8), dtype=np.float64)
        qz = qt.reshape(-1)  # raster order
        for r in range(rows):
            for c in range(cols):
                blk = np.zeros(64, dtype=np.float64)
                # dequantize in zigzag order, scatter to raster
                blk[ZIGZAG] = grid[r, c] * qz[ZIGZAG]
                plane[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = (
                    _A.T @ blk.reshape(8, 8) @ _A + 128.0
                )
        planes[cid] = plane
    return _assemble(planes, comps, h, w, hmax, vmax)


def _decode_prog_scan(b, pos, scan, ss, se, ah, al, coefs, ndims, by_id,
                      huff_dc, huff_ac, dri, mcus_x, mcus_y):
    """One progressive scan; returns the byte position of the next
    marker. DC scans (ss==0) may interleave components in MCU order;
    AC scans are single-component over that component's block grid."""
    reader = _BitReader(b, pos)
    state = {"eobrun": 0, "pred": {cs: 0 for cs, _, _ in scan}}

    def restart(n_units):
        if not (dri and n_units and n_units % dri == 0):
            return
        reader.align_to_marker()
        d = reader.data
        if reader.pos + 1 < len(d) and d[reader.pos] == 0xFF and \
                0xD0 <= d[reader.pos + 1] <= 0xD7:
            reader.pos += 2
            state["pred"] = {cs: 0 for cs in state["pred"]}
            state["eobrun"] = 0
        else:
            raise JPEGError("missing restart marker")

    if ss == 0:  # DC scan
        if se != 0:
            raise JPEGError("DC scan with Se != 0")
        if len(scan) > 1:  # interleaved, MCU order
            n = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    restart(n)
                    for cs, td, ta in scan:
                        hi, vi, _ = by_id[cs]
                        for v in range(vi):
                            for hblk in range(hi):
                                _dc_unit(
                                    reader, coefs[cs],
                                    my * vi + v, mx * hi + hblk,
                                    huff_dc.get(td), ah, al,
                                    state, cs,
                                )
                    n += 1
        else:
            cs, td, ta = scan[0]
            rows, cols = ndims[cs]
            n = 0
            for r in range(rows):
                for c in range(cols):
                    restart(n)
                    _dc_unit(reader, coefs[cs], r, c, huff_dc.get(td),
                             ah, al, state, cs)
                    n += 1
    else:  # AC scan: exactly one component (T.81 G.1.1.1.1)
        if len(scan) != 1:
            raise JPEGError("interleaved AC scan is not legal JPEG")
        cs, td, ta = scan[0]
        act = huff_ac.get(ta)
        if act is None:
            raise JPEGError("missing AC Huffman table")
        rows, cols = ndims[cs]
        grid = coefs[cs]
        n = 0
        for r in range(rows):
            for c in range(cols):
                restart(n)
                if ah == 0:
                    _ac_first_unit(reader, grid[r, c], act, ss, se, al, state)
                else:
                    _ac_refine_unit(reader, grid[r, c], act, ss, se, al, state)
                n += 1
    reader.align_to_marker()
    return reader.pos


def _dc_unit(reader, grid, r, cidx, dct, ah, al, state, cs):
    if r >= grid.shape[0] or cidx >= grid.shape[1]:
        raise JPEGError("DC unit outside grid")
    if ah == 0:  # first pass: diff-coded, point-transformed
        if dct is None:
            raise JPEGError("missing DC Huffman table")
        s = reader.huff(dct)
        if s > 11:
            raise JPEGError("bad DC size")
        diff = _extend(reader.receive(s), s)
        state["pred"][cs] += diff
        grid[r, cidx, 0] = state["pred"][cs] << al
    else:  # refinement: one bit
        if reader.read_bit():
            grid[r, cidx, 0] = int(grid[r, cidx, 0]) | (1 << al)


def _ac_first_unit(reader, coef, act, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.huff(act)
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << rr) - 1
            if rr:
                eobrun += reader.receive(rr)
            state["eobrun"] = eobrun
            return
        k += rr
        if k > se:
            raise JPEGError("AC index overflow")
        coef[k] = _extend(reader.receive(s), s) << al
        k += 1


def _ac_refine_unit(reader, coef, act, ss, se, al, state):
    """T.81 G.1.2.3 AC successive-approximation refinement — the
    correction-bit walk libjpeg calls decode_mcu_AC_refine."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.huff(act)
            rr, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if rr < 15:
                    state["eobrun"] = (1 << rr)
                    if rr:
                        state["eobrun"] += reader.receive(rr)
                    break  # EOB band: tail loop below handles this unit
                # rr == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise JPEGError("refinement size must be 1")
                newval = p1 if reader.read_bit() else m1
            # advance past rr zero-history coeffs, emitting correction
            # bits for every nonzero-history coeff crossed
            while k <= se:
                if coef[k] != 0:
                    if reader.read_bit() and (int(coef[k]) & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if coef[k] != 0:
                if reader.read_bit() and (int(coef[k]) & p1) == 0:
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


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


def _encode_block(bw, block, qt, dc_tbl, ac_tbl, pred, center=128.0,
                  max_ac=1023):
    """Forward DCT + quantize + Huffman one 8x8 block; returns new DC
    predictor.

    ``max_ac`` clamps quantized AC magnitudes to the Huffman table's
    representable range (1023 = size 10 for the Annex K 8-bit tables,
    16383 = size 14 for the flat 12-bit tables): the float DCT of a
    max-amplitude block at quality 100 (qt entries of 1) can round one
    coefficient past the T.81 amplitude bound (|AC| = 16384 → size 15),
    which would otherwise surface as a raw KeyError from the table
    lookup instead of a conformant stream."""
    coefs = _A @ (block - center) @ _A.T
    q = np.round(coefs / qt).astype(np.int32)
    zz = q.reshape(-1)[ZIGZAG]  # raster -> zigzag stream order
    np.clip(zz[1:], -max_ac, max_ac, out=zz[1:])
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


def _emit_ac_first(bw, coef, ac_tbl, ss, se, al):
    """One block of an AC first scan (Ah=0): run/size over the
    point-transformed band, ZRL for 16-zero runs, EOB for the tail
    (per-block EOB — no cross-block EOBRUN batching, which is legal
    and keeps the encoder simple; the decoder handles batched runs
    from other encoders)."""
    run = 0
    emitted_any = False
    for k in range(ss, se + 1):
        v = int(coef[k])
        mag = (abs(v) >> al)
        if mag == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]
            bw.write(code, length)
            run -= 16
        sv = mag if v > 0 else -mag
        size, pattern = _magnitude(sv)
        code, length = ac_tbl[(run << 4) | size]
        bw.write(code, length)
        bw.write(pattern, size)
        run = 0
        emitted_any = True
    if run > 0 or not emitted_any:
        code, length = ac_tbl[0x00]
        bw.write(code, length)


def _emit_ac_refine(bw, coef, ac_tbl, ss, se, al):
    """One block of an AC refinement scan (Ah=Al+1 -> Al): newly
    significant coefficients as run/1 + sign, correction bits for
    already-significant ones buffered and flushed after each symbol
    (libjpeg's encode_mcu_AC_refine discipline, per-block EOB)."""
    p_bits: list[int] = []  # buffered correction bits
    run = 0
    for k in range(ss, se + 1):
        v = int(coef[k])
        mag = abs(v) >> al
        if mag == 0:
            run += 1
            continue
        # the ZRL drain runs at EVERY nonzero coefficient (libjpeg
        # checks it before the correction-bit branch): flushing only
        # at newly-significant ones would buffer correction bits for
        # coefficients beyond the decoder's 16-zero walk window —
        # a bit-stream desync (caught by the q=30 fuzz)
        while run > 15:
            code, length = ac_tbl[0xF0]
            bw.write(code, length)
            run -= 16
            for bit in p_bits:
                bw.write(bit, 1)
            p_bits = []
        if mag > 1:  # already significant: one correction bit
            p_bits.append(mag & 1)
            continue
        # newly significant (mag == 1)
        code, length = ac_tbl[(run << 4) | 1]
        bw.write(code, length)
        bw.write(1 if v > 0 else 0, 1)
        for bit in p_bits:
            bw.write(bit, 1)
        p_bits = []
        run = 0
    if run > 0 or p_bits:
        code, length = ac_tbl[0x00]  # EOB covering this block
        bw.write(code, length)
        for bit in p_bits:
            bw.write(bit, 1)


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 85, successive: bool = True
) -> bytes:
    """Encode uint8 pixels as a PROGRESSIVE (SOF2) 4:4:4 JFIF JPEG.

    Scan script: a DC scan (interleaved when 3 components), then per
    component two spectral AC bands (1-5, 6-63). With
    ``successive=True`` every scan first sends the coefficients at
    Al=1 and a later pass refines to Al=0 — exercising DC refinement
    bits and the AC correction-bit protocol, the parts of Annex G
    that real encoders (libjpeg/mozjpeg scan scripts) emit. Exists
    mainly to generate test vectors for the progressive decoder;
    pixel output decodes EXACTLY equal to the baseline encoding of
    the same array (same coefficients, same tables)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise JPEGError(f"expected uint8 pixels, got {a.dtype}")
    if a.ndim == 3 and a.shape[2] == 4:
        a = a[:, :, :3]
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
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes]
    ncomp = len(planes)

    # quantized coefficient grids, zigzag order
    grids = []
    for ci, p in enumerate(planes):
        qt = qts[ci].astype(np.float64)
        rows, cols = ph // 8, pw // 8
        g_ = np.zeros((rows, cols, 64), dtype=np.int32)
        for rr in range(rows):
            for cc in range(cols):
                coefs = _A @ (p[rr * 8 : rr * 8 + 8, cc * 8 : cc * 8 + 8] - 128.0) @ _A.T
                g_[rr, cc] = np.round(coefs / qt).astype(np.int32).reshape(-1)[ZIGZAG]
        # same AC amplitude clamp as _encode_block: the Annex K 8-bit
        # AC tables stop at size 10 (|AC| <= 1023)
        np.clip(g_[:, :, 1:], -1023, 1023, out=g_[:, :, 1:])
        grids.append(g_)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, qt in ((0, qt_l),) if gray else ((0, qt_l), (1, qt_c)):
        zz = qt.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for c in range(ncomp):
        out += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    hts = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if not gray:
        hts += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    for tcth, (bits, values) in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) \
            + bytes([tcth]) + bytes(bits) + bytes(values)

    dc_enc = [_huff_encode_table(*(HUFF_DC_LUMA if c == 0 else HUFF_DC_CHROMA))
              for c in range(ncomp)]
    ac_enc = [_huff_encode_table(*(HUFF_AC_LUMA if c == 0 else HUFF_AC_CHROMA))
              for c in range(ncomp)]
    rows, cols = ph // 8, pw // 8

    def sos_header(comps_in_scan, ss, se, ah, al):
        hdr = b"\xff\xda" + struct.pack(
            ">HB", 6 + 2 * len(comps_in_scan), len(comps_in_scan)
        )
        for ci in comps_in_scan:
            td = 0 if ci == 0 else 1
            ta = 0 if ci == 0 else 1
            hdr += bytes([ci + 1, (td << 4) | ta])
        hdr += bytes([ss, se, (ah << 4) | al])
        return hdr

    def dc_scan(al_first, refine_al=None):
        nonlocal out
        all_c = list(range(ncomp))
        if refine_al is None:  # first pass
            out += sos_header(all_c, 0, 0, 0, al_first)
            bw = _BitWriter()
            preds = [0] * ncomp
            for rr in range(rows):
                for cc in range(cols):
                    for ci in all_c:
                        dc = int(grids[ci][rr, cc, 0]) >> al_first
                        size, pattern = _magnitude(dc - preds[ci])
                        code, length = dc_enc[ci][size]
                        bw.write(code, length)
                        if size:
                            bw.write(pattern, size)
                        preds[ci] = dc
            bw.flush()
            out += bw.out
        else:
            out += sos_header(all_c, 0, 0, refine_al + 1, refine_al)
            bw = _BitWriter()
            for rr in range(rows):
                for cc in range(cols):
                    for ci in all_c:
                        bw.write((int(grids[ci][rr, cc, 0]) >> refine_al) & 1, 1)
            bw.flush()
            out += bw.out

    def ac_scan(ci, ss, se, ah, al):
        nonlocal out
        out += sos_header([ci], ss, se, ah, al)
        bw = _BitWriter()
        for rr in range(rows):
            for cc in range(cols):
                if ah == 0:
                    _emit_ac_first(bw, grids[ci][rr, cc], ac_enc[ci], ss, se, al)
                else:
                    _emit_ac_refine(bw, grids[ci][rr, cc], ac_enc[ci], ss, se, al)
        bw.flush()
        out += bw.out

    if successive:
        dc_scan(1)
        for ci in range(ncomp):
            ac_scan(ci, 1, 5, 0, 1)
            ac_scan(ci, 6, 63, 0, 1)
        dc_scan(0, refine_al=0)
        for ci in range(ncomp):
            ac_scan(ci, 1, 5, 1, 0)
            ac_scan(ci, 6, 63, 1, 0)
    else:
        dc_scan(0)
        for ci in range(ncomp):
            ac_scan(ci, 1, 5, 0, 0)
            ac_scan(ci, 6, 63, 0, 0)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Encode pixels — (h, w) grayscale or (h, w, 3) RGB — as a
    sequential 4:4:4 JFIF JPEG. ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs (mainly to exercise the
    decoder's restart path without external fixtures).

    ``precision=8`` (uint8 input) emits baseline SOF0 with the Annex K
    tables; ``precision=12`` (uint16 input in [0, 4095]) emits
    extended-sequential SOF1 with 16-bit DQT entries and the flat
    12-bit Huffman tables (Annex K has no 12-bit examples) — the
    test-vector generator for the 12-bit decode path."""
    if precision not in (8, 12):
        raise JPEGError(f"unsupported encode precision {precision}")
    a = np.asarray(arr)
    want = np.uint8 if precision == 8 else np.uint16
    if a.dtype != want:
        raise JPEGError(f"expected {want.__name__} pixels, got {a.dtype}")
    maxv = (1 << precision) - 1
    center = float(1 << (precision - 1))
    if precision == 12 and a.max(initial=0) > maxv:
        raise JPEGError("12-bit sample out of range")
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
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + center
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + center
        planes = [y, np.clip(cb, 0, maxv), np.clip(cr, 0, maxv)]
        qts = [qt_l, qt_c, qt_c]

    # pad to multiples of 8 by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
    for tq, qt in ((0, qt_l),) if gray else ((0, qt_l), (1, qt_c)):
        if precision == 8:
            zz = qt.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
            out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
        else:  # 16-bit DQT entries (pq=1), as 12-bit profiles use
            zz = qt.reshape(-1)[ZIGZAG].astype(">u2").tobytes()
            out += b"\xff\xdb" + struct.pack(">H", 131) + bytes([0x10 | tq]) + zz
    ncomp = 1 if gray else 3
    sof = b"\xff\xc0" if precision == 8 else b"\xff\xc1"
    out += sof + struct.pack(">HBHHB", 8 + 3 * ncomp, precision, h, w, ncomp)
    for c in range(ncomp):
        out += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    if precision == 8:
        dc_tables = (HUFF_DC_LUMA, HUFF_DC_CHROMA)
        ac_tables = (HUFF_AC_LUMA, HUFF_AC_CHROMA)
    else:
        dc_tables = (HUFF_DC_12, HUFF_DC_12)
        ac_tables = (HUFF_AC_12, HUFF_AC_12)
    hts = [(0x00, dc_tables[0]), (0x10, ac_tables[0])]
    if not gray:
        hts += [(0x01, dc_tables[1]), (0x11, ac_tables[1])]
    for tcth, (bits, values) in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) \
            + bytes([tcth]) + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for c in range(ncomp):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    dc_l = _huff_encode_table(*dc_tables[0])
    ac_l = _huff_encode_table(*ac_tables[0])
    dc_c = _huff_encode_table(*dc_tables[1])
    ac_c = _huff_encode_table(*ac_tables[1])
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
                    center,
                    max_ac=16383 if precision == 12 else 1023,
                )
            n_mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
