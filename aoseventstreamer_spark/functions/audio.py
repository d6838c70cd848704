"""FLAC + MP3 header encode/parse on plain bytes — no media libs.

Completes the audio leg of the multimodal sniffing surface (VERDICT r6
item 2): WAV already decodes (operators/multimodal.decode_wav_pcm) and
MP4 carries full moov metadata (functions/mp4.py), but mp3/flac blobs
degraded to mime-only. This module brings both to the same depth:

- FLAC (RFC 9639 / xiph spec): ``fLaC`` magic, metadata-block walk,
  STREAMINFO parse — sample rate (20 bits), channels (3 bits + 1),
  bits per sample (5 bits + 1), total samples (36 bits) → duration.
- MP3 (ISO 11172-3 / 13818-3 Layer III): optional ID3v2 skip
  (syncsafe size), frame-header walk across the WHOLE stream —
  version, bitrate, sample rate, channel mode per frame; duration
  from the true frame count (not a CBR size estimate), optional
  ID3v1 trailer skip.

The parsers are STRICT (the mp4.py discipline): truncated magic,
overflowing block/frame lengths, reserved bitrate/samplerate indices,
or trailing garbage raise the typed ``FLACError`` / ``MP3Error`` so
callers can quarantine the blob; the tolerant screen-everything path
(``sniff_header``) catches them and degrades to mime-only. The
in-module encoders are the test-vector generators (build the encoder
first, roundtrip against it): spec-conformant STREAMINFO /
VORBIS_COMMENT / PADDING blocks, MPEG1+MPEG2 Layer III frames with
per-frame padding, ID3v2/ID3v1 tags.
"""

from __future__ import annotations


class AudioError(ValueError):
    """Malformed or truncated audio container (quarantine signal)."""


class FLACError(AudioError):
    """Malformed or truncated FLAC structure."""


class MP3Error(AudioError):
    """Malformed or truncated MP3 stream."""


# --------------------------------------------------------------------------
# FLAC
# --------------------------------------------------------------------------

_FLAC_MAGIC = b"fLaC"
_STREAMINFO_LEN = 34


def encode_flac(
    sample_rate: int,
    channels: int,
    bits_per_sample: int,
    total_samples: int,
    vendor: str | None = None,
    padding: int = 0,
    frame_bytes: int = 64,
) -> bytes:
    """Build a spec-conformant FLAC header: magic + STREAMINFO
    (mandatory first block) + optional VORBIS_COMMENT + optional
    PADDING, followed by ``frame_bytes`` of deterministic frame-ish
    filler (sync-coded 0xFFF8 start). The parser must recover exactly
    the parameters written here."""
    if not (1 <= sample_rate < (1 << 20)):
        raise ValueError("sample_rate out of STREAMINFO range")
    if not (1 <= channels <= 8):
        raise ValueError("channels out of range")
    if not (4 <= bits_per_sample <= 32):
        raise ValueError("bits_per_sample out of range")
    if not (0 <= total_samples < (1 << 36)):
        raise ValueError("total_samples out of range")
    # the 8-byte packed field: rate(20) | channels-1(3) | bps-1(5) | total(36)
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | total_samples
    )
    streaminfo = (
        (4096).to_bytes(2, "big")  # min blocksize
        + (4096).to_bytes(2, "big")  # max blocksize
        + (0).to_bytes(3, "big")  # min framesize (0 = unknown, legal)
        + (0).to_bytes(3, "big")  # max framesize
        + packed.to_bytes(8, "big")
        + b"\x00" * 16  # md5 of unencoded audio (0 = unknown, legal)
    )
    blocks: list[tuple[int, bytes]] = [(0, streaminfo)]
    if vendor is not None:
        v = vendor.encode("utf-8")
        blocks.append(
            (4, len(v).to_bytes(4, "little") + v + (0).to_bytes(4, "little"))
        )
    if padding:
        blocks.append((1, b"\x00" * padding))
    out = bytearray(_FLAC_MAGIC)
    for i, (btype, body) in enumerate(blocks):
        last = 0x80 if i == len(blocks) - 1 else 0
        out += bytes([last | btype]) + len(body).to_bytes(3, "big") + body
    if frame_bytes:
        filler = bytearray(b"\xff\xf8")
        while len(filler) < frame_bytes:
            filler.append((len(filler) * 37) % 251)
        out += filler[:frame_bytes]
    return bytes(out)


def parse_flac(b: bytes) -> dict:
    """STRICT STREAMINFO parse: returns {sample_rate, channels,
    bits_per_sample, total_samples, duration_ms, n_metadata_blocks}.
    duration_ms is None when total_samples is 0 (unknown, legal).
    Raises FLACError on bad magic, truncation, a first block that is
    not STREAMINFO, a STREAMINFO of the wrong length, or a zero
    sample rate (forbidden by spec)."""
    b = bytes(b)
    if len(b) < 4 or b[:4] != _FLAC_MAGIC:
        raise FLACError("not a FLAC stream (missing fLaC magic)")
    i = 4
    n_blocks = 0
    info = None
    while True:
        if i + 4 > len(b):
            raise FLACError(f"truncated metadata block header at {i}")
        hdr = b[i]
        btype = hdr & 0x7F
        blen = int.from_bytes(b[i + 1 : i + 4], "big")
        body_start = i + 4
        if body_start + blen > len(b):
            raise FLACError(f"metadata block overflows stream at {i}")
        if n_blocks == 0:
            if btype != 0:
                raise FLACError("first metadata block is not STREAMINFO")
            if blen != _STREAMINFO_LEN:
                raise FLACError(f"STREAMINFO length {blen} != 34")
            body = b[body_start : body_start + blen]
            packed = int.from_bytes(body[10:18], "big")
            sample_rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bits = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            if sample_rate == 0:
                raise FLACError("STREAMINFO sample rate is 0")
            info = {
                "sample_rate": sample_rate,
                "channels": channels,
                "bits_per_sample": bits,
                "total_samples": total,
                "duration_ms": (total * 1000) // sample_rate if total else None,
            }
        n_blocks += 1
        i = body_start + blen
        if hdr & 0x80:  # last-metadata-block flag
            break
    info["n_metadata_blocks"] = n_blocks
    return info


# --------------------------------------------------------------------------
# MP3 (MPEG1 / MPEG2 Layer III)
# --------------------------------------------------------------------------

# bitrate (kbps) by index, Layer III; index 0 is "free" (unsupported
# here — needs frame-length discovery), 15 is reserved
_BITRATES_V1_L3 = [None, 32, 40, 48, 56, 64, 80, 96, 112,
                   128, 160, 192, 224, 256, 320, None]
_BITRATES_V2_L3 = [None, 8, 16, 24, 32, 40, 48, 56, 64,
                   80, 96, 112, 128, 144, 160, None]
_RATES_V1 = [44100, 48000, 32000, None]
_RATES_V2 = [22050, 24000, 16000, None]
_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _syncsafe(n: int) -> bytes:
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def encode_mp3(
    n_frames: int,
    bitrate_idx: int,
    samplerate_idx: int,
    mode: int = 0,
    mpeg2: bool = False,
    id3v2_size: int | None = None,
    id3v1: bool = False,
    pad_phase: int = 0,
) -> bytes:
    """Build a conformant Layer III stream: optional ID3v2 tag,
    ``n_frames`` complete frames (per-frame padding bit alternating
    from ``pad_phase`` — real CBR 44.1 kHz streams do exactly this),
    optional 128-byte ID3v1 trailer."""
    if not (1 <= bitrate_idx <= 14) or not (0 <= samplerate_idx <= 2):
        raise ValueError("reserved bitrate/samplerate index")
    version_bits = 0b10 if mpeg2 else 0b11
    bitrate = (_BITRATES_V2_L3 if mpeg2 else _BITRATES_V1_L3)[bitrate_idx]
    rate = (_RATES_V2 if mpeg2 else _RATES_V1)[samplerate_idx]
    per_frame = 72000 if mpeg2 else 144000
    out = bytearray()
    if id3v2_size is not None:
        out += b"ID3\x04\x00\x00" + _syncsafe(id3v2_size)
        out += bytes((j * 13) % 128 for j in range(id3v2_size))
    for f in range(n_frames):
        padding = (f + pad_phase) % 2
        b1 = 0xE0 | (version_bits << 3) | (0b01 << 1) | 1  # sync|ver|L3|noCRC
        b2 = (bitrate_idx << 4) | (samplerate_idx << 2) | (padding << 1)
        b3 = (mode << 6)
        frame_len = (per_frame * bitrate) // rate + padding
        frame = bytearray([0xFF, b1, b2, b3])
        while len(frame) < frame_len:
            frame.append((len(frame) * 41 + f) % 250)  # never 0xFF: no false sync
        out += frame
    if id3v1:
        out += b"TAG" + b"\x00" * 125
    return bytes(out)


def parse_mp3(b: bytes) -> dict:
    """STRICT whole-stream frame walk: skips one leading ID3v2 tag and
    one trailing ID3v1 tag, then requires the remainder to be a
    gapless sequence of complete Layer III frames sharing one
    version/layer/samplerate (bitrate and padding may vary per frame —
    VBR and 44.1 kHz padding cadence are legal). Returns
    {version, layer, bitrate_kbps (first frame), sample_rate, mode,
    channels, n_frames, n_samples, duration_ms, id3v2, id3v1}.
    Raises MP3Error on no sync, reserved indices, a truncated final
    frame, or inter-frame garbage — the quarantine contract."""
    b = bytes(b)
    i = 0
    has_id3v2 = False
    if b[:3] == b"ID3":
        if len(b) < 10:
            raise MP3Error("truncated ID3v2 header")
        size = (
            ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14)
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        )
        i = 10 + size
        if i > len(b):
            raise MP3Error("ID3v2 tag overflows stream")
        has_id3v2 = True
    def walk(start: int, end: int):
        j = start
        first = None
        n_frames = 0
        while j < end:
            if j + 4 > end:
                raise MP3Error(f"truncated frame header at {j}")
            if b[j] != 0xFF or (b[j + 1] & 0xE0) != 0xE0:
                raise MP3Error(f"lost frame sync at {j}")
            version_bits = (b[j + 1] >> 3) & 0x3
            layer_bits = (b[j + 1] >> 1) & 0x3
            if version_bits == 0b01:
                raise MP3Error("reserved MPEG version")
            if layer_bits != 0b01:
                raise MP3Error("not Layer III")
            mpeg2 = version_bits != 0b11
            br_idx = (b[j + 2] >> 4) & 0xF
            sr_idx = (b[j + 2] >> 2) & 0x3
            padding = (b[j + 2] >> 1) & 0x1
            mode = (b[j + 3] >> 6) & 0x3
            bitrate = (_BITRATES_V2_L3 if mpeg2 else _BITRATES_V1_L3)[br_idx]
            rate = (_RATES_V2 if mpeg2 else _RATES_V1)[sr_idx]
            if bitrate is None or rate is None:
                raise MP3Error("free/reserved bitrate or samplerate index")
            if first is None:
                first = (mpeg2, rate, bitrate, mode)
            elif (mpeg2, rate) != (first[0], first[1]):
                raise MP3Error("version/samplerate changed mid-stream")
            frame_len = (
                (72000 if mpeg2 else 144000) * bitrate
            ) // rate + padding
            if j + frame_len > end:
                raise MP3Error(f"truncated frame at {j}")
            j += frame_len
            n_frames += 1
        if first is None:
            raise MP3Error("no frames")
        return first, n_frames

    # prefer the no-trailer read: 'TAG' at end-128 is usually an ID3v1
    # trailer but can legally be the last frame's payload bytes — strip
    # it only when the gapless walk fails WITH the trailer in place
    has_tag = len(b) - i >= 128 and b[len(b) - 128 : len(b) - 125] == b"TAG"
    has_id3v1 = False
    try:
        first, n_frames = walk(i, len(b))
    except MP3Error:
        if not has_tag:
            raise
        first, n_frames = walk(i, len(b) - 128)
        has_id3v1 = True
    mpeg2, rate, bitrate, mode = first
    spf = 576 if mpeg2 else 1152
    n_samples = n_frames * spf
    return {
        "version": "MPEG2" if mpeg2 else "MPEG1",
        "layer": 3,
        "bitrate_kbps": bitrate,
        "sample_rate": rate,
        "mode": _MODES[mode],
        "channels": 1 if mode == 3 else 2,
        "n_frames": n_frames,
        "n_samples": n_samples,
        "duration_ms": (n_samples * 1000) // rate,
        "id3v2": has_id3v2,
        "id3v1": has_id3v1,
    }


# --------------------------------------------------------------------------
# FLAC frame codec — REAL sample decode (and the encoder as its vector
# generator), same tiering as the image legs: PNG/JPEG decode real
# pixels, this decodes real PCM. Scope: CONSTANT / VERBATIM / FIXED
# (orders 0-4) / LPC (orders 1-32) subframes, partitioned Rice
# residuals incl. the escape mode, wasted bits, all four channel
# assignments (independent, left/side, right/side, mid/side), CRC-8
# frame-header and CRC-16 frame checks (mismatch -> typed FLACError).
# Layout facts from RFC 9639 §9 (frame structure) and the libFLAC
# bit conventions (unary = N zero bits + one; Rice zigzag
# (v<<1)^(v>>63)).
# --------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        value &= (1 << bits) - 1
        self.cur = (self.cur << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.cur >> self.nbits) & 0xFF)
        self.cur &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then the terminating one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # bit position
        self.end = len(data) * 8

    def read(self, bits: int) -> int:
        if self.pos + bits > self.end:
            raise FLACError("bitstream truncated")
        out = 0
        p = self.pos
        d = self.data
        for _ in range(bits):
            out = (out << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        if bits and v >= (1 << (bits - 1)):
            v -= 1 << bits
        return v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.pos >= self.end:
                raise FLACError("bitstream truncated in unary")
            bit = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
            self.pos += 1
            if bit:
                return q
            q += 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style extended coded number (frame index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (1 + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_coded(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise FLACError("invalid coded number")
    n = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise FLACError("invalid coded-number continuation")
        n = (n << 6) | (c & 0x3F)
    return n


def _write_residual(bw: _BitWriter, resid: list[int], block: int, order: int) -> None:
    """One-partition Rice residual (method 0 when the parameter fits
    4 bits, method 1 otherwise; escape to raw when even rice2 can't
    hold it)."""
    n = len(resid)
    if n:
        total = sum(_zigzag(v) for v in resid)
        param = 0
        while (n << (param + 1)) < total and param < 30:
            param += 1
    else:
        param = 0
    method = 0 if param <= 14 else 1
    pbits = 4 if method == 0 else 5
    escape_code = 0xF if method == 0 else 0x1F
    bw.write(method, 2)
    bw.write(0, 4)  # partition order 0 -> one partition
    max_u = max((_zigzag(v) for v in resid), default=0)
    if param <= (30 if method else 14) and (max_u >> param) < (1 << 20):
        bw.write(param, pbits)
        for v in resid:
            u = _zigzag(v)
            bw.write_unary(u >> param)
            bw.write(u & ((1 << param) - 1), param)
    else:  # escape: raw residuals
        bw.write(escape_code, pbits)
        width = max(max((abs(v) for v in resid), default=0).bit_length() + 1, 1)
        bw.write(width, 5)
        for v in resid:
            bw.write(v & ((1 << width) - 1), width)


def _read_residual(br: _BitReader, block: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise FLACError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if block % nparts:
        raise FLACError("partition order does not divide block size")
    out: list[int] = []
    for j in range(nparts):
        cnt = (block >> porder) - (order if j == 0 else 0)
        if cnt < 0:
            raise FLACError("predictor order exceeds first partition")
        param = br.read(pbits)
        if param == escape:
            width = br.read(5)
            for _ in range(cnt):
                out.append(br.read_signed(width) if width else 0)
        else:
            for _ in range(cnt):
                q = br.read_unary()
                u = (q << param) | (br.read(param) if param else 0)
                out.append(_unzigzag(u))
    return out


def _predict(warm: list[int], resid: list[int], coefs: list[int], shift: int) -> list[int]:
    out = list(warm)
    for r in resid:
        pred = sum(c * out[-i - 1] for i, c in enumerate(coefs))
        out.append(r + (pred >> shift))
    return out


def encode_flac_pcm(
    samples,
    sample_rate: int,
    bits_per_sample: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "auto",
    subframe_type: str = "auto",
) -> bytes:
    """Encode PCM (numpy (n, ch) or list-of-lists int) as a REAL FLAC
    file: STREAMINFO + frames whose subframes pick
    CONSTANT / FIXED order 0-2 (best by residual magnitude, Rice
    partition-0) / VERBATIM per block and channel; 2-channel input
    additionally tries mid/side when ``stereo_mode='auto'`` ('ms'
    forces it, 'independent' disables). Channels whose samples share
    trailing zero bits emit the wasted-bits form. decode_flac_pcm must
    return bit-identical samples. ``subframe_type`` forces a shape for
    decoder coverage: 'verbatim', or 'lpc1' (true LPC header, order 1,
    coefficient 2 with shift 1 — the previous-sample predictor encoded
    through the quantized-LPC path)."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if not (1 <= ch <= 8):
        raise ValueError("1..8 channels")
    lo, hi = -(1 << (bits_per_sample - 1)), (1 << (bits_per_sample - 1)) - 1
    if n and (a.min() < lo or a.max() > hi):
        raise ValueError("sample out of range for bits_per_sample")

    out = bytearray(
        encode_flac(sample_rate, ch, bits_per_sample, n, frame_bytes=0)
    )

    def best_subframe(chan: list[int], bps: int):
        """(kind, payload-writer) minimizing a cheap size proxy."""
        if all(v == chan[0] for v in chan) and chan:
            return ("constant", None, None)
        best = ("verbatim", None, len(chan) * bps)
        for order in (0, 1, 2):
            if len(chan) <= order:
                continue
            coefs = _FIXED_COEFS[order]
            resid = [
                chan[i] - sum(c * chan[i - j - 1] for j, c in enumerate(coefs))
                for i in range(order, len(chan))
            ]
            cost = order * bps + sum(
                _zigzag(v).bit_length() + 2 for v in resid
            )
            if cost < best[2]:
                best = (("fixed", order), resid, cost)
        return (best[0], best[1], best[2]) if best[0] != "verbatim" else (
            "verbatim", None, None,
        )

    def write_subframe(bw: _BitWriter, chan: list[int], bps: int) -> None:
        # wasted bits: shared trailing zeros move into the header so
        # the payload codes fewer bits per sample
        wasted = 0
        if any(chan):
            wasted = min(
                (v & -v).bit_length() - 1 for v in chan if v
            )
            wasted = min(wasted, bps - 1)
        if wasted:
            chan = [v >> wasted for v in chan]
        eff = bps - wasted

        def header(stype: int) -> None:
            bw.write(0, 1)  # zero bit
            bw.write(stype, 6)
            if wasted:
                bw.write(1, 1)
                bw.write_unary(wasted - 1)
            else:
                bw.write(0, 1)

        if subframe_type == "verbatim":
            kind, resid = "verbatim", None
        elif subframe_type == "lpc1" and len(chan) > 1:
            header(0b100000)  # LPC, order 1
            bw.write(chan[0] & ((1 << eff) - 1), eff)  # warmup
            bw.write(3 - 1, 4)  # precision-1: 3-bit signed coefficients
            bw.write(1, 5)  # shift 1
            bw.write(2 & 0b111, 3)  # coef +2 -> pred = (2*prev) >> 1
            resid = [chan[i] - chan[i - 1] for i in range(1, len(chan))]
            _write_residual(bw, resid, len(chan), 1)
            return
        else:
            kind, resid, _ = best_subframe(chan, eff)
        if kind == "constant":
            header(0b000000)
            bw.write(chan[0] & ((1 << eff) - 1), eff)
            return
        if kind == "verbatim":
            header(0b000001)
            for v in chan:
                bw.write(v & ((1 << eff) - 1), eff)
            return
        _, order = kind
        header(0b001000 | order)
        for v in chan[:order]:
            bw.write(v & ((1 << eff) - 1), eff)
        _write_residual(bw, resid, len(chan), order)

    frame_idx = 0
    for start in range(0, max(n, 1), block_size):
        block = a[start : start + block_size]
        bn = len(block)
        if bn == 0:
            break
        chans = [list(map(int, block[:, c])) for c in range(ch)]
        assignment = ch - 1
        bps_per_chan = [bits_per_sample] * ch
        if ch == 2 and stereo_mode in ("auto", "ms") and bn:
            left, right = chans
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            side = [l - r for l, r in zip(left, right)]
            use_ms = stereo_mode == "ms" or (
                sum(_zigzag(v).bit_length() for v in side)
                < sum(_zigzag(v).bit_length() for v in right)
            )
            if use_ms:
                chans = [mid, side]
                assignment = 0b1010
                bps_per_chan = [bits_per_sample, bits_per_sample + 1]

        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking
        hdr.write(0b0111, 4)  # blocksize: 16-bit at end, value-1
        hdr.write(0b0000, 4)  # samplerate: from STREAMINFO
        hdr.write(assignment, 4)
        bps_code = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110, 32: 0b111}.get(
            bits_per_sample, 0b000
        )
        hdr.write(bps_code, 3)
        hdr.write(0, 1)  # reserved
        hdr.align()
        hdr_bytes = bytearray(hdr.bytes())
        hdr_bytes += _utf8_coded(frame_idx)
        hdr_bytes += (bn - 1).to_bytes(2, "big")
        hdr_bytes.append(_crc8(bytes(hdr_bytes)))

        body = _BitWriter()
        for c in range(len(chans)):
            write_subframe(body, chans[c], bps_per_chan[c])
        body.align()
        frame = bytes(hdr_bytes) + body.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        frame_idx += 1
    return bytes(out)


_FRAME_RATES = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_FRAME_BPS = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}


def decode_flac_pcm(b: bytes):
    """REAL FLAC sample decode: STREAMINFO + every frame —
    constant/verbatim/fixed 0-4/LPC 1-32 subframes, partitioned Rice
    (+escape), wasted bits, all stereo decorrelations, CRC-8/CRC-16
    verified. Returns (sample_rate, n_channels, samples) with samples
    a numpy int64 array of shape (n, ch). Raises FLACError on any
    malformation — the quarantine contract."""
    import numpy as np

    info = parse_flac(b)
    rate = info["sample_rate"]
    ch = info["channels"]
    bps = info["bits_per_sample"]
    total = info["total_samples"]

    # skip the metadata region parse_flac validated
    i = 4
    while True:
        hdr = b[i]
        blen = int.from_bytes(b[i + 1 : i + 4], "big")
        i += 4 + blen
        if hdr & 0x80:
            break

    # decode EVERY frame to the end of the stream — trailing bytes
    # that aren't frames, and frame totals disagreeing with STREAMINFO
    # in either direction, are malformations (strict contract)
    rows: list[list[int]] = []
    while i < len(b):
        frame_start = i
        br = _BitReader(b, i * 8)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise FLACError(f"lost frame sync at byte {i}")
        if br.read(1):
            raise FLACError("reserved frame-header bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        assignment = br.read(4)
        bps_code = br.read(3)
        if br.read(1):
            raise FLACError("reserved frame-header bit set")
        _read_utf8_coded(br)
        if bs_code == 0:
            raise FLACError("reserved blocksize code")
        elif bs_code == 1:
            bn = 192
        elif 2 <= bs_code <= 5:
            bn = 576 << (bs_code - 2)
        elif bs_code == 6:
            bn = br.read(8) + 1
        elif bs_code == 7:
            bn = br.read(16) + 1
        else:
            bn = 256 << (bs_code - 8)
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        elif sr_code == 0b1111:
            raise FLACError("invalid samplerate code")
        elif sr_code and sr_code not in _FRAME_RATES:
            raise FLACError("reserved samplerate code")
        # CRC-8 covers the header bytes up to here
        hdr_end = (br.pos + 7) >> 3
        if br.pos % 8:
            raise FLACError("frame header not byte-aligned")
        if _crc8(b[frame_start:hdr_end]) != br.read(8):
            raise FLACError("frame header CRC-8 mismatch")

        if assignment <= 0b0111:
            n_sub = assignment + 1
            sub_bps = [bps] * n_sub
        elif assignment in (0b1000, 0b1001, 0b1010):
            if ch != 2:
                raise FLACError("stereo decorrelation in non-stereo stream")
            n_sub = 2
            sub_bps = [bps, bps + 1] if assignment != 0b1001 else [bps + 1, bps]
        else:
            raise FLACError("reserved channel assignment")
        if assignment <= 0b0111 and n_sub != ch:
            raise FLACError("channel count mismatch")

        subframes: list[list[int]] = []
        for c in range(n_sub):
            if br.read(1):
                raise FLACError("subframe padding bit set")
            stype = br.read(6)
            wasted = 0
            if br.read(1):
                wasted = br.read_unary() + 1
            eff = sub_bps[c] - wasted
            if eff <= 0:
                raise FLACError("wasted bits exceed sample size")
            if stype == 0b000000:
                v = br.read_signed(eff)
                chan = [v] * bn
            elif stype == 0b000001:
                chan = [br.read_signed(eff) for _ in range(bn)]
            elif 0b001000 <= stype <= 0b001100:
                order = stype & 0x07
                if order > bn:
                    raise FLACError("fixed order exceeds block")
                warm = [br.read_signed(eff) for _ in range(order)]
                resid = _read_residual(br, bn, order)
                chan = _predict(warm, resid, _FIXED_COEFS[order], 0)
            elif stype >= 0b100000:
                order = (stype & 0x1F) + 1
                if order > bn:
                    raise FLACError("lpc order exceeds block")
                warm = [br.read_signed(eff) for _ in range(order)]
                prec = br.read(4)
                if prec == 0xF:
                    raise FLACError("invalid lpc precision")
                prec += 1
                shift = br.read_signed(5)
                if shift < 0:
                    raise FLACError("negative lpc shift")
                coefs = [br.read_signed(prec) for _ in range(order)]
                resid = _read_residual(br, bn, order)
                chan = _predict(warm, resid, coefs, shift)
            else:
                raise FLACError("reserved subframe type")
            if wasted:
                chan = [v << wasted for v in chan]
            subframes.append(chan)

        br.align()
        frame_end = br.pos >> 3
        if frame_end + 2 > len(b):
            raise FLACError("truncated frame CRC")
        if _crc16(b[frame_start:frame_end]) != int.from_bytes(
            b[frame_end : frame_end + 2], "big"
        ):
            raise FLACError("frame CRC-16 mismatch")
        i = frame_end + 2

        if assignment == 0b1000:  # left/side
            left, side = subframes
            subframes = [left, [l - s for l, s in zip(left, side)]]
        elif assignment == 0b1001:  # right/side (side first)
            side, right = subframes
            subframes = [[r + s for r, s in zip(right, side)], right]
        elif assignment == 0b1010:  # mid/side
            mid, side = subframes
            left = [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)]
            right = [(((m << 1) | (s & 1)) - s) >> 1 for m, s in zip(mid, side)]
            subframes = [left, right]
        rows.extend(map(list, zip(*subframes)))

    if total and len(rows) != total:
        raise FLACError(
            f"decoded {len(rows)} samples, STREAMINFO declared {total}"
        )
    return rate, ch, np.asarray(rows, dtype=np.int64).reshape(-1, ch)
