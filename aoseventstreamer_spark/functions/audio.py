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
    end = len(b)
    has_id3v1 = False
    if end - i >= 128 and b[end - 128 : end - 125] == b"TAG":
        end -= 128
        has_id3v1 = True
    first = None
    n_frames = 0
    while i < end:
        if i + 4 > end:
            raise MP3Error(f"truncated frame header at {i}")
        if b[i] != 0xFF or (b[i + 1] & 0xE0) != 0xE0:
            raise MP3Error(f"lost frame sync at {i}")
        version_bits = (b[i + 1] >> 3) & 0x3
        layer_bits = (b[i + 1] >> 1) & 0x3
        if version_bits == 0b01:
            raise MP3Error("reserved MPEG version")
        if layer_bits != 0b01:
            raise MP3Error("not Layer III")
        mpeg2 = version_bits != 0b11
        br_idx = (b[i + 2] >> 4) & 0xF
        sr_idx = (b[i + 2] >> 2) & 0x3
        padding = (b[i + 2] >> 1) & 0x1
        mode = (b[i + 3] >> 6) & 0x3
        bitrate = (_BITRATES_V2_L3 if mpeg2 else _BITRATES_V1_L3)[br_idx]
        rate = (_RATES_V2 if mpeg2 else _RATES_V1)[sr_idx]
        if bitrate is None or rate is None:
            raise MP3Error("free/reserved bitrate or samplerate index")
        if first is None:
            first = (mpeg2, rate, bitrate, mode)
        elif (mpeg2, rate) != (first[0], first[1]):
            raise MP3Error("version/samplerate changed mid-stream")
        frame_len = ((72000 if mpeg2 else 144000) * bitrate) // rate + padding
        if i + frame_len > end:
            raise MP3Error(f"truncated frame at {i}")
        i += frame_len
        n_frames += 1
    if first is None:
        raise MP3Error("no frames")
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
