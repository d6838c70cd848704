"""AVI (RIFF) container with MJPEG video — real FRAME DECODE for the
video leg, no media libs.

MP4 (functions/mp4.py) gave video rows full container METADATA; this
module closes the remaining gap to the image/audio legs — actual
pixels — through the one video coding the repo can genuinely decode:
Motion-JPEG, where every frame is a complete baseline JPEG and
functions/jpeg.py already does the entropy decode. (Inter-frame codecs
— H.264 et al. — are out of scope for the same reason arithmetic JPEG
and MP3 sample decode are: hundreds of spec tables with no
in-container conformance vectors; RESULTS.md records the rationale.)

Layout facts (public RIFF/AVI spec, 'AVI ' form):

- ``RIFF('AVI ')`` → ``LIST('hdrl')`` with ``avih`` (56-byte main
  header: usec/frame, total frames, width, height, stream count) and
  one ``LIST('strl')`` per stream (``strh`` fccType/handler/scale/rate
  /length + ``strf`` = BITMAPINFOHEADER for video); then
  ``LIST('movi')`` whose ``00dc`` chunks are the compressed frames
  (word-aligned); optional ``idx1`` index.

The parser is STRICT (typed ``AVIError``): truncated/overflowing
chunks, a missing avih/movi, zero streams, or a frame count
disagreeing with the actual ``00dc`` chunks quarantine the blob. The
in-module encoder is the vector generator (the repo's codec
discipline), emitting spec-shaped headers around real encode_jpeg
frames.
"""

from __future__ import annotations

import struct


class AVIError(ValueError):
    """Malformed or truncated AVI structure (quarantine signal)."""


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    usec_per_frame: int = 40000,
) -> bytes:
    """Wrap complete JPEG blobs as an MJPEG AVI: RIFF/hdrl(avih +
    strl(strh vids/MJPG + strf BITMAPINFOHEADER))/movi(00dc...) +
    idx1. parse_avi must recover exactly these parameters and frame
    byte ranges."""
    n = len(frames)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        usec_per_frame,      # dwMicroSecPerFrame
        max_bytes * 25,      # dwMaxBytesPerSec (advisory)
        0,                   # dwPaddingGranularity
        0x10,                # dwFlags: AVIF_HASINDEX
        n,                   # dwTotalFrames
        0,                   # dwInitialFrames
        1,                   # dwStreams
        max_bytes,           # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,          # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<10I4H",
            0,                   # dwFlags
            0,                   # wPriority+wLanguage packed (0)
            0,                   # dwInitialFrames
            usec_per_frame,      # dwScale
            1_000_000,           # dwRate  (rate/scale = fps)
            0,                   # dwStart
            n,                   # dwLength (frames)
            max_bytes,           # dwSuggestedBufferSize
            0xFFFFFFFF,          # dwQuality (-1 default)
            0,                   # dwSampleSize (0 = varies)
            0, 0, width & 0xFFFF, height & 0xFFFF,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",      # BITMAPINFOHEADER, 40 bytes
        40, width, height, 1, 24,
        0x47504A4D,          # biCompression 'MJPG' (LE)
        max(width * height * 3, 1),
        0, 0, 0, 0,
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<3I", 0x10, off, len(frames[i]))
            for i, off in enumerate(offsets)
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(b: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_len); strict bounds."""
    i = start
    while i < end:
        if i + 8 > end:
            raise AVIError(f"truncated chunk header at {i}")
        fourcc = b[i : i + 4]
        (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
        body = i + 8
        if body + clen > end:
            raise AVIError(f"chunk {fourcc!r} overflows enclosure at {i}")
        yield fourcc, body, clen
        i = body + clen + (clen % 2)


def parse_avi(b: bytes) -> dict:
    """STRICT MJPEG-AVI parse: returns {width, height, n_frames,
    usec_per_frame, duration_ms, handler, frames: [(offset, length)]}
    with frames pointing at the raw JPEG bytes inside the blob.
    Raises AVIError on structural garbage, a non-video first stream,
    or an avih frame count disagreeing with the movi chunks."""
    b = bytes(b)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise AVIError("not a RIFF/AVI blob")
    (rlen,) = struct.unpack("<I", b[4:8])
    end = 8 + rlen
    if end > len(b):
        raise AVIError("RIFF size overflows blob")
    avih = None
    strh = None
    frames: list[tuple[int, int]] = []
    for fourcc, body, clen in _walk(b, 12, end):
        if fourcc != b"LIST":
            continue
        ltype = b[body : body + 4]
        if ltype == b"hdrl":
            for f2, b2, l2 in _walk(b, body + 4, body + clen):
                if f2 == b"avih":
                    if l2 < 56:
                        raise AVIError("avih too short")
                    avih = struct.unpack("<14I", b[b2 : b2 + 56])
                elif f2 == b"LIST" and b[b2 : b2 + 4] == b"strl" and strh is None:
                    for f3, b3, l3 in _walk(b, b2 + 4, b2 + l2):
                        if f3 == b"strh":
                            if l3 < 48:
                                raise AVIError("strh too short")
                            strh = (b[b3 : b3 + 4], b[b3 + 4 : b3 + 8])
        elif ltype == b"movi":
            for f2, b2, l2 in _walk(b, body + 4, body + clen):
                if f2[2:4] in (b"dc", b"db"):
                    frames.append((b2, l2))
    if avih is None:
        raise AVIError("missing avih header")
    if strh is None:
        raise AVIError("missing stream header")
    if strh[0] != b"vids":
        raise AVIError(f"first stream is not video: {strh[0]!r}")
    usec, _, _, _, n_total, _, n_streams, _, width, height = avih[:10]
    if n_streams < 1:
        raise AVIError("zero streams declared")
    if n_total != len(frames):
        raise AVIError(
            f"avih declares {n_total} frames, movi carries {len(frames)}"
        )
    if usec == 0:
        raise AVIError("zero frame interval")
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "usec_per_frame": usec,
        "duration_ms": (len(frames) * usec) // 1000,
        "handler": strh[1].decode("ascii", "replace"),
        "frames": frames,
    }


def decode_avi_frames(b: bytes, indices: list[int] | None = None):
    """Decode selected MJPEG frames to pixel arrays (functions/jpeg.py
    does the entropy decode — REAL pixels, the video analog of the PNG
    path). ``indices=None`` decodes every frame. Raises AVIError for
    container problems; a frame whose JPEG payload is malformed raises
    the jpeg layer's typed error (callers quarantine either way)."""
    from .jpeg import decode_jpeg

    meta = parse_avi(b)
    picks = range(meta["n_frames"]) if indices is None else indices
    out = []
    for i in picks:
        if not (0 <= i < meta["n_frames"]):
            raise AVIError(f"frame index {i} out of range")
        off, ln = meta["frames"][i]
        out.append((i, decode_jpeg(b[off : off + ln])))
    return meta, out
