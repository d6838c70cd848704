"""ISO-BMFF (MP4) box-tree encode/parse on plain bytes — no media libs.

Completes the video leg of the multimodal sniffing surface
(VERDICT r5 item 5): where the previous round stopped at an
mvhd/tkhd header sniff, this module walks the full ``moov`` tree —
``mvhd`` (presentation duration), per-track ``tkhd`` (geometry),
``mdia > mdhd`` (media timescale/duration/language), ``hdlr``
(handler), ``minf > stbl > stsd`` (codec fourcc; visual sample-entry
width/height; audio sample-rate/channels) — so video rows carry the
same metadata depth as the PNG/JPEG/GIF rows.

Layout facts used (ISO 14496-12 §8; all offsets are from the FullBox
body start, i.e. including the 4 version+flags bytes):

- ``tkhd`` v0: width/height at 76/88 for v1 — after version+flags(4),
  times/track/duration (20 v0 / 32 v1), reserved+layer+group+volume+
  reserved (16), matrix (36). The r5 sniffer read 84/96 (the total
  body sizes) — the ADVICE-flagged bug this module fixes.
- ``mvhd`` v0 body 100 / v1 112; timescale then duration after times.
- ``mdhd`` v0 body 24 / v1 36; language is 3 packed 5-bit letters.
- VisualSampleEntry: width/height at entry-body offsets 24/26.
- AudioSampleEntry: channelcount at 16, samplerate (16.16) at 24.

The parser is STRICT: malformed boxes (truncated header, size
overflowing the enclosure, size below the header length, timescale 0,
missing moov) raise the typed ``MP4Error`` so callers can quarantine
the blob; the tolerant screen-everything path (``sniff_header``)
catches it and degrades to mime-only. The in-module encoder is the
test-vector generator (the repo's codec discipline: build the encoder
first, roundtrip against it), emitting spec-conformant v0/v1 boxes
and optionally 64-bit largesize ``moov`` headers.
"""

from __future__ import annotations


class MP4Error(ValueError):
    """Malformed or truncated ISO-BMFF structure (quarantine signal)."""


def _be(b: bytes, i: int, n: int) -> int:
    return int.from_bytes(b[i : i + n], "big")


def _boxes(b: bytes, start: int, end: int):
    """Yield (fourcc, body_start, box_end); strict — raises MP4Error
    on truncated headers, largesize shorter than its header, or sizes
    overflowing the enclosure. Handles size==1 (64-bit largesize) and
    size==0 (box runs to the end of the enclosure)."""
    i = start
    while i < end:
        if i + 8 > end:
            raise MP4Error(f"truncated box header at offset {i}")
        size = _be(b, i, 4)
        fourcc = b[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > end:
                raise MP4Error(f"truncated largesize header at offset {i}")
            size = _be(b, i + 8, 8)
            body = i + 16
        elif size == 0:
            size = end - i
        if size < body - i or i + size > end:
            raise MP4Error(f"bad size {size} for box {fourcc!r} at offset {i}")
        yield fourcc, body, i + size
        i += size


def _find(b: bytes, start: int, end: int, fourcc: bytes):
    for fc, s, e in _boxes(b, start, end):
        if fc == fourcc:
            return s, e
    return None


def _fullbox_ver(b: bytes, s: int, e: int, name: str) -> int:
    if e - s < 4:
        raise MP4Error(f"truncated {name} fullbox")
    return b[s]


def _parse_mvhd(b: bytes, s: int, e: int) -> tuple[int, int]:
    """(timescale, duration) in movie-timescale units."""
    ver = _fullbox_ver(b, s, e, "mvhd")
    if ver == 1:
        if e - s < 32:
            raise MP4Error("truncated mvhd v1")
        ts, dur = _be(b, s + 20, 4), _be(b, s + 24, 8)
    else:
        if e - s < 24:
            raise MP4Error("truncated mvhd v0")
        ts, dur = _be(b, s + 12, 4), _be(b, s + 16, 4)
    if ts == 0:
        raise MP4Error("mvhd timescale is 0")
    return ts, dur


def _parse_tkhd(b: bytes, s: int, e: int) -> tuple[int, int, int]:
    """(track_id, width, height) — width/height are the integer part
    of the 16.16 fixed-point fields (audio tracks carry zeros)."""
    ver = _fullbox_ver(b, s, e, "tkhd")
    need = 96 if ver == 1 else 84  # full body incl. geometry
    if e - s < need:
        raise MP4Error(f"truncated tkhd v{ver}")
    track_id = _be(b, s + (20 if ver == 1 else 12), 4)
    off = s + (88 if ver == 1 else 76)  # after times+reserved+matrix
    return track_id, _be(b, off, 4) >> 16, _be(b, off + 4, 4) >> 16


def _parse_mdhd(b: bytes, s: int, e: int) -> tuple[int, int, str]:
    """(timescale, duration, language)."""
    ver = _fullbox_ver(b, s, e, "mdhd")
    if ver == 1:
        if e - s < 34:
            raise MP4Error("truncated mdhd v1")
        ts, dur, lang_off = _be(b, s + 20, 4), _be(b, s + 24, 8), s + 32
    else:
        if e - s < 22:
            raise MP4Error("truncated mdhd v0")
        ts, dur, lang_off = _be(b, s + 12, 4), _be(b, s + 16, 4), s + 20
    if ts == 0:
        raise MP4Error("mdhd timescale is 0")
    packed = _be(b, lang_off, 2)
    lang = bytes(
        0x60 + ((packed >> sh) & 0x1F) for sh in (10, 5, 0)
    ).decode("ascii", "replace")
    return ts, dur, lang


def _parse_stsd_entry(b: bytes, s: int, e: int, handler: str) -> dict:
    """First sample entry of an stsd: codec fourcc plus the
    handler-appropriate fields."""
    if e - s < 8:
        raise MP4Error("truncated stsd")
    n_entries = _be(b, s + 4, 4)
    if n_entries == 0:
        raise MP4Error("stsd declares 0 entries")
    entry = next(_boxes(b, s + 8, e), None)
    if entry is None:
        # declared entries but no entry bytes — a bare next() here
        # leaked StopIteration past the MP4Error quarantine catch
        raise MP4Error("stsd entry missing")
    fourcc, es, ee = entry
    out: dict = {"codec": fourcc.decode("ascii", "replace")}
    if handler == "vide":
        if ee - es < 28:
            raise MP4Error("truncated visual sample entry")
        out["width"] = _be(b, es + 24, 2)
        out["height"] = _be(b, es + 26, 2)
    elif handler == "soun":
        if ee - es < 28:
            raise MP4Error("truncated audio sample entry")
        out["channels"] = _be(b, es + 16, 2)
        out["sample_rate"] = _be(b, es + 24, 4) >> 16
    return out


def _parse_trak(b: bytes, s: int, e: int) -> dict:
    t: dict = {
        "track_id": None,
        "handler": None,
        "codec": None,
        "width": None,
        "height": None,
        "channels": None,
        "sample_rate": None,
        "duration_ms": None,
        "language": None,
    }
    for fc, s2, e2 in _boxes(b, s, e):
        if fc == b"tkhd":
            t["track_id"], w, h = _parse_tkhd(b, s2, e2)
            if w or h:
                t["width"], t["height"] = w, h
        elif fc == b"mdia":
            hdlr = _find(b, s2, e2, b"hdlr")
            if hdlr:
                hs, he = hdlr
                if he - hs < 12:
                    raise MP4Error("truncated hdlr")
                t["handler"] = b[hs + 8 : hs + 12].decode("ascii", "replace")
            mdhd = _find(b, s2, e2, b"mdhd")
            if mdhd:
                ts, dur, lang = _parse_mdhd(b, *mdhd)
                t["duration_ms"] = dur * 1000 // ts
                t["language"] = lang
            minf = _find(b, s2, e2, b"minf")
            if minf:
                stbl = _find(b, *minf, b"stbl")
                if stbl:
                    stsd = _find(b, *stbl, b"stsd")
                    if stsd:
                        t.update(
                            _parse_stsd_entry(b, *stsd, t["handler"] or "")
                        )
    return t


def parse_mp4(b: bytes) -> dict:
    """Full moov walk → {brand, timescale, duration_ms, tracks:[...]}.

    Raises MP4Error on any malformed box so ingest can quarantine; a
    file with a valid box tree but missing optional leaves gets None
    in the corresponding fields instead."""
    b = bytes(b)
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise MP4Error("not an ISO-BMFF file (no ftyp)")
    out: dict = {"brand": None, "timescale": None, "duration_ms": None, "tracks": []}
    moov = None
    for fc, s, e in _boxes(b, 0, len(b)):
        if fc == b"ftyp":
            if e - s < 8:
                raise MP4Error("truncated ftyp")
            out["brand"] = b[s : s + 4].decode("ascii", "replace")
        elif fc == b"moov":
            moov = (s, e)
    if moov is None:
        raise MP4Error("no moov box")
    for fc, s, e in _boxes(b, *moov):
        if fc == b"mvhd":
            ts, dur = _parse_mvhd(b, s, e)
            out["timescale"] = ts
            out["duration_ms"] = dur * 1000 // ts
        elif fc == b"trak":
            out["tracks"].append(_parse_trak(b, s, e))
    return out


# ---------------------------------------------------------------------------
# Encoder — the test-vector generator (spec-conformant layouts).
# ---------------------------------------------------------------------------

_MATRIX = (
    (0x00010000).to_bytes(4, "big")
    + b"\x00" * 12
    + (0x00010000).to_bytes(4, "big")
    + b"\x00" * 12
    + (0x40000000).to_bytes(4, "big")
)


def _box(fourcc: bytes, body: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return (1).to_bytes(4, "big") + fourcc + (len(body) + 16).to_bytes(8, "big") + body
    return (len(body) + 8).to_bytes(4, "big") + fourcc + body


def _mvhd(timescale: int, duration: int, v1: bool) -> bytes:
    tail = (
        (0x00010000).to_bytes(4, "big")  # rate 1.0
        + (0x0100).to_bytes(2, "big")  # volume 1.0
        + b"\x00" * 10  # reserved(2) + reserved(8)
        + _MATRIX
        + b"\x00" * 24  # pre_defined
        + (3).to_bytes(4, "big")  # next_track_ID
    )
    if v1:
        body = bytes([1, 0, 0, 0]) + b"\x00" * 16 + timescale.to_bytes(4, "big") \
            + duration.to_bytes(8, "big") + tail
    else:
        body = bytes([0, 0, 0, 0]) + b"\x00" * 8 + timescale.to_bytes(4, "big") \
            + duration.to_bytes(4, "big") + tail
    return _box(b"mvhd", body)


def _tkhd(track_id: int, width: int, height: int, duration: int, v1: bool) -> bytes:
    mid = (
        b"\x00" * 8  # reserved
        + b"\x00\x00"  # layer
        + b"\x00\x00"  # alternate_group
        + (0x0100 if width == 0 else 0).to_bytes(2, "big")  # volume (audio)
        + b"\x00\x00"  # reserved
        + _MATRIX
    )
    geom = (width << 16).to_bytes(4, "big") + (height << 16).to_bytes(4, "big")
    if v1:
        body = bytes([1, 0, 0, 7]) + b"\x00" * 16 + track_id.to_bytes(4, "big") \
            + b"\x00" * 4 + duration.to_bytes(8, "big") + mid + geom
    else:
        body = bytes([0, 0, 0, 7]) + b"\x00" * 8 + track_id.to_bytes(4, "big") \
            + b"\x00" * 4 + duration.to_bytes(4, "big") + mid + geom
    return _box(b"tkhd", body)


def _pack_lang(lang: str) -> int:
    a, b_, c = (ord(ch) - 0x60 for ch in lang)
    return (a << 10) | (b_ << 5) | c


def _mdhd(timescale: int, duration: int, lang: str, v1: bool) -> bytes:
    lt = _pack_lang(lang).to_bytes(2, "big") + b"\x00\x00"
    if v1:
        body = bytes([1, 0, 0, 0]) + b"\x00" * 16 + timescale.to_bytes(4, "big") \
            + duration.to_bytes(8, "big") + lt
    else:
        body = bytes([0, 0, 0, 0]) + b"\x00" * 8 + timescale.to_bytes(4, "big") \
            + duration.to_bytes(4, "big") + lt
    return _box(b"mdhd", body)


def _hdlr(handler: bytes) -> bytes:
    return _box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12 + b"\x00")


def _visual_entry(codec: bytes, width: int, height: int) -> bytes:
    body = (
        b"\x00" * 6
        + (1).to_bytes(2, "big")  # data_reference_index
        + b"\x00" * 16  # pre_defined/reserved/pre_defined
        + width.to_bytes(2, "big")
        + height.to_bytes(2, "big")
        + (0x00480000).to_bytes(4, "big")  # horizresolution 72 dpi
        + (0x00480000).to_bytes(4, "big")
        + b"\x00" * 4  # reserved
        + (1).to_bytes(2, "big")  # frame_count
        + b"\x00" * 32  # compressorname
        + (0x0018).to_bytes(2, "big")  # depth
        + (0xFFFF).to_bytes(2, "big")  # pre_defined
    )
    return _box(codec, body)


def _audio_entry(codec: bytes, sample_rate: int, channels: int) -> bytes:
    body = (
        b"\x00" * 6
        + (1).to_bytes(2, "big")  # data_reference_index
        + b"\x00" * 8  # version/revision/vendor
        + channels.to_bytes(2, "big")
        + (16).to_bytes(2, "big")  # samplesize
        + b"\x00" * 4  # pre_defined + reserved
        + (sample_rate << 16).to_bytes(4, "big")
    )
    return _box(codec, body)


def _stsd(entry: bytes) -> bytes:
    return _box(b"stsd", bytes([0, 0, 0, 0]) + (1).to_bytes(4, "big") + entry)


def _trak(
    track_id: int,
    duration: int,
    mdhd_ts: int,
    mdhd_dur: int,
    lang: str,
    handler: bytes,
    entry: bytes,
    width: int,
    height: int,
    v1: bool,
) -> bytes:
    stbl = _box(b"stbl", _stsd(entry))
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", _mdhd(mdhd_ts, mdhd_dur, lang, v1) + _hdlr(handler) + minf)
    return _box(b"trak", _tkhd(track_id, width, height, duration, v1) + mdia)


def encode_mp4(
    width: int,
    height: int,
    duration_ms: int,
    video_codec: bytes = b"avc1",
    audio_codec: bytes | None = b"mp4a",
    sample_rate: int = 48000,
    channels: int = 2,
    lang: str = "und",
    v1: bool = False,
    largesize_moov: bool = False,
    brand: bytes = b"isom",
) -> bytes:
    """Minimal spec-conformant MP4: ftyp + moov(mvhd + video trak
    [+ audio trak]), movie timescale 1000 so mvhd duration IS
    milliseconds. No mdat — this is a metadata fixture generator."""
    ts = 1000
    dur = duration_ms
    ftyp = _box(b"ftyp", brand + (0x200).to_bytes(4, "big") + b"isomiso2mp41")
    video = _trak(
        1, dur, 30000, dur * 30, lang, b"vide",
        _visual_entry(video_codec, width, height), width, height, v1,
    )
    kids = _mvhd(ts, dur, v1) + video
    if audio_codec is not None:
        kids += _trak(
            2, dur, sample_rate, duration_ms * sample_rate // 1000, lang,
            b"soun", _audio_entry(audio_codec, sample_rate, channels), 0, 0, v1,
        )
    return ftyp + _box(b"moov", kids, largesize=largesize_moov)


# ---------------------------------------------------------------------------
# Sample tables (stbl leaves): locate actual media bytes inside mdat.
# Round 8 — closes the "MP4 real-frame sampling" gap (VERDICT r7 item
# 4): stsc/stsz/stco/stss walk so MJPEG-in-MP4 tracks yield REAL JPEG
# keyframes, matching the AVI leg. Inter-frame codecs stay documented
# skips (RESULTS.md) — their samples are located but not decoded.
# ---------------------------------------------------------------------------


def _parse_stsz(b: bytes, s: int, e: int) -> list[int]:
    if e - s < 12:
        raise MP4Error("truncated stsz")
    uniform = _be(b, s + 4, 4)
    count = _be(b, s + 8, 4)
    if uniform:
        return [uniform] * count
    if e - s < 12 + 4 * count:
        raise MP4Error("stsz table shorter than declared count")
    return [_be(b, s + 12 + 4 * i, 4) for i in range(count)]


def _parse_stsc(b: bytes, s: int, e: int) -> list[tuple[int, int]]:
    """[(first_chunk, samples_per_chunk)] runs, 1-based first_chunk."""
    if e - s < 8:
        raise MP4Error("truncated stsc")
    count = _be(b, s + 4, 4)
    if e - s < 8 + 12 * count:
        raise MP4Error("stsc table shorter than declared count")
    runs = []
    for i in range(count):
        o = s + 8 + 12 * i
        runs.append((_be(b, o, 4), _be(b, o + 4, 4)))
    if not runs or runs[0][0] != 1:
        raise MP4Error("stsc must start at chunk 1")
    return runs


def _parse_stco(b: bytes, s: int, e: int, wide: bool) -> list[int]:
    if e - s < 8:
        raise MP4Error("truncated stco/co64")
    count = _be(b, s + 4, 4)
    step = 8 if wide else 4
    if e - s < 8 + step * count:
        raise MP4Error("chunk-offset table shorter than declared count")
    return [_be(b, s + 8 + step * i, step) for i in range(count)]


def _parse_stss(b: bytes, s: int, e: int) -> set[int]:
    """1-based sync sample numbers."""
    if e - s < 8:
        raise MP4Error("truncated stss")
    count = _be(b, s + 4, 4)
    if e - s < 8 + 4 * count:
        raise MP4Error("stss table shorter than declared count")
    return {_be(b, s + 8 + 4 * i, 4) for i in range(count)}


def parse_mp4_samples(b: bytes) -> dict:
    """Sample-table walk for the FIRST video track: expand
    stsc runs over the stco chunk offsets, lay the stsz sizes
    sequentially within each chunk, and mark sync samples (stss;
    absent = every sample is sync, per spec). Returns
    {codec, width, height, n_samples, samples: [(offset, size,
    is_sync)]} with every byte range validated against the file
    bounds — a table pointing outside the blob is a quarantine
    (MP4Error), not a silent bad slice."""
    b = bytes(b)
    meta = parse_mp4(b)  # strict box-tree validation first
    # locate the stbl of the first vide trak (re-walk; parse_mp4
    # keeps its public shape)
    moov = None
    for fc, s, e in _boxes(b, 0, len(b)):
        if fc == b"moov":
            moov = (s, e)
    if moov is None:  # parse_mp4 already guarantees this; belt+braces
        raise MP4Error("no moov box")
    for fc, s, e in _boxes(b, *moov):
        if fc != b"trak":
            continue
        mdia = _find(b, s, e, b"mdia")
        if not mdia:
            continue
        hdlr = _find(b, *mdia, b"hdlr")
        if not hdlr or b[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _find(b, *mdia, b"minf")
        stbl = _find(b, *minf, b"stbl") if minf else None
        if not stbl:
            continue
        stsz = _find(b, *stbl, b"stsz")
        stsc = _find(b, *stbl, b"stsc")
        stco = _find(b, *stbl, b"stco")
        co64 = _find(b, *stbl, b"co64")
        if not (stsz and stsc and (stco or co64)):
            raise MP4Error("video stbl missing stsz/stsc/stco")
        sizes = _parse_stsz(b, *stsz)
        runs = _parse_stsc(b, *stsc)
        offsets = (
            _parse_stco(b, *co64, True)
            if co64
            else _parse_stco(b, *stco, False)
        )
        stss = _find(b, *stbl, b"stss")
        sync = _parse_stss(b, *stss) if stss else None
        samples: list[tuple[int, int, bool]] = []
        run_idx = 0
        for chunk_no in range(1, len(offsets) + 1):
            while (
                run_idx + 1 < len(runs)
                and runs[run_idx + 1][0] <= chunk_no
            ):
                run_idx += 1
            spc = runs[run_idx][1]
            pos = offsets[chunk_no - 1]
            for _ in range(spc):
                if len(samples) >= len(sizes):
                    break
                size = sizes[len(samples)]
                if pos + size > len(b):
                    raise MP4Error("sample range beyond file end")
                num = len(samples) + 1  # 1-based
                samples.append(
                    (pos, size, True if sync is None else num in sync)
                )
                pos += size
        if len(samples) != len(sizes):
            raise MP4Error(
                f"chunk layout yields {len(samples)} samples, "
                f"stsz declares {len(sizes)}"
            )
        vid = next(
            (t for t in meta["tracks"] if t.get("handler") == "vide"), {}
        )
        return {
            "codec": vid.get("codec"),
            "width": vid.get("width"),
            "height": vid.get("height"),
            "n_samples": len(samples),
            "samples": samples,
        }
    raise MP4Error("no video track with a sample table")


def _full(fourcc: bytes, body: bytes) -> bytes:
    return _box(fourcc, bytes(4) + body)


def encode_mp4_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 25,
    samples_per_chunk: int = 2,
    sync_every: int = 1,
    brand: bytes = b"isom",
) -> bytes:
    """MJPEG-in-MP4 vector generator: ftyp + mdat(concatenated JPEG
    blobs) + moov whose video trak carries a FULL sample table —
    stts (uniform delta), stsc (chunk runs, including the short final
    chunk), stsz (per-sample sizes), stco (absolute chunk offsets into
    mdat), and stss marking every ``sync_every``-th sample.
    parse_mp4_samples must recover exactly these byte ranges; the
    'jpeg' sample-entry fourcc is the QuickTime/ISO registration for
    Motion-JPEG."""
    n = len(frames)
    if n == 0:
        raise MP4Error("encode_mp4_mjpeg needs at least one frame")
    ftyp = _box(b"ftyp", brand + (0x200).to_bytes(4, "big") + b"isomiso2mp41")
    mdat_body = b"".join(frames)
    # sample offsets are absolute file offsets into mdat's body
    base = len(ftyp) + 8
    sizes = [len(f) for f in frames]
    offs, pos = [], base
    for sz in sizes:
        offs.append(pos)
        pos += sz
    # chunks of samples_per_chunk (last may be short)
    spc = max(1, samples_per_chunk)
    chunk_offs = [offs[i] for i in range(0, n, spc)]
    n_chunks = len(chunk_offs)
    last = n - (n_chunks - 1) * spc
    runs = [(1, spc)]
    if last != spc and n_chunks > 1:
        runs.append((n_chunks, last))
    stts = _full(b"stts", (1).to_bytes(4, "big")
                 + n.to_bytes(4, "big") + (1).to_bytes(4, "big"))
    stsc = _full(
        b"stsc",
        len(runs).to_bytes(4, "big")
        + b"".join(
            fc.to_bytes(4, "big") + c.to_bytes(4, "big")
            + (1).to_bytes(4, "big")
            for fc, c in runs
        ),
    )
    stsz = _full(
        b"stsz",
        (0).to_bytes(4, "big") + n.to_bytes(4, "big")
        + b"".join(sz.to_bytes(4, "big") for sz in sizes),
    )
    stco = _full(
        b"stco",
        n_chunks.to_bytes(4, "big")
        + b"".join(o.to_bytes(4, "big") for o in chunk_offs),
    )
    se = max(1, sync_every)
    syncs = list(range(1, n + 1, se))
    stss = _full(
        b"stss",
        len(syncs).to_bytes(4, "big")
        + b"".join(sn.to_bytes(4, "big") for sn in syncs),
    )
    stbl = _box(
        b"stbl",
        _stsd(_visual_entry(b"jpeg", width, height))
        + stts + stsc + stsz + stco + stss,
    )
    minf = _box(b"minf", stbl)
    dur_ms = n * 1000 // fps
    mdia = _box(
        b"mdia", _mdhd(fps, n, "und", False) + _hdlr(b"vide") + minf
    )
    trak = _box(
        b"trak", _tkhd(1, width, height, dur_ms, False) + mdia
    )
    moov = _box(b"moov", _mvhd(1000, dur_ms, False) + trak)
    return ftyp + _box(b"mdat", mdat_body) + moov
