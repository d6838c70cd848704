"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas
iterators (``mapInPandas``).

Pixel handling is tiered by what plain stdlib + numpy can do:

- **REAL**: header sniffing for PNG/JPEG/GIF/WAV (sniff_header), and
  complete decode → resample → re-encode pipelines for PNG at EVERY
  standard profile (functions/png.py — depths 1/2/4/8/16, palette,
  Adam7 interlace, all five row filters), baseline/extended-
  sequential AND progressive Huffman JPEGs (functions/jpeg.py —
  DQT/DHT/DRI/RSTn, any chroma subsampling on decode, 4:4:4 Annex-K
  encode; SOF2 multi-scan decode incl. full successive
  approximation), AND GIF87a/89a (functions/gif.py — full 12-bit LZW
  both directions, interlace, local/global palettes; re-encode
  quantizes to RGB 3-3-2 when the resample exceeds 256 colors, lossy
  by format not implementation), INCLUDING animated-GIF frame
  extraction (disposal methods + transparency composited to the
  logical screen — sample_frames emits real frames for GIFs). No
  media libraries involved.
- **STUB** (clearly marked, fallback only): pixel access for
  arithmetic-coded JPEG — the one profile left (patent-era QM
  coding, vanishingly rare in crawls; 12-bit Huffman SOF1 decodes
  for real since r6). A production deployment swaps
  that branch for PIL/ffmpeg; schemas, batch iteration, partition
  behavior, and UDF signatures are identical either way.

At 100 TB: binary payloads never pass through the driver; Arrow moves
each partition's batches to Python once; per-batch output rows can
exceed or shrink input rows (frame sampling), which is why these are
``mapInPandas`` and not scalar pandas_udfs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("mime", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
        ])),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def _stub_decode_image(payload: bytes) -> list[float]:
    """STUB decode: a real pipeline calls PIL/torchvision here.
    Deterministic fake: 8 byte-histogram buckets normalized to [0,1]."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("real image decode requires PIL — stubbed")
    import numpy as np

    # vectorized byte histogram (guide §4.2): np.bincount over the
    # shifted byte view replaces a per-byte Python loop; bucket counts
    # are exact ints either way and the final division is the same
    # IEEE double op, so the output is bit-identical
    counts = np.bincount(
        np.frombuffer(payload, dtype=np.uint8) >> 5, minlength=8
    )
    n = len(payload)
    return [int(c) / n for c in counts]


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Spread codec work across the cluster when the scan under-splits.

    Every wrap_as_* payload builder feeds a Python codec kernel
    (mapInPandas); on an under-split scan the ENTIRE encode+decode
    pipeline would otherwise run on one core (measured: q_video_frames
    61 s single-task at sf0.1). Keyed spread (no round-robin pre-sort);
    no-op on well-split inputs, so the scale path is unchanged."""
    from ..session import ensure_parallelism

    return ensure_parallelism(df, key=id_col)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from any source table by treating encoded
    text as the opaque payload — the schema/partitioning stand-in the
    real ingest (S3 blobs) would produce."""
    df = _spread(df, id_col)
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Non-interlaced 8-bit PNG payloads get REAL pixel features (8-bucket
    histogram over decoded pixel values — stdlib zlib decode,
    functions/png.py); anything else falls back to the byte-histogram
    STUB with the same shape contract (len 8, sums to 1), so downstream
    consumers never see a schema difference. The closure imports the
    codec lazily inside the worker and degrades to the stub if the
    package isn't importable there, so the operator works no matter
    what directory the driver process was launched from.
    """
    import hashlib

    def safe_feat(p, decode_png):
        # one undecodable row must not kill a distributed job: null
        # feature instead (the curation filter downstream drops it).
        if p is None or len(p) == 0:
            return None
        data = p
        if decode_png is not None and bytes(p[:8]) == b"\x89PNG\r\n\x1a\n":
            try:
                data = decode_png(bytes(p)).tobytes()  # REAL pixels
            except ValueError:
                pass  # undecodable PNG profile: byte-level stub
        import numpy as np

        # vectorized byte histogram (guide §4.2) — bit-identical to the
        # per-byte loop it replaces: exact int counts, same IEEE division
        counts = np.bincount(
            np.frombuffer(data, dtype=np.uint8) >> 5, minlength=8
        )
        return [int(c) / len(data) for c in counts]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from aoseventstreamer_spark.functions.png import decode_png
        except ImportError:
            decode_png = None
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(
                        lambda p: len(p) if p is not None else 0
                    ).astype("int64"),
                    "checksum": payloads.map(
                        lambda p: hashlib.md5(p).hexdigest() if p else None
                    ),
                    "feat": payloads.map(lambda p: safe_feat(p, decode_png)),
                }
            )
            yield out

    return media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 4096, max_frames: int = 4) -> DataFrame:
    """Frame-sampling shape: one input row → up to max_frames output
    rows (why this is mapInPandas, not a scalar UDF).

    For GIF payloads the frames are REAL: the animation is decoded
    frame by frame (functions/gif.py — disposal methods and
    transparency composited onto the logical screen, stopping after
    max_frames) and each composited frame re-encodes as a standalone
    single-frame GIF. For MJPEG AVI payloads the frames are REAL too:
    each sampled frame is the standalone JPEG the 00dc chunk carries
    (functions/avi.py — no re-encode needed, MJPEG frames ARE
    keyframes). For MP4 payloads whose video track is MJPEG ('jpeg'
    sample entry), the frames are REAL as well: the stbl sample-table
    walk (functions/mp4.parse_mp4_samples — stsc/stsz/stco/stss)
    locates the sync samples and each emitted frame is the standalone
    JPEG those byte ranges carry. Everything else — including MP4
    tracks in inter-frame codecs (avc1/hev1, the documented skip) —
    keeps the byte-slice stand-in for an ffmpeg keyframe extraction:
    same schema, same fan-out contract, so the registered
    q_multimodal_frames oracle (text payloads, never GIF/AVI/MP4) is
    untouched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from aoseventstreamer_spark.functions import gif as GIF
        except ImportError:
            GIF = None
        from aoseventstreamer_spark.functions import avi as AVI

        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue  # nothing to sample; don't kill the task
                raw = bytes(payload)
                if GIF is not None and raw[:4] == b"GIF8":
                    try:
                        frames = GIF.decode_gif_frames(raw, max_frames=max_frames)
                        for i, fr in enumerate(frames):
                            ids.append(mid)
                            idxs.append(i)
                            payloads.append(GIF.encode_gif(fr))
                        continue
                    except GIF.GIFError:
                        pass  # corrupt GIF: byte-slice fallback below
                if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
                    try:
                        meta = AVI.parse_avi(raw)
                        # evenly spaced keyframes up to max_frames
                        n = meta["n_frames"]
                        step = max(1, n // max_frames) if n else 1
                        picks = list(range(0, n, step))[:max_frames]
                        for j, i in enumerate(picks):
                            off, ln = meta["frames"][i]
                            ids.append(mid)
                            idxs.append(j)
                            payloads.append(raw[off : off + ln])
                        continue
                    except AVI.AVIError:
                        pass  # corrupt AVI: byte-slice fallback below
                if len(raw) >= 12 and raw[4:8] == b"ftyp":
                    try:
                        from aoseventstreamer_spark.functions.mp4 import (
                            MP4Error,
                            parse_mp4_samples,
                        )

                        m = parse_mp4_samples(raw)
                        if m["codec"] == "jpeg":
                            # real keyframes: evenly spaced SYNC samples
                            syncs = [
                                (off, sz)
                                for off, sz, sync in m["samples"]
                                if sync
                            ]
                            n = len(syncs)
                            step = max(1, n // max_frames) if n else 1
                            picks = list(range(0, n, step))[:max_frames]
                            for j, i in enumerate(picks):
                                off, ln = syncs[i]
                                ids.append(mid)
                                idxs.append(j)
                                payloads.append(raw[off : off + ln])
                            continue
                        # inter-frame codec: documented skip -> stand-in
                    except MP4Error:
                        pass  # corrupt MP4: byte-slice fallback below
                n = min(max_frames, max(1, len(raw) // every_n_bytes))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(raw[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# REAL (non-stub) header sniffing — pure byte parsing, no media libs.
# ---------------------------------------------------------------------------

SNIFF_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def sniff_header(payload: bytes):
    """Parse container headers with plain byte arithmetic (this is NOT
    a stub — it is how real ingest pipelines type and size-screen
    blobs before spending a decode):

    - PNG:  IHDR width/height (big-endian at offsets 16/20)
    - JPEG: first SOF0/SOF2 marker's height/width
    - GIF:  logical screen width/height (little-endian at 6/8)
    - WAV:  duration from data-chunk size / byte rate
    - MP4 (ISO BMFF): duration from moov>mvhd (timescale-normalized,
      v0 and v1 boxes), width/height from the first video trak's
      tkhd 16.16 fixed-point fields — the video-modality container

    Returns (mime, width, height, duration_ms); unknown containers
    return (None, None, None, None) rather than failing the task.
    """
    # 4 bytes is enough to dispatch on any magic here; every branch
    # guards its own deeper offsets (a 9-byte truncated FLAC still
    # types as audio/flac, mime-only)
    if not payload or len(payload) < 4:
        return (None, None, None, None)
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return ("image/png", w, h, None)
    if b[:2] == b"\xff\xd8":  # JPEG: walk the marker stream
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            # the spec allows any number of 0xFF fill bytes before a
            # marker — skip them or the walk derails on valid files
            if b[i + 1] == 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF frames
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return ("image/jpeg", w, h, None)
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if seg_len < 2:
                break  # malformed length; stop rather than loop
            i += 2 + seg_len
        return ("image/jpeg", None, None, None)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return ("image/gif", w, h, None)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        # walk the chunk list for BOTH fmt and data — the fmt chunk is
        # not guaranteed at offset 12 (LIST/INFO may precede it) nor
        # 16 bytes long (18/40-byte extended forms exist); byte_rate
        # sits at offset 8 within the fmt chunk's data
        byte_rate, data_len = 0, None
        i = 12
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            clen = int.from_bytes(b[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 20 <= len(b):
                byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
            elif cid == b"data":
                data_len = clen
            if byte_rate and data_len is not None:
                return ("audio/wav", None, None, int(data_len * 1000 / byte_rate))
            i += 8 + clen + (clen % 2)
        return ("audio/wav", None, None, None)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        from aoseventstreamer_spark.functions import avi as AVI

        try:
            meta = AVI.parse_avi(b)
            return (
                "video/x-msvideo",
                meta["width"],
                meta["height"],
                meta["duration_ms"],
            )
        except AVI.AVIError:
            return ("video/x-msvideo", None, None, None)
    if len(b) >= 12 and b[4:8] == b"ftyp":  # ISO BMFF / MP4
        return _sniff_mp4(b)
    if b[:4] == b"fLaC":
        from aoseventstreamer_spark.functions import audio as A

        try:
            d = A.parse_flac(b)["duration_ms"]
        except A.FLACError:
            d = None
        return ("audio/flac", None, None, d)
    if b[:3] == b"ID3" or (b[0] == 0xFF and (b[1] & 0xE0) == 0xE0):
        # MP3: ID3v2-prefixed or bare frame sync (after every other
        # 0xFF-leading format — JPEG's FF D8 fails the 3-bit sync test)
        from aoseventstreamer_spark.functions import audio as A

        try:
            d = A.parse_mp3(b)["duration_ms"]
        except A.MP3Error:
            d = None
        return ("audio/mpeg", None, None, d)
    return (None, None, None, None)


def _sniff_mp4(b: bytes):
    """Delegate to the strict full-moov parser (functions/mp4.py —
    spec-conformant tkhd geometry offsets 76/88, not the 84/96 body
    sizes the r5 sniffer misread); a malformed tree degrades to
    mime-only per the sniffer's screen-everything contract."""
    from aoseventstreamer_spark.functions import mp4

    try:
        meta = mp4.parse_mp4(b)
    except mp4.MP4Error:
        return ("video/mp4", None, None, None)
    w = h = None
    for tr in meta["tracks"]:
        if tr["width"] and tr["height"]:
            w, h = tr["width"], tr["height"]
            break
    return ("video/mp4", w, h, meta["duration_ms"])


def sniff_media(media: DataFrame) -> DataFrame:
    """Type/size-screen a media table from headers alone — the cheap
    pre-decode pass a 100 TB ingest runs to route blobs (and drop
    corrupt ones) BEFORE paying for decode. Arrow-batched mapInPandas;
    payload bytes never reach the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sniffed = [sniff_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [s[0] for s in sniffed],
                    "width": pd.array([s[1] for s in sniffed], dtype="Int32"),
                    "height": pd.array([s[2] for s in sniffed], dtype="Int32"),
                    "duration_ms": pd.array([s[3] for s in sniffed], dtype="Int32"),
                }
            )

    return media.mapInPandas(run, SNIFF_SCHEMA)


def wrap_as_png(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Produce a media table whose payloads are REAL minimal PNG files
    (valid signature + IHDR) carrying the text bytes as body, with
    width/height derived from row fields. Used to exercise the binary
    path end-to-end: sniff_media must recover exactly the dimensions
    written here (oracle-checked as q_media_sniff)."""
    df = _spread(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                w = (len(text) % 1024) + 1
                h = (int(did) % 1024) + 1
                payloads.append(
                    b"\x89PNG\r\n\x1a\n"
                    + (13).to_bytes(4, "big")
                    + b"IHDR"
                    + w.to_bytes(4, "big")
                    + h.to_bytes(4, "big")
                    + b"\x08\x02\x00\x00\x00"
                    + b"\x00" * 4
                    + text.encode("utf-8")
                )
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return df.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("brand", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("video_codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("language", T.StringType()),
        T.StructField("audio_codec", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("err", T.StringType()),
    ]
)

_MP4_RATES = [8000, 16000, 22050, 44100, 48000]
_MP4_LANGS = ["und", "eng", "deu", "fra"]


def wrap_as_mp4(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Media table whose payloads are REAL spec-conformant MP4s
    (functions/mp4.py encoder: ftyp + full moov with video+audio
    traks, v0/v1 and largesize variants cycled by row id) with every
    metadata field derived deterministically from row fields — so
    extract_video_meta must recover exactly what was written
    (oracle-checked as q_video_meta). Rows with id % 17 == 0 are
    truncated mid-moov to exercise the typed-quarantine path."""
    df = _spread(df, id_col)
    from ..functions.mp4 import encode_mp4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                b = encode_mp4(
                    width=(len(text or "") % 1904) + 16,
                    height=(did % 1064) + 16,
                    duration_ms=(did % 3600) * 100 + 40,
                    video_codec=b"avc1" if did % 2 == 0 else b"hev1",
                    audio_codec=b"mp4a",
                    sample_rate=_MP4_RATES[did % 5],
                    channels=did % 2 + 1,
                    lang=_MP4_LANGS[did % 4],
                    v1=(did % 3 == 0),
                    largesize_moov=(did % 11 == 0),
                )
                payloads.append(b[:32] if did % 17 == 0 else b)
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return df.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def extract_video_meta(media: DataFrame) -> DataFrame:
    """Full moov-tree metadata per payload (functions/mp4.py), Arrow
    batched: brand + mvhd duration + first video trak's codec/geometry/
    language + first audio trak's codec/rate/channels. A malformed
    payload quarantines as (nulls..., err=MP4Error) instead of failing
    the task — the 100 TB ingest contract (one corrupt blob must not
    kill a 1000-executor stage, and the err column is the routable
    quarantine signal)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.mp4 import MP4Error, parse_mp4

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in VIDEO_META_SCHEMA}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                row = dict.fromkeys(out)
                row["media_id"] = mid
                try:
                    m = parse_mp4(bytes(p))
                    vid = next(
                        (tr for tr in m["tracks"] if tr["handler"] == "vide"), {}
                    )
                    aud = next(
                        (tr for tr in m["tracks"] if tr["handler"] == "soun"), {}
                    )
                    row.update(
                        brand=m["brand"],
                        duration_ms=m["duration_ms"],
                        video_codec=vid.get("codec"),
                        width=vid.get("width"),
                        height=vid.get("height"),
                        language=vid.get("language"),
                        audio_codec=aud.get("codec"),
                        sample_rate=aud.get("sample_rate"),
                        channels=aud.get("channels"),
                    )
                except MP4Error:
                    row["err"] = "MP4Error"
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "brand": out["brand"],
                    "duration_ms": pd.array(out["duration_ms"], dtype="Int64"),
                    "video_codec": out["video_codec"],
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "language": out["language"],
                    "audio_codec": out["audio_codec"],
                    "sample_rate": pd.array(out["sample_rate"], dtype="Int32"),
                    "channels": pd.array(out["channels"], dtype="Int32"),
                    "err": out["err"],
                }
            )

    return media.mapInPandas(run, VIDEO_META_SCHEMA)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("bitrate_kbps", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("err", T.StringType()),
    ]
)

_FLAC_RATES = [8000, 16000, 22050, 44100, 48000, 96000]
_FLAC_BITS = [8, 12, 16, 24, 32]


def wrap_as_audio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Media table whose payloads are REAL conformant audio headers
    (functions/audio.py encoders): even ids get FLAC (STREAMINFO +
    optional VORBIS_COMMENT/PADDING blocks), odd ids get Layer III MP3
    (MPEG1/MPEG2 cycled, per-frame padding cadence, optional
    ID3v2/ID3v1 tags) — every metadata field derived deterministically
    from row fields so extract_audio_meta must recover exactly what
    was written (oracle-checked as q_audio_meta). Rows with
    id % 19 == 0 are truncated to 9 bytes to exercise the typed
    quarantine path (mid-STREAMINFO for FLAC, mid-ID3v2/mid-frame for
    MP3)."""
    df = _spread(df, id_col)
    from ..functions.audio import encode_flac, encode_mp3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                k = did // 2
                n_chars = len(text or "")
                if did % 2 == 0:
                    b = encode_flac(
                        sample_rate=_FLAC_RATES[k % 6],
                        channels=k % 8 + 1,
                        bits_per_sample=_FLAC_BITS[k % 5],
                        total_samples=(did % 9000) * 100 + n_chars,
                        vendor=f"aoses-{did}" if did % 5 == 0 else None,
                        padding=64 if did % 7 == 0 else 0,
                    )
                else:
                    b = encode_mp3(
                        n_frames=did % 40 + 1,
                        bitrate_idx=k % 14 + 1,
                        samplerate_idx=k % 3,
                        mode=k % 4,
                        mpeg2=(did % 4 == 3),
                        id3v2_size=n_chars % 200 if did % 5 == 0 else None,
                        id3v1=(did % 7 == 0),
                        pad_phase=k % 2,
                    )
                payloads.append(b[:9] if did % 19 == 0 else b)
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return df.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def extract_audio_meta(media: DataFrame) -> DataFrame:
    """FLAC/MP3 metadata per payload (functions/audio.py), Arrow
    batched, at the same depth the MP4 leg carries for video:
    container + sample rate + channels + bit depth (FLAC) / bitrate
    (MP3) + exact sample count and duration. Malformed payloads
    quarantine as (nulls..., err=FLACError|MP3Error) instead of
    failing the task — same contract as extract_video_meta: one
    corrupt blob must not kill a 1000-executor stage, and err is the
    routable quarantine signal. Container dispatch is by CONTENT
    (magic bytes), not extension."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audio import (
            AudioError,
            parse_flac,
            parse_mp3,
        )

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in AUDIO_META_SCHEMA}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                row = dict.fromkeys(out)
                row["media_id"] = mid
                b = bytes(p) if p is not None else b""
                try:
                    if b[:4] == b"fLaC":
                        m = parse_flac(b)
                        row.update(
                            container="flac",
                            sample_rate=m["sample_rate"],
                            channels=m["channels"],
                            bits_per_sample=m["bits_per_sample"],
                            n_samples=m["total_samples"],
                            duration_ms=m["duration_ms"],
                        )
                    else:
                        m = parse_mp3(b)
                        row.update(
                            container="mp3",
                            sample_rate=m["sample_rate"],
                            channels=m["channels"],
                            bitrate_kbps=m["bitrate_kbps"],
                            n_samples=m["n_samples"],
                            duration_ms=m["duration_ms"],
                        )
                except AudioError as e:
                    row["err"] = type(e).__name__
                for key, v in row.items():
                    out[key].append(v)
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "container": out["container"],
                    "sample_rate": pd.array(out["sample_rate"], dtype="Int32"),
                    "channels": pd.array(out["channels"], dtype="Int32"),
                    "bits_per_sample": pd.array(
                        out["bits_per_sample"], dtype="Int32"
                    ),
                    "bitrate_kbps": pd.array(out["bitrate_kbps"], dtype="Int32"),
                    "n_samples": pd.array(out["n_samples"], dtype="Int64"),
                    "duration_ms": pd.array(out["duration_ms"], dtype="Int64"),
                    "err": out["err"],
                }
            )

    return media.mapInPandas(run, AUDIO_META_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
    ]
)


def decode_wav_pcm(payload: bytes):
    """REAL audio decode for 16-bit PCM WAV (stdlib struct + numpy —
    RIFF chunk walk, no media libs): returns
    (sample_rate, n_channels, samples) with samples an int16 ndarray
    of shape (n_frames, n_channels). Raises ValueError for non-WAV or
    non-PCM16 payloads (compressed formats need a codec — that's the
    fallback boundary, same tiering as PNG vs JPEG)."""
    import struct

    import numpy as np

    b = bytes(payload or b"")
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
        body = b[i + 8 : i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen % 2)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"not PCM16 (format={audio_format}, bits={bits})")
    if n_channels < 1:
        raise ValueError("zero channels")
    usable = len(data) - (len(data) % (2 * n_channels))
    samples = np.frombuffer(data[:usable], dtype="<i2").reshape(-1, n_channels)
    return sample_rate, n_channels, samples


_AVI_USEC = [33333, 40000, 20000]

VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("gray", T.IntegerType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("err", T.StringType()),
    ]
)


def wrap_as_video(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Media table whose payloads are REAL MJPEG AVIs
    (functions/avi.py around functions/jpeg.py frames): per row,
    n = id%6+1 solid-gray frames of closed-form level
    g[i] = (id·37 + i·89) mod 256 at quality 95 — a solid block's JPEG
    is DC-only and the q95 luma quantizer (q00 = 2) divides 8·(g−128)
    exactly, so decode recovers g BIT-EXACTLY and a SQL oracle can
    state the decoded pixels (q_video_frames). Rows with id % 29 == 0
    truncate mid-header for the typed quarantine path."""
    df = _spread(df, id_col)
    import numpy as np

    from ..functions.avi import encode_avi_mjpeg
    from ..functions.jpeg import encode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                n = did % 6 + 1
                w = (did % 4 + 1) * 16
                h = (did % 3 + 1) * 16
                frames = [
                    encode_jpeg(
                        np.full((h, w), (did * 37 + i * 89) % 256, np.uint8),
                        quality=95,
                    )
                    for i in range(n)
                ]
                b = encode_avi_mjpeg(frames, w, h, _AVI_USEC[did % 3])
                payloads.append(b[:25] if did % 29 == 0 else b)
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return df.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def extract_video_frames(media: DataFrame) -> DataFrame:
    """REAL video pixel decode, Arrow-batched: every MJPEG frame
    entropy-decodes through functions/jpeg.py and emits per-frame
    evidence — geometry, frame count, duration, and the frame's single
    gray level when it is uniform (null otherwise; ``n_px`` counts
    decoded pixels either way). One malformed container quarantines as
    a single (nulls..., err=...) row, never a task failure — the
    extract_video_meta contract, now at PIXEL depth."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.avi import AVIError, decode_avi_frames
        from ..functions.jpeg import JPEGError

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in VIDEO_FRAMES_SCHEMA}

            def emit(**kw):
                for f in VIDEO_FRAMES_SCHEMA:
                    out[f.name].append(kw.get(f.name))

            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    meta, decoded = decode_avi_frames(bytes(p or b""))
                    for i, px in decoded:
                        vals = np.unique(px)
                        emit(
                            media_id=mid,
                            frame_idx=i,
                            width=meta["width"],
                            height=meta["height"],
                            n_frames=meta["n_frames"],
                            duration_ms=meta["duration_ms"],
                            gray=int(vals[0]) if len(vals) == 1 else None,
                            n_px=int(px.size),
                        )
                except (AVIError, JPEGError) as e:
                    emit(media_id=mid, err=type(e).__name__)
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "frame_idx": pd.array(out["frame_idx"], dtype="Int32"),
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "n_frames": pd.array(out["n_frames"], dtype="Int32"),
                    "duration_ms": pd.array(out["duration_ms"], dtype="Int64"),
                    "gray": pd.array(out["gray"], dtype="Int32"),
                    "n_px": pd.array(out["n_px"], dtype="Int64"),
                    "err": out["err"],
                }
            )

    return media.mapInPandas(run, VIDEO_FRAMES_SCHEMA)


_WAV_RATES = [8000, 16000, 44100]


def wrap_as_wav(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Media table whose payloads carry REAL PCM audio with
    deterministic samples derived from row fields — sample
    s[i, c] = ((id·31 + i·17 + c·11) mod 4001) − 2000 — so the decoded
    feature evidence (q_audio_features) is computable in closed form
    by a SQL oracle. Even ids get PCM16 WAV; odd ids get the SAME
    samples losslessly compressed as real FLAC
    (functions/audio.encode_flac_pcm — rice-coded fixed/constant
    subframes, mid/side, CRCs), so one oracle formula verifies BOTH
    decode paths bit-for-bit. Rows with id % 23 == 0 truncate to 20
    bytes to exercise the null-evidence quarantine path."""
    df = _spread(df, id_col)
    import struct

    from ..functions.audio import encode_flac_pcm

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                nf = did % 50 + 4
                ch = did % 2 + 1
                rate = _WAV_RATES[did % 3]
                samples = [
                    [
                        ((did * 31 + i * 17 + c * 11) % 4001) - 2000
                        for c in range(ch)
                    ]
                    for i in range(nf)
                ]
                if did % 2 == 1:
                    b = encode_flac_pcm(samples, rate, block_size=16)
                else:
                    frames = bytearray()
                    for row in samples:
                        for s in row:
                            frames += struct.pack("<h", s)
                    hdr = (
                        b"RIFF"
                        + struct.pack("<I", 36 + len(frames))
                        + b"WAVE"
                        + b"fmt "
                        + struct.pack(
                            "<IHHIIHH", 16, 1, ch, rate, rate * ch * 2,
                            ch * 2, 16,
                        )
                        + b"data"
                        + struct.pack("<I", len(frames))
                    )
                    b = hdr + bytes(frames)
                payloads.append(b[:20] if did % 23 == 0 else b)
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return df.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


AUDIO_EVIDENCE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("sign_changes", T.LongType()),
    ]
)


def extract_audio_evidence(media: DataFrame) -> DataFrame:
    """The INTEGER-evidence sibling of extract_audio_features: decoded
    PCM features expressed in cross-engine-exact integers — sum of
    squared samples (energy; rms = sqrt(sum_sq/n) is the derived
    float), int32-safe absolute peak, and sign changes of the
    integer channel-sum mono mix (< 0 rule, no float signbit) — the
    q_hll denom_scaled discipline applied to audio. Dispatches by
    CONTENT: RIFF/WAVE payloads through decode_wav_pcm, fLaC payloads
    through the full FLAC frame decoder
    (functions/audio.decode_flac_pcm — rice residuals, predictors,
    stereo decorrelation, CRCs). Undecodable payloads yield null
    evidence, never task failures."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audio import decode_flac_pcm

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in AUDIO_EVIDENCE_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                row = dict.fromkeys(out)
                row["media_id"] = mid
                try:
                    if bytes(payload or b"")[:4] == b"fLaC":
                        rate, ch, samples = decode_flac_pcm(bytes(payload))
                        row["container"] = "flac"
                    else:
                        rate, ch, samples = decode_wav_pcm(payload)
                        row["container"] = "wav"
                    s = samples.astype(np.int64)
                    n = len(s)
                    mono = s.sum(axis=1)
                    neg = mono < 0
                    row.update(
                        sample_rate=rate,
                        n_channels=ch,
                        n_frames=n,
                        duration_ms=(n * 1000) // rate if rate else None,
                        sum_sq=int((s * s).sum()),
                        peak=int(np.abs(s).max()) if n else 0,
                        sign_changes=int(
                            np.count_nonzero(neg[1:] != neg[:-1])
                        ),
                    )
                except ValueError:
                    pass
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "container": out["container"],
                    "sample_rate": pd.array(out["sample_rate"], dtype="Int32"),
                    "n_channels": pd.array(out["n_channels"], dtype="Int32"),
                    "n_frames": pd.array(out["n_frames"], dtype="Int64"),
                    "duration_ms": pd.array(out["duration_ms"], dtype="Int64"),
                    "sum_sq": pd.array(out["sum_sq"], dtype="Int64"),
                    "peak": pd.array(out["peak"], dtype="Int32"),
                    "sign_changes": pd.array(out["sign_changes"], dtype="Int64"),
                }
            )

    return media.mapInPandas(run, AUDIO_EVIDENCE_SCHEMA)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio features for PCM16 WAV payloads (decode_wav_pcm):
    duration, RMS, peak, zero-crossing rate over the actual samples —
    the screen-before-transcribe pass of an audio ingest. Non-WAV /
    compressed payloads yield a row with null features rather than a
    task failure (same garbage-tolerance as every decode path here)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "sample_rate", "n_channels",
                                   "n_samples", "duration_ms", "rms", "peak",
                                   "zero_crossing_rate")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    rate, ch, samples = decode_wav_pcm(payload)
                    mono = samples.astype(np.float64).mean(axis=1)
                    n = len(mono)
                    zc = (
                        float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                        / (n - 1)
                        if n > 1
                        else 0.0
                    )
                    out["sample_rate"].append(rate)
                    out["n_channels"].append(ch)
                    out["n_samples"].append(n)
                    out["duration_ms"].append(int(n * 1000 / rate) if rate else None)
                    out["rms"].append(float(np.sqrt(np.mean(mono**2))) if n else 0.0)
                    # int32 first: np.abs wraps at int16 -32768, which
                    # would report clipped full-scale audio as quiet
                    out["peak"].append(
                        int(np.abs(samples.astype(np.int32)).max()) if n else 0
                    )
                    out["zero_crossing_rate"].append(zc)
                except ValueError:
                    for k in ("sample_rate", "n_channels", "n_samples",
                              "duration_ms", "rms", "peak", "zero_crossing_rate"):
                        out[k].append(None)
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "sample_rate": pd.array(out["sample_rate"], dtype="Int32"),
                    "n_channels": pd.array(out["n_channels"], dtype="Int32"),
                    "n_samples": pd.array(out["n_samples"], dtype="Int64"),
                    "duration_ms": pd.array(out["duration_ms"], dtype="Int32"),
                    "rms": pd.array(out["rms"], dtype="Float64"),
                    "peak": pd.array(out["peak"], dtype="Int32"),
                    "zero_crossing_rate": pd.array(
                        out["zero_crossing_rate"], dtype="Float64"
                    ),
                }
            )

    return media.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def wrap_as_real_png(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_side_src: int = 48,
) -> DataFrame:
    """Media table whose payloads are COMPLETE, decodable RGB PNGs
    (signature + IHDR + zlib IDAT + IEND, valid CRCs): pixel content is
    a deterministic gradient seeded by the row id, dimensions derive
    from the text length — so the real decode path (resize_images,
    extract_image_features) can be exercised end-to-end on fixture
    tables without any image files on disk."""
    df = _spread(df, id_col)
    from ..functions.png import encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                # NULL text must not kill the task (module contract)
                w = (len(text or "") % max_side_src) + 2
                h = (int(did) % max_side_src) + 2
                yy, xx = np.mgrid[0:h, 0:w]
                r = (xx * 255 // max(1, w - 1)).astype(np.uint8)
                g = (yy * 255 // max(1, h - 1)).astype(np.uint8)
                b = np.full((h, w), int(did) % 256, dtype=np.uint8)
                ids.append(did)
                payloads.append(encode_png(np.dstack([r, g, b])))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize pass. The geometry is REAL (target dimensions from
    parsing the actual container header + aspect-preserving
    arithmetic), and for non-interlaced 8-bit PNGs, baseline-Huffman
    JPEGs, AND single-frame GIFs the PIXELS are real too: the payload
    is fully decoded (functions/png.py zlib+unfilter /
    functions/jpeg.py Huffman+IDCT incl. progressive / functions/
    gif.py LZW), bilinearly resampled, and re-encoded as a valid
    container of the same format (palette/16-bit/interlaced PNG
    re-encodes as plain 8-bit PNG — decode is full-profile, the
    writer is the common profile). Profiles we cannot decode without
    media libs (arithmetic-coded JPEG; 12-bit frames downshift to the
    8-bit pipeline) fall back to the deterministic byte-decimation
    STUB — a real
    pipeline swaps that branch for PIL/ffmpeg; the mapInPandas batch
    shape, schema, and executor-side payload flow are identical
    either way.

    Rows whose header doesn't parse (unknown container, corrupt bytes)
    pass through unchanged with null dims rather than failing the
    task — at 100 TB some blobs are always garbage."""
    import numpy as np

    from ..functions import gif as GIF
    from ..functions import jpeg as JPEG
    from ..functions import png as PNG

    def _stub_resample(payload: bytes, w: int, h: int) -> bytes:
        # STUB: deterministic byte decimation standing in for pixel
        # resampling; length scales with the target area like a real
        # resize's decoded buffer would.
        stride = max(1, len(payload) * max(w, h) // max(1, w * h))
        return bytes(payload[::stride])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, ws, hs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                mime, w, h, _ = sniff_header(payload)
                if w and h:
                    scale = max_side / max(w, h)
                    nw = max(1, round(w * min(1.0, scale)))
                    nh = max(1, round(h * min(1.0, scale)))
                    if mime == "image/png":
                        try:  # REAL pixel path
                            pixels = PNG.decode_png(bytes(payload))
                            if (nw, nh) != (w, h):
                                pixels = PNG.resize_bilinear(pixels, nw, nh)
                            payloads.append(PNG.encode_png(pixels))
                        except PNG.PNGError:
                            # header said PNG but body undecodable
                            # (truncated/corrupt): stub fallback,
                            # never a task failure
                            payloads.append(_stub_resample(bytes(payload), nw, nh))
                    elif mime == "image/jpeg":
                        try:  # REAL pixel path (functions/jpeg.py)
                            pixels = JPEG.decode_jpeg(bytes(payload))
                            if pixels.dtype != np.uint8:
                                # 12-bit frames: the resize/re-encode
                                # pipeline is 8-bit; keep the top bits
                                pixels = (pixels >> 4).astype(np.uint8)
                            if (nw, nh) != (w, h):
                                pixels = PNG.resize_bilinear(pixels, nw, nh)
                            payloads.append(JPEG.encode_jpeg(pixels))
                        except JPEG.JPEGError:
                            # arithmetic-coded/corrupt: stub fallback,
                            # never a task failure
                            payloads.append(_stub_resample(bytes(payload), nw, nh))
                    elif mime == "image/gif":
                        try:  # REAL pixel path (functions/gif.py)
                            pixels = GIF.decode_gif(bytes(payload))
                            if (nw, nh) != (w, h):
                                # bilinear blends palette colors; the
                                # re-encode re-quantizes if that
                                # exceeds 256 distinct colors
                                pixels = PNG.resize_bilinear(pixels, nw, nh)
                            payloads.append(GIF.encode_gif(pixels))
                        except GIF.GIFError:
                            # animated/corrupt: stub fallback
                            payloads.append(_stub_resample(bytes(payload), nw, nh))
                    else:
                        payloads.append(_stub_resample(bytes(payload), nw, nh))
                else:
                    nw = nh = None
                    payloads.append(bytes(payload) if payload is not None else None)
                ids.append(mid)
                ws.append(nw)
                hs.append(nh)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def wrap_as_mixed_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One media table spanning EVERY container the sniffer types —
    per row id % 7 selects PNG / GIF / MP4 / MJPEG-AVI / FLAC / MP3 /
    WAV, each a REAL encoder-built blob with closed-form metadata, so
    a single oracle can state what content-based sniffing must
    recover for the whole zoo (q_media_catalog). Rows with
    id % 31 == 0 carry unrecognizable bytes (all-null sniff)."""
    df = _spread(df, id_col)
    import struct

    import numpy as np

    from ..functions.audio import encode_flac, encode_mp3
    from ..functions.avi import encode_avi_mjpeg
    from ..functions.gif import encode_gif
    from ..functions.jpeg import encode_jpeg
    from ..functions.mp4 import encode_mp4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                k = did // 7
                w = (k % 20 + 1) * 8
                h = (k % 12 + 1) * 8
                if did % 31 == 0:
                    b = b"\x00unrecognized-bytes" + bytes([did % 256]) * 16
                elif did % 7 == 0:  # PNG (header-only form, like q_media_sniff)
                    b = (
                        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
                        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
                        + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
                    )
                elif did % 7 == 1:  # GIF
                    b = encode_gif(np.zeros((h, w, 3), dtype=np.uint8))
                elif did % 7 == 2:  # MP4
                    b = encode_mp4(
                        width=w, height=h, duration_ms=(did % 3000) + 100
                    )
                elif did % 7 == 3:  # MJPEG AVI
                    n = k % 4 + 1
                    frames = [
                        encode_jpeg(np.full((h, w), 99, np.uint8), quality=95)
                    ] * n
                    b = encode_avi_mjpeg(frames, w, h, 40000)
                elif did % 7 == 4:  # FLAC
                    rate = [8000, 16000, 44100][k % 3]
                    b = encode_flac(rate, 2, 16, (did % 9000) * 10 + 100)
                elif did % 7 == 5:  # MP3 (MPEG1, exact frame count)
                    b = encode_mp3(
                        k % 30 + 1, bitrate_idx=k % 14 + 1,
                        samplerate_idx=k % 3,
                    )
                else:  # WAV — rates dividing the ms math exactly
                    rate = [8000, 16000][k % 2]
                    nf = did % 400 + 8
                    frames_b = b"\x00\x00" * nf
                    b = (
                        b"RIFF" + struct.pack("<I", 36 + len(frames_b))
                        + b"WAVE" + b"fmt "
                        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
                        + b"data" + struct.pack("<I", len(frames_b)) + frames_b
                    )
                payloads.append(b)
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return df.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def wrap_as_pixels(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Media table whose payloads carry REAL encoded images with
    deterministic pixels derived from row fields — grayscale
    v(y, x) = (id·7 + y·5 + x·3) mod 256 at (id%13+4) × (id%11+4) —
    so the decoded-PIXEL evidence (q_image_features) is computable in
    closed form by a SQL oracle. Even ids encode through the real PNG
    path (functions/png.encode_png), cycling all five row filters
    (id%5) and the Adam7 interlace leg (id%4==2); odd ids encode as
    exact-palette GIF89a (functions/gif.encode_gif — full 12-bit LZW),
    so ONE oracle formula verifies both decode paths bit-for-bit —
    the image leg of the q_audio_features two-decode-path design.
    Rows with id % 23 == 0 truncate to 16 bytes to exercise the
    null-evidence quarantine."""
    df = _spread(df, id_col)
    import numpy as np

    from ..functions.gif import encode_gif
    from ..functions.png import encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                w = did % 13 + 4
                h = did % 11 + 4
                y, x = np.mgrid[0:h, 0:w]
                v = ((did * 7 + y * 5 + x * 3) % 256).astype(np.uint8)
                if did % 2 == 0:
                    b = encode_png(
                        v, filter_type=did % 5, interlace=(did % 4 == 2)
                    )
                else:
                    b = encode_gif(v)
                payloads.append(b[:16] if did % 23 == 0 else b)
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return df.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


IMAGE_EVIDENCE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
        T.StructField("px_wsum", T.LongType()),
        T.StructField("px_min", T.IntegerType()),
        T.StructField("px_max", T.IntegerType()),
    ]
)


def extract_image_evidence(media: DataFrame) -> DataFrame:
    """Decoded-PIXEL image evidence in cross-engine-exact integers —
    pixel sum, POSITION-WEIGHTED pixel sum (Σ v·(y·w + x + 1), which a
    transposed row, mis-unfiltered scanline, or shuffled interlace
    pass cannot fake), and extrema — the integer-evidence sibling of
    extract_image_features, completing the modality triangle next to
    extract_audio_evidence (PCM) and extract_video_frames (MJPEG).
    Dispatches by CONTENT: PNG signatures through the full
    functions/png.py decoder (all five filters + Adam7), GIF through
    the LZW decoder; evidence is computed on channel 0 (GIF promotes
    grayscale to RGB with equal channels). Undecodable payloads yield
    null evidence, never task failures."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.gif import GIFError, decode_gif
        from ..functions.png import PNGError, decode_png

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in IMAGE_EVIDENCE_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                row = dict.fromkeys(out)
                row["media_id"] = mid
                b = bytes(payload or b"")
                try:
                    if b[:8] == b"\x89PNG\r\n\x1a\n":
                        arr = decode_png(b)
                        row["container"] = "png"
                    elif b[:4] == b"GIF8":
                        arr = decode_gif(b)
                        row["container"] = "gif"
                    else:
                        raise PNGError("unrecognized payload")
                    ch0 = arr[:, :, 0].astype(np.int64)
                    hh, ww = ch0.shape
                    pos = (
                        np.arange(hh, dtype=np.int64)[:, None] * ww
                        + np.arange(ww, dtype=np.int64)[None, :]
                        + 1
                    )
                    row.update(
                        width=ww,
                        height=hh,
                        px_sum=int(ch0.sum()),
                        px_wsum=int((ch0 * pos).sum()),
                        px_min=int(ch0.min()),
                        px_max=int(ch0.max()),
                    )
                except (PNGError, GIFError):
                    row["container"] = None
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "container": out["container"],
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "px_sum": pd.array(out["px_sum"], dtype="Int64"),
                    "px_wsum": pd.array(out["px_wsum"], dtype="Int64"),
                    "px_min": pd.array(out["px_min"], dtype="Int32"),
                    "px_max": pd.array(out["px_max"], dtype="Int32"),
                }
            )

    return media.mapInPandas(run, IMAGE_EVIDENCE_SCHEMA)


MP4_SAMPLE_EVIDENCE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_sync", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("gray", T.IntegerType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("err", T.StringType()),
    ]
)


def wrap_as_mjpeg_mp4(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Media table whose payloads are REAL MJPEG-in-MP4 files
    (functions/mp4.encode_mp4_mjpeg around functions/jpeg frames):
    n = id%5+2 solid-gray q95 frames (g[i] = (id·37 + i·89) mod 256 —
    DC-only, bit-exact decode, the q_video_frames trick), packed
    through a FULL sample table whose chunk grouping (id%3+1 samples
    per chunk) and sync cadence (every id%2+1) vary per row, so the
    stsc run expansion and stss subset logic are both under the hash.
    Rows with id % 19 == 0 truncate mid-moov for the typed
    quarantine."""
    df = _spread(df, id_col)
    import numpy as np

    from ..functions.jpeg import encode_jpeg
    from ..functions.mp4 import encode_mp4_mjpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf[id_col]:
                did = int(did)
                n = did % 5 + 2
                w = (did % 4 + 1) * 16
                h = (did % 3 + 1) * 16
                frames = [
                    encode_jpeg(
                        np.full((h, w), (did * 37 + i * 89) % 256, np.uint8),
                        quality=95,
                    )
                    for i in range(n)
                ]
                b = encode_mp4_mjpeg(
                    frames, w, h,
                    fps=(10, 25, 30)[did % 3],
                    samples_per_chunk=did % 3 + 1,
                    sync_every=did % 2 + 1,
                )
                payloads.append(b[:30] if did % 19 == 0 else b)
            yield pd.DataFrame({"media_id": pdf[id_col], "payload": payloads})

    return df.mapInPandas(
        run,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


def extract_mp4_sample_evidence(media: DataFrame) -> DataFrame:
    """Decode every SYNC sample of an MJPEG-in-MP4 track to pixel
    evidence: the sample-table walk (functions/mp4.parse_mp4_samples —
    stsc runs, stsz sizes, stco offsets, stss sync subset) locates the
    byte ranges, functions/jpeg.py entropy-decodes them, and each sync
    frame emits its uniform gray level — so a single wrong offset,
    size, or sync flag surfaces as a hash mismatch, not a plausible
    row. Malformed containers quarantine as one typed err row."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.jpeg import JPEGError, decode_jpeg
        from ..functions.mp4 import MP4Error, parse_mp4_samples

        for pdf in batches:
            out: dict[str, list] = {
                f.name: [] for f in MP4_SAMPLE_EVIDENCE_SCHEMA
            }

            def emit(**kw):
                for f in MP4_SAMPLE_EVIDENCE_SCHEMA:
                    out[f.name].append(kw.get(f.name))

            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    raw = bytes(p or b"")
                    m = parse_mp4_samples(raw)
                    n_sync = sum(1 for s in m["samples"] if s[2])
                    for i, (off, sz, sync) in enumerate(m["samples"]):
                        if not sync:
                            continue
                        px = decode_jpeg(raw[off : off + sz])
                        vals = np.unique(px)
                        emit(
                            media_id=mid,
                            sample_idx=i,
                            n_samples=m["n_samples"],
                            n_sync=n_sync,
                            codec=m["codec"],
                            width=m["width"],
                            height=m["height"],
                            gray=int(vals[0]) if len(vals) == 1 else None,
                            n_px=int(px.size),
                        )
                except (MP4Error, JPEGError) as e:
                    emit(media_id=mid, err=type(e).__name__)
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "sample_idx": pd.array(out["sample_idx"], dtype="Int32"),
                    "n_samples": pd.array(out["n_samples"], dtype="Int32"),
                    "n_sync": pd.array(out["n_sync"], dtype="Int32"),
                    "codec": out["codec"],
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "gray": pd.array(out["gray"], dtype="Int32"),
                    "n_px": pd.array(out["n_px"], dtype="Int64"),
                    "err": out["err"],
                }
            )

    return media.mapInPandas(run, MP4_SAMPLE_EVIDENCE_SCHEMA)
