"""Multimodal plumbing tests: schema shape, Arrow batch flow,
1→N frame fan-out, and determinism of the stubbed decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import multimodal as MM
from aoseventstreamer_spark.session import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return MM.attach_binary_payload(docs).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert dict(media.dtypes)["payload"] == "binary"


def test_feature_extraction(media):
    feats = MM.extract_image_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:5]:
        assert len(r.feat) == 8
        assert abs(sum(r.feat) - 1.0) < 1e-6  # normalized histogram
        assert len(r.checksum) == 32


def test_feature_extraction_deterministic(media):
    a = {r.media_id: r.checksum for r in MM.extract_image_features(media).collect()}
    b = {r.media_id: r.checksum for r in MM.extract_image_features(media).collect()}
    assert a == b


def test_frame_sampling_fan_out(media):
    frames = MM.sample_frames(media, every_n_bytes=64, max_frames=4)
    per_doc = frames.groupBy("media_id").count().collect()
    assert all(1 <= r["count"] <= 4 for r in per_doc)
    # long docs produce multiple frames
    assert any(r["count"] > 1 for r in per_doc)


def test_stub_decode_raises_on_empty():
    with pytest.raises(NotImplementedError):
        MM._stub_decode_image(b"")


def _minimal_png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
            + b"\x00" * 4)


def _minimal_jpeg(w, h):
    # SOI, APP0 (len 16), SOF0 with dims
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x11\x00")
    return b"\xff\xd8" + app0 + sof0


def _minimal_gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 4


def _minimal_wav(byte_rate, data_len):
    fmt = (b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
           + (1).to_bytes(2, "little") + (8000).to_bytes(4, "little")
           + byte_rate.to_bytes(4, "little") + (2).to_bytes(2, "little")
           + (16).to_bytes(2, "little"))
    data = b"data" + data_len.to_bytes(4, "little") + b"\x00" * data_len
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_sniff_header_parses_real_containers(spark):
    """Header sniffing is real byte parsing (not the decode stub):
    handcrafted minimal PNG/JPEG/GIF/WAV files parse to their true
    dimensions/durations; junk yields nulls instead of task failure."""
    from aoseventstreamer_spark.operators.multimodal import sniff_media

    rows = [
        (1, _minimal_png(640, 480)),
        (2, _minimal_jpeg(1920, 1080)),
        (3, _minimal_gif(64, 32)),
        (4, _minimal_wav(16000, 32000)),  # 2 seconds
        (5, b"not a media file at all..."),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in sniff_media(df).collect()}
    assert (got[1].mime, got[1].width, got[1].height) == ("image/png", 640, 480)
    assert (got[2].mime, got[2].width, got[2].height) == ("image/jpeg", 1920, 1080)
    assert (got[3].mime, got[3].width, got[3].height) == ("image/gif", 64, 32)
    assert (got[4].mime, got[4].duration_ms) == ("audio/wav", 2000)
    assert got[5].mime is None and got[5].width is None


def test_resize_images_geometry_is_real(spark):
    """Aspect-preserving target dims computed from REAL parsed
    headers; oversized images scale down to max_side, small ones are
    untouched; unparseable rows pass through with null dims."""
    from aoseventstreamer_spark.operators.multimodal import resize_images

    rows = [
        (1, _minimal_png(640, 480)),    # downscale: 256x192
        (2, _minimal_png(100, 50)),     # already small: unchanged dims
        (3, _minimal_jpeg(1080, 1920)), # portrait: 144x256
        (4, b"garbage bytes"),          # passthrough, null dims
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in resize_images(df, max_side=256).collect()}
    assert (got[1].width, got[1].height) == (256, 192)
    assert (got[2].width, got[2].height) == (100, 50)
    assert (got[3].width, got[3].height) == (144, 256)
    assert got[4].width is None and bytes(got[4].payload) == b"garbage bytes"
    assert all(got[i].payload is not None for i in (1, 2, 3))


def _pcm_wav(rate, samples_i16, channels=1):
    """Assemble a real PCM16 WAV independently of the decoder."""
    import struct

    import numpy as np

    data = np.asarray(samples_i16, dtype="<i2").tobytes()
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + struct.pack("<HHIIHH", 1, channels, rate,
                         rate * channels * 2, channels * 2, 16))
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_audio_features_real_pcm_decode(spark):
    """REAL WAV path: a synthesized sine wave must yield RMS ~ A/sqrt(2),
    the true duration, and the analytic zero-crossing rate; non-audio
    payloads yield null features, not task failures."""
    import numpy as np

    rate, freq, amp, secs = 8000, 440.0, 10000, 2
    t = np.arange(rate * secs) / rate
    sine = (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)
    rows = [
        (1, _pcm_wav(rate, sine)),
        (2, b"not audio at all......................................."),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in MM.extract_audio_features(df).collect()}
    a = got[1]
    assert a.sample_rate == rate and a.n_channels == 1
    assert a.n_samples == rate * secs
    assert a.duration_ms == secs * 1000
    assert abs(a.rms - amp / 2**0.5) / (amp / 2**0.5) < 0.01
    # sine at f Hz crosses zero ~2f times/sec -> rate-normalized 2f/rate
    assert abs(a.zero_crossing_rate - 2 * freq / rate) < 0.01
    assert amp * 0.98 <= a.peak <= amp
    assert got[2].rms is None and got[2].sample_rate is None


def test_audio_decode_rejects_non_pcm(spark):
    import struct

    import numpy as np
    import pytest as _pytest

    wav = bytearray(_pcm_wav(8000, np.zeros(16, dtype=np.int16)))
    wav[20:22] = struct.pack("<H", 85)  # audio_format = MP3
    with _pytest.raises(ValueError, match="PCM16"):
        MM.decode_wav_pcm(bytes(wav))


def test_audio_peak_survives_int16_min(spark):
    """np.abs wraps at int16 -32768; the peak must be computed in
    int32 so clipped full-scale audio reports 32768, not a small or
    negative value."""
    import struct

    from aoseventstreamer_spark.operators.multimodal import extract_audio_features

    samples = struct.pack("<3h", -32768, 100, -5)
    fmt = (b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
           + (1).to_bytes(2, "little") + (8000).to_bytes(4, "little")
           + (16000).to_bytes(4, "little") + (2).to_bytes(2, "little")
           + (16).to_bytes(2, "little"))
    data = b"data" + len(samples).to_bytes(4, "little") + samples
    body = b"WAVE" + fmt + data
    wav = b"RIFF" + len(body).to_bytes(4, "little") + body
    df = spark.createDataFrame([(1, wav)], ["media_id", "payload"])
    [r] = extract_audio_features(df).collect()
    assert r.peak == 32768


def test_wrap_as_real_png_tolerates_null_text(spark):
    from aoseventstreamer_spark.operators.multimodal import wrap_as_real_png

    df = spark.createDataFrame([(1, None), (2, "some text")], "doc_id long, text string")
    rows = wrap_as_real_png(df).collect()
    assert len(rows) == 2 and all(r.payload[:8] == b"\x89PNG\r\n\x1a\n" for r in rows)


def _mp4_fixture(w: int, h: int, dur_s: float, v1: bool = False) -> bytes:
    """Spec-conformant fixture from the in-module encoder (the r5
    hand-rolled skeleton padded tkhd with the same wrong 84/96
    pre-geometry offsets the sniffer misread, so the suite could not
    detect the bug — generating from functions/mp4.py validates
    against the real ISO 14496-12 layout instead). The audio trak
    carries zero dims, so the sniffer must skip it and report the
    video trak's 16.16 geometry."""
    from aoseventstreamer_spark.functions.mp4 import encode_mp4

    return encode_mp4(w, h, int(dur_s * 1000), v1=v1)


def test_sniff_mp4_video_dims_and_duration():
    from aoseventstreamer_spark.operators.multimodal import sniff_header

    mime, w, h, dur = sniff_header(_mp4_fixture(640, 360, 12.5))
    assert (mime, w, h, dur) == ("video/mp4", 640, 360, 12500)
    # version-1 mvhd/tkhd (64-bit times)
    mime, w, h, dur = sniff_header(_mp4_fixture(1920, 1080, 3.0, v1=True))
    assert (mime, w, h, dur) == ("video/mp4", 1920, 1080, 3000)
    # truncated moov: typed, no crash, no dims
    data = _mp4_fixture(640, 360, 1.0)[:40]
    mime, w, h, dur = sniff_header(data)
    assert mime == "video/mp4" and w is None


def test_extract_video_meta_quarantines_truncated(spark):
    """One corrupt payload must become an err row, not a task failure
    (the r6 review found — and fixed — a StopIteration leak through
    this exact catch)."""
    from aoseventstreamer_spark.functions.mp4 import encode_mp4
    from aoseventstreamer_spark.operators.multimodal import extract_video_meta

    good = encode_mp4(640, 360, 1500, sample_rate=16000, channels=1)
    df = spark.createDataFrame(
        [(1, good), (2, good[:32]), (3, b"\x00" * 16)],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in extract_video_meta(df).collect()}
    assert rows[1].err is None and rows[1].width == 640 and rows[1].sample_rate == 16000
    assert rows[2].err == "MP4Error" and rows[2].width is None
    assert rows[3].err == "MP4Error"


class TestImageEvidence:
    """wrap_as_pixels + extract_image_evidence: the decoded-PIXEL
    integer evidence leg (q_image_features, VERDICT r7 item 3)."""

    def _run(self, spark, ids):
        from aoseventstreamer_spark.operators.multimodal import (
            extract_image_evidence,
            wrap_as_pixels,
        )

        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        return {
            r.media_id: r
            for r in extract_image_evidence(wrap_as_pixels(df)).collect()
        }

    def test_evidence_matches_direct_numpy(self, spark):
        import numpy as np

        ids = [2, 3, 6, 10, 15]  # PNG filters 0-4 + interlace(6,10), GIFs
        rows = self._run(spark, ids)
        for did in ids:
            w, h = did % 13 + 4, did % 11 + 4
            y, x = np.mgrid[0:h, 0:w]
            v = ((did * 7 + y * 5 + x * 3) % 256).astype(np.int64)
            pos = y * w + x + 1
            r = rows[did]
            assert r.container == ("png" if did % 2 == 0 else "gif")
            assert (r.width, r.height) == (w, h)
            assert r.px_sum == int(v.sum())
            assert r.px_wsum == int((v * pos).sum())
            assert r.px_min == int(v.min()) and r.px_max == int(v.max())

    def test_truncated_rows_quarantine(self, spark):
        rows = self._run(spark, [23, 46])
        for did in (23, 46):
            r = rows[did]
            assert r.container is None and r.px_sum is None

    def test_undecodable_payload_yields_nulls_not_failure(self, spark):
        from aoseventstreamer_spark.operators.multimodal import (
            extract_image_evidence,
        )

        media = spark.createDataFrame(
            [(1, bytearray(b"\x89PNG\r\n\x1a\ngarbage")), (2, None)],
            "media_id long, payload binary",
        )
        out = {r.media_id: r for r in extract_image_evidence(media).collect()}
        assert out[1].px_sum is None and out[2].container is None
