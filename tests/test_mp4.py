"""functions/mp4.py: full moov-tree parse roundtripped against the
in-module encoder (the repo's codec discipline), plus the strictness
contract — malformed boxes raise the typed MP4Error (quarantine
signal) instead of returning corrupt metadata."""

from __future__ import annotations

import pytest

from aoseventstreamer_spark.functions import mp4


def test_roundtrip_v0_video_and_audio():
    b = mp4.encode_mp4(
        1280, 720, 5500, video_codec=b"avc1", audio_codec=b"mp4a",
        sample_rate=44100, channels=2, lang="eng",
    )
    m = mp4.parse_mp4(b)
    assert m["brand"] == "isom"
    assert m["timescale"] == 1000 and m["duration_ms"] == 5500
    vid, aud = m["tracks"]
    assert vid["track_id"] == 1 and vid["handler"] == "vide"
    assert (vid["codec"], vid["width"], vid["height"]) == ("avc1", 1280, 720)
    assert vid["duration_ms"] == 5500 and vid["language"] == "eng"
    assert aud["track_id"] == 2 and aud["handler"] == "soun"
    assert (aud["codec"], aud["sample_rate"], aud["channels"]) == ("mp4a", 44100, 2)
    # mdhd audio duration floors twice through the 44.1 kHz timescale
    assert aud["duration_ms"] == (5500 * 44100 // 1000) * 1000 // 44100


def test_roundtrip_v1_boxes_and_other_codecs():
    b = mp4.encode_mp4(
        3840, 2160, 90_061_000, video_codec=b"hev1", audio_codec=b"ac-3",
        sample_rate=48000, channels=6, v1=True,
    )
    m = mp4.parse_mp4(b)
    assert m["duration_ms"] == 90_061_000  # >25h: needs the v1 64-bit path
    vid, aud = m["tracks"]
    assert (vid["codec"], vid["width"], vid["height"]) == ("hev1", 3840, 2160)
    assert (aud["codec"], aud["channels"]) == ("ac-3", 6)


def test_largesize_moov_box():
    b = mp4.encode_mp4(640, 480, 2000, largesize_moov=True)
    m = mp4.parse_mp4(b)
    assert m["duration_ms"] == 2000
    assert m["tracks"][0]["width"] == 640


def test_video_only_and_audio_first_order():
    b = mp4.encode_mp4(320, 240, 1000, audio_codec=None)
    m = mp4.parse_mp4(b)
    assert len(m["tracks"]) == 1 and m["tracks"][0]["handler"] == "vide"

    # audio trak BEFORE video: per-track metadata must not bleed across
    ftyp = b[: int.from_bytes(b[:4], "big")]
    audio = mp4._trak(
        2, 1000, 8000, 8000, "und", b"soun", mp4._audio_entry(b"mp4a", 8000, 1), 0, 0, False
    )
    video = mp4._trak(
        1, 1000, 30000, 30000, "und", b"vide", mp4._visual_entry(b"avc1", 320, 240), 320, 240, False
    )
    swapped = ftyp + mp4._box(b"moov", mp4._mvhd(1000, 1000, False) + audio + video)
    m2 = mp4.parse_mp4(swapped)
    aud, vid = m2["tracks"]
    assert aud["handler"] == "soun" and aud["width"] is None
    assert vid["width"] == 320 and vid["sample_rate"] is None


def test_language_packing():
    for lang in ("und", "eng", "deu", "jpn"):
        b = mp4.encode_mp4(64, 64, 100, lang=lang)
        assert mp4.parse_mp4(b)["tracks"][0]["language"] == lang


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:40],  # truncated mid-moov
        lambda b: b[:-3],  # last box short of its declared size
        lambda b: b + b"\x00\x00\x00\x05voyd",  # trailing box, size < header
        lambda b: b"\x00" * 12,  # no ftyp
    ],
)
def test_malformed_raises_typed_error(mutate):
    good = mp4.encode_mp4(640, 360, 1000)
    with pytest.raises(mp4.MP4Error):
        mp4.parse_mp4(mutate(good))


def test_zero_timescale_and_empty_stsd_raise():
    b = bytearray(mp4.encode_mp4(640, 360, 1000))
    i = bytes(b).find(b"mvhd")
    b[i + 4 + 12 : i + 4 + 16] = b"\x00\x00\x00\x00"  # mvhd timescale = 0
    with pytest.raises(mp4.MP4Error):
        mp4.parse_mp4(bytes(b))

    b2 = bytearray(mp4.encode_mp4(640, 360, 1000))
    j = bytes(b2).find(b"stsd")
    b2[j + 8 : j + 12] = b"\x00\x00\x00\x00"  # entry_count = 0
    with pytest.raises(mp4.MP4Error):
        mp4.parse_mp4(bytes(b2))


def test_no_moov_raises():
    good = mp4.encode_mp4(640, 360, 1000)
    ftyp_len = int.from_bytes(good[:4], "big")
    with pytest.raises(mp4.MP4Error):
        mp4.parse_mp4(good[:ftyp_len])


def test_stsd_declared_entry_but_no_bytes_raises_mp4error():
    """stsd with entry_count>=1 but zero entry bytes used to leak a
    raw StopIteration past the MP4Error quarantine catch (round-6
    self-review) — it must be the typed error."""
    good = mp4.encode_mp4(320, 240, 1000, audio_codec=None)
    i = good.find(b"stsd")
    # keep the stsd header (ver/flags + entry_count) but drop the
    # entry bytes; shrink every enclosing box size accordingly
    stsd_size = int.from_bytes(good[i - 4 : i], "big")
    cut = stsd_size - 16  # bytes removed (entry), keep 8 hdr + 8 body
    out = bytearray(good[: i + 12] + good[i - 4 + stsd_size :])
    out[i - 4 : i] = (16).to_bytes(4, "big")
    # fix ancestors: moov > trak > mdia > minf > stbl sizes
    for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        j = bytes(out).find(tag)
        size = int.from_bytes(out[j - 4 : j], "big")
        out[j - 4 : j] = (size - cut).to_bytes(4, "big")
    with pytest.raises(mp4.MP4Error, match="stsd entry missing"):
        mp4.parse_mp4(bytes(out))


class TestSampleTables:
    """parse_mp4_samples / encode_mp4_mjpeg: the stbl walk (r8)."""

    def _mk(self, n=5, w=48, h=32, spc=2, se=2):
        import numpy as np

        from aoseventstreamer_spark.functions.jpeg import encode_jpeg
        from aoseventstreamer_spark.functions.mp4 import encode_mp4_mjpeg

        frames = [
            encode_jpeg(np.full((h, w), (37 + i * 89) % 256, np.uint8), quality=95)
            for i in range(n)
        ]
        return frames, encode_mp4_mjpeg(
            frames, w, h, samples_per_chunk=spc, sync_every=se
        )

    def test_sample_ranges_roundtrip_exactly(self):
        from aoseventstreamer_spark.functions.mp4 import parse_mp4_samples

        frames, b = self._mk()
        m = parse_mp4_samples(b)
        assert m["codec"] == "jpeg" and m["n_samples"] == 5
        for i, (off, sz, sync) in enumerate(m["samples"]):
            assert b[off : off + sz] == frames[i]
            assert sync == (i % 2 == 0)

    def test_short_final_chunk_and_single_chunk(self):
        from aoseventstreamer_spark.functions.mp4 import parse_mp4_samples

        # n=5 spc=2 -> chunks [2,2,1]: two stsc runs
        _, b = self._mk(n=5, spc=2)
        assert parse_mp4_samples(b)["n_samples"] == 5
        # n=4 spc=2 -> uniform runs
        _, b = self._mk(n=4, spc=2)
        assert parse_mp4_samples(b)["n_samples"] == 4
        # one big chunk
        _, b = self._mk(n=5, spc=99)
        assert parse_mp4_samples(b)["n_samples"] == 5

    def test_missing_stss_means_all_sync(self):
        from aoseventstreamer_spark.functions.mp4 import parse_mp4_samples

        _, b = self._mk(se=1)
        assert all(s[2] for s in parse_mp4_samples(b)["samples"])

    def test_out_of_bounds_sample_quarantines(self):
        import pytest

        from aoseventstreamer_spark.functions.mp4 import (
            MP4Error,
            parse_mp4_samples,
        )

        _, b = self._mk()
        # corrupt the first stco offset to point past EOF
        i = b.find(b"stco")
        broken = bytearray(b)
        broken[i + 12 : i + 16] = (len(b) + 1000).to_bytes(4, "big")
        with pytest.raises(MP4Error, match="beyond file end"):
            parse_mp4_samples(bytes(broken))

    def test_metadata_only_mp4_has_no_sample_table(self):
        import pytest

        from aoseventstreamer_spark.functions.mp4 import (
            MP4Error,
            encode_mp4,
            parse_mp4_samples,
        )

        with pytest.raises(MP4Error, match="stsz|sample table"):
            parse_mp4_samples(encode_mp4(64, 48, 1000))

    def test_sample_frames_emits_real_mp4_keyframes(self, spark):
        """The sample_frames MP4 branch: sync samples come back as
        standalone decodable JPEGs, matching the AVI leg."""
        import numpy as np

        from aoseventstreamer_spark.functions.jpeg import decode_jpeg
        from aoseventstreamer_spark.operators.multimodal import (
            sample_frames,
            wrap_as_mjpeg_mp4,
        )

        # id=3: n=5 frames, sync_every=2 -> sync samples 0,2,4
        docs = spark.createDataFrame([(3,)], "doc_id long")
        rows = sample_frames(wrap_as_mjpeg_mp4(docs), max_frames=4).collect()
        assert 1 <= len(rows) <= 4
        for r in rows:
            px = decode_jpeg(bytes(r.frame_payload))
            vals = np.unique(px)
            assert len(vals) == 1  # a real decoded solid frame
