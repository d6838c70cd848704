"""functions/audio.py: FLAC STREAMINFO + MP3 Layer III frame walk —
roundtrip against the in-module encoders (the repo's codec
discipline), strict-parser quarantine on malformed/truncated input,
and the Spark-side wrap/extract plumbing (VERDICT r6 item 2)."""

from __future__ import annotations

import pytest

from aoseventstreamer_spark.functions.audio import (
    FLACError,
    MP3Error,
    encode_flac,
    encode_mp3,
    parse_flac,
    parse_mp3,
)


# --------------------------------------------------------------------- FLAC

def test_flac_roundtrip_basic():
    b = encode_flac(44100, 2, 16, 44100 * 3)
    m = parse_flac(b)
    assert m["sample_rate"] == 44100
    assert m["channels"] == 2
    assert m["bits_per_sample"] == 16
    assert m["total_samples"] == 44100 * 3
    assert m["duration_ms"] == 3000
    assert m["n_metadata_blocks"] == 1


def test_flac_roundtrip_extremes_and_blocks():
    # 20-bit rate field ceiling, 8 channels, 32-bit depth, 36-bit count
    b = encode_flac(
        (1 << 20) - 1, 8, 32, (1 << 36) - 1, vendor="v", padding=128
    )
    m = parse_flac(b)
    assert m["sample_rate"] == (1 << 20) - 1
    assert m["channels"] == 8
    assert m["bits_per_sample"] == 32
    assert m["total_samples"] == (1 << 36) - 1
    assert m["n_metadata_blocks"] == 3  # STREAMINFO + VORBIS + PADDING


def test_flac_unknown_length_duration_is_none():
    m = parse_flac(encode_flac(48000, 1, 24, 0))
    assert m["total_samples"] == 0 and m["duration_ms"] is None


def test_flac_duration_integer_floor():
    # 44100 samples + 1 at 44100 Hz -> 1000 ms floor
    assert parse_flac(encode_flac(44100, 1, 16, 44101))["duration_ms"] == 1000


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:3],                      # cut magic
        lambda b: b"xLaC" + b[4:],            # wrong magic
        lambda b: b[:6],                      # cut block header
        lambda b: b[:20],                     # cut STREAMINFO body
        lambda b: b[:4] + b"\x84\x00\x00\x04" + b"\x00" * 4,  # first != SI
        lambda b: b[:4] + b"\x80\x00\x00\x20" + b[8:],  # SI length 32 != 34
    ],
)
def test_flac_malformed_raises_typed(mutate):
    b = encode_flac(44100, 2, 16, 1000)
    with pytest.raises(FLACError):
        parse_flac(mutate(b))


def test_flac_zero_sample_rate_rejected():
    b = bytearray(encode_flac(1, 1, 16, 0))
    # zero out the 20-bit rate field (top 2.5 bytes of the packed 8)
    b[18] = b[19] = 0
    b[20] &= 0x0F
    with pytest.raises(FLACError, match="sample rate"):
        parse_flac(bytes(b))


# ---------------------------------------------------------------------- MP3

def test_mp3_roundtrip_mpeg1():
    b = encode_mp3(n_frames=10, bitrate_idx=9, samplerate_idx=0, mode=0)
    m = parse_mp3(b)
    assert m["version"] == "MPEG1" and m["layer"] == 3
    assert m["bitrate_kbps"] == 128 and m["sample_rate"] == 44100
    assert m["mode"] == "stereo" and m["channels"] == 2
    assert m["n_frames"] == 10 and m["n_samples"] == 11520
    assert m["duration_ms"] == 11520 * 1000 // 44100
    assert not m["id3v2"] and not m["id3v1"]


def test_mp3_roundtrip_mpeg2_mono_with_tags():
    b = encode_mp3(
        n_frames=7, bitrate_idx=3, samplerate_idx=2, mode=3,
        mpeg2=True, id3v2_size=77, id3v1=True,
    )
    m = parse_mp3(b)
    assert m["version"] == "MPEG2"
    assert m["bitrate_kbps"] == 24 and m["sample_rate"] == 16000
    assert m["mode"] == "mono" and m["channels"] == 1
    assert m["n_samples"] == 7 * 576
    assert m["id3v2"] and m["id3v1"]


def test_mp3_padding_cadence_both_phases():
    # per-frame padding alternation must not derail the frame walk
    for phase in (0, 1):
        b = encode_mp3(4, bitrate_idx=9, samplerate_idx=0, pad_phase=phase)
        assert parse_mp3(b)["n_frames"] == 4


def test_mp3_empty_id3v2_body():
    b = encode_mp3(2, 1, 0, id3v2_size=0)
    m = parse_mp3(b)
    assert m["id3v2"] and m["n_frames"] == 2


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:-1],                     # truncated final frame
        lambda b: b + b"\x00",                # trailing garbage byte
        lambda b: b"ID3\x04\x00\x00" + b"\x7f" * 4 + b,  # ID3 overflow
        lambda b: b"\x00" + b,                # no sync at 0
        lambda b: b[:1],                      # lone 0xFF
    ],
)
def test_mp3_malformed_raises_typed(mutate):
    b = encode_mp3(3, bitrate_idx=9, samplerate_idx=0)
    with pytest.raises(MP3Error):
        parse_mp3(mutate(b))


def test_mp3_reserved_indices_raise():
    b = bytearray(encode_mp3(1, bitrate_idx=9, samplerate_idx=0))
    bad_bitrate = bytes(b[:2]) + bytes([0xF0 | (b[2] & 0x0F)]) + bytes(b[3:])
    with pytest.raises(MP3Error):
        parse_mp3(bad_bitrate)
    bad_rate = bytes(b[:2]) + bytes([(b[2] & 0xF0) | 0x0C | (b[2] & 0x02)]) + bytes(b[3:])
    with pytest.raises(MP3Error):
        parse_mp3(bad_rate)


def test_mp3_empty_and_id3_only_raise():
    with pytest.raises(MP3Error):
        parse_mp3(b"")
    with pytest.raises(MP3Error, match="no frames"):
        parse_mp3(b"ID3\x04\x00\x00" + b"\x00" * 4)


def test_mp3_samplerate_change_midstream_raises():
    a = encode_mp3(1, bitrate_idx=9, samplerate_idx=0)
    c = encode_mp3(1, bitrate_idx=9, samplerate_idx=1)
    with pytest.raises(MP3Error, match="changed mid-stream"):
        parse_mp3(a + c)


def test_mp3_varying_bitrate_is_legal_vbr():
    a = encode_mp3(1, bitrate_idx=9, samplerate_idx=0)
    c = encode_mp3(1, bitrate_idx=14, samplerate_idx=0)
    m = parse_mp3(a + c)
    assert m["n_frames"] == 2
    assert m["bitrate_kbps"] == 128  # first frame's


# ------------------------------------------------------------- sniff_header

def test_sniff_header_types_audio_by_content():
    from aoseventstreamer_spark.operators.multimodal import sniff_header

    fl = encode_flac(48000, 2, 16, 48000)
    assert sniff_header(fl) == ("audio/flac", None, None, 1000)
    mp = encode_mp3(5, bitrate_idx=9, samplerate_idx=0)
    mime, w, h, d = sniff_header(mp)
    assert mime == "audio/mpeg" and d == 5 * 1152 * 1000 // 44100
    # malformed degrades to mime-only, never raises
    assert sniff_header(fl[:9]) == ("audio/flac", None, None, None)
    assert sniff_header(mp[:9]) == ("audio/mpeg", None, None, None)


# --------------------------------------------------------------- Spark side

def test_wrap_extract_audio_meta_quarantine(spark):
    from aoseventstreamer_spark.operators.multimodal import (
        extract_audio_meta,
        wrap_as_audio,
    )

    rows = [(i, "x" * (i % 50 + 1)) for i in range(0, 60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.media_id: r for r in extract_audio_meta(wrap_as_audio(df)).collect()}
    assert len(out) == 60
    # quarantined rows: 0 (FLAC), 19 (MP3), 38 (FLAC), 57 (MP3)
    assert out[0].err == "FLACError" and out[0].container is None
    assert out[19].err == "MP3Error" and out[19].sample_rate is None
    assert out[38].err == "FLACError"
    assert out[57].err == "MP3Error"
    # a live FLAC row: doc_id=2 -> k=1
    assert out[2].container == "flac"
    assert out[2].sample_rate == 16000 and out[2].channels == 2
    assert out[2].bits_per_sample == 12 and out[2].bitrate_kbps is None
    # a live MP3 row: doc_id=1 -> k=0, MPEG1, idx1=32kbps, 44100, stereo
    assert out[1].container == "mp3"
    assert out[1].bitrate_kbps == 32 and out[1].sample_rate == 44100
    assert out[1].channels == 2 and out[1].bits_per_sample is None
    assert out[1].n_samples == 2 * 1152  # n_frames = 1 % 40 + 1


def test_wrap_extract_audio_evidence_known_values(spark):
    from aoseventstreamer_spark.operators.multimodal import (
        extract_audio_evidence,
        wrap_as_wav,
    )

    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (23, "z")], "doc_id long, text string"
    )
    out = {r.media_id: r for r in extract_audio_evidence(wrap_as_wav(df)).collect()}
    # doc 23 is the truncation row: null evidence, no task failure
    assert out[23].sum_sq is None and out[23].sample_rate is None
    # doc 1: nf=5, ch=2, rate=16000 — recompute evidence in pure Python
    nf, ch = 5, 2
    vals = [
        ((1 * 31 + i * 17 + c * 11) % 4001) - 2000
        for i in range(nf)
        for c in range(ch)
    ]
    mono = [
        sum(((1 * 31 + i * 17 + c * 11) % 4001) - 2000 for c in range(ch))
        for i in range(nf)
    ]
    flips = sum(
        1 for a, b in zip(mono, mono[1:]) if (a < 0) != (b < 0)
    )
    r = out[1]
    assert (r.sample_rate, r.n_channels, r.n_frames) == (16000, 2, 5)
    assert r.sum_sq == sum(v * v for v in vals)
    assert r.peak == max(abs(v) for v in vals)
    assert r.sign_changes == flips
    assert r.duration_ms == nf * 1000 // 16000


# ------------------------------------------------------------------ fuzzing

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_parsers_never_raise_untyped(blob):
    """Screen-everything contract: ANY byte string either parses or
    raises the TYPED error — no IndexError/struct.error/KeyError can
    escape to kill a 1000-executor stage."""
    for fn, err in ((parse_flac, FLACError), (parse_mp3, MP3Error)):
        try:
            fn(blob)
        except err:
            pass


@settings(max_examples=120, deadline=None)
@given(
    st.integers(1, (1 << 20) - 1),
    st.integers(1, 8),
    st.integers(4, 32),
    st.integers(0, (1 << 36) - 1),
    st.integers(0, 400),
)
def test_flac_roundtrip_property(rate, ch, bits, total, cut):
    b = encode_flac(rate, ch, bits, total)
    m = parse_flac(b)
    assert (m["sample_rate"], m["channels"], m["bits_per_sample"],
            m["total_samples"]) == (rate, ch, bits, total)
    if cut < len(b):
        trunc = b[:cut]
        try:
            parse_flac(trunc)
        except FLACError:
            pass


@settings(max_examples=120, deadline=None)
@given(
    st.integers(1, 30),
    st.integers(1, 14),
    st.integers(0, 2),
    st.integers(0, 3),
    st.booleans(),
    st.booleans(),
    st.booleans(),
)
def test_mp3_roundtrip_property(n, br, sr, mode, mpeg2, id3v2, id3v1):
    b = encode_mp3(
        n, br, sr, mode=mode, mpeg2=mpeg2,
        id3v2_size=33 if id3v2 else None, id3v1=id3v1,
    )
    m = parse_mp3(b)
    assert m["n_frames"] == n
    assert m["version"] == ("MPEG2" if mpeg2 else "MPEG1")
    assert m["channels"] == (1 if mode == 3 else 2)
    assert m["id3v2"] == id3v2 and m["id3v1"] == id3v1
    # any strict prefix that cuts INTO the frame region must raise typed
    trunc = b[: len(b) - (129 if id3v1 else 1)]
    try:
        parse_mp3(trunc)
    except MP3Error:
        pass


# ----------------------------------------------------- FLAC frame codec

def test_flac_pcm_roundtrip_matrix():
    import numpy as np

    from aoseventstreamer_spark.functions.audio import (
        decode_flac_pcm,
        encode_flac_pcm,
    )

    rng = np.random.RandomState(7)
    cases = [
        # (samples, rate, bps, kwargs) — each exercises a decode path
        ((np.arange(1000) % 997 - 500)[:, None], 44100, 16, {}),  # FIXED
        (np.full((9000, 2), -123), 8000, 16, {}),  # CONSTANT, multiblock
        (rng.randint(-128, 128, (700, 1)), 16000, 8, {}),  # 8-bit noise
        (rng.randint(-(1 << 22), 1 << 22, (500, 1)), 96000, 24, {}),  # 24b
        (rng.randint(-100, 100, (800, 2)) * 16, 22050, 16,
         {"stereo_mode": "independent"}),  # wasted bits
        ((np.arange(1000) % 997 - 500)[:, None], 44100, 16,
         {"subframe_type": "lpc1"}),  # quantized-LPC path
        ((np.arange(500) % 97 - 48)[:, None], 44100, 16,
         {"subframe_type": "verbatim"}),  # VERBATIM
        (np.zeros((0, 2), dtype=np.int64), 44100, 16, {}),  # empty
    ]
    for samples, rate, bps, kw in cases:
        samples = np.asarray(samples, dtype=np.int64)
        blob = encode_flac_pcm(samples, rate, bits_per_sample=bps, **kw)
        got_rate, got_ch, got = decode_flac_pcm(blob)
        assert got_rate == rate
        assert np.array_equal(got, samples.reshape(-1, samples.shape[-1])), kw


def test_flac_pcm_mid_side_exact():
    import numpy as np

    from aoseventstreamer_spark.functions.audio import (
        decode_flac_pcm,
        encode_flac_pcm,
    )

    rng = np.random.RandomState(3)
    l = rng.randint(-3000, 3000, 5000).astype(np.int64)
    r = l + rng.randint(-20, 20, 5000)  # correlated -> m/s wins
    st = np.stack([l, r], axis=1)
    auto = encode_flac_pcm(st, 48000)
    forced = encode_flac_pcm(st, 48000, stereo_mode="ms")
    indep = encode_flac_pcm(st, 48000, stereo_mode="independent")
    assert np.array_equal(decode_flac_pcm(auto)[2], st)
    assert np.array_equal(decode_flac_pcm(forced)[2], st)
    assert np.array_equal(decode_flac_pcm(indep)[2], st)
    assert len(forced) < len(indep)  # the decorrelation actually pays


def test_flac_pcm_compresses():
    import numpy as np

    from aoseventstreamer_spark.functions.audio import encode_flac_pcm

    s = (np.arange(1000) % 997 - 500).astype(np.int64)[:, None]
    assert len(encode_flac_pcm(s, 44100)) < s.size * 2 * 0.4


def test_flac_pcm_corruption_typed():
    import numpy as np
    import pytest as _pytest

    from aoseventstreamer_spark.functions.audio import (
        decode_flac_pcm,
        encode_flac_pcm,
    )

    s = (np.arange(400) % 211 - 100).astype(np.int64)[:, None]
    good = encode_flac_pcm(s, 44100)
    hdr_end = len(encode_flac_pcm(np.zeros((0, 1), np.int64), 44100))
    for cut in (len(good) - 1, hdr_end + 3):
        with _pytest.raises(FLACError):
            decode_flac_pcm(good[:cut])
    flipped = bytearray(good)
    flipped[-3] ^= 0xFF  # inside the last frame -> CRC-16 must catch
    with _pytest.raises(FLACError, match="CRC"):
        decode_flac_pcm(bytes(flipped))
    # sample-count mismatch vs STREAMINFO
    with _pytest.raises(FLACError, match="declared"):
        decode_flac_pcm(good + good[hdr_end:])


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 3),
    st.integers(8, 16),
    st.lists(st.integers(-120, 120), min_size=0, max_size=200),
)
def test_flac_pcm_roundtrip_property(ch, bps, flat):
    import numpy as np

    from aoseventstreamer_spark.functions.audio import (
        decode_flac_pcm,
        encode_flac_pcm,
    )

    n = (len(flat) // ch) * ch
    samples = np.asarray(flat[:n], dtype=np.int64).reshape(-1, ch)
    blob = encode_flac_pcm(samples, 44100, bits_per_sample=bps, block_size=64)
    assert np.array_equal(decode_flac_pcm(blob)[2], samples)


def test_mp3_tag_bytes_inside_final_frame_not_stripped():
    """'TAG' landing exactly at end-128 INSIDE the last frame's payload
    must not be mistaken for an ID3v1 trailer (the r7 self-review
    finding): the gapless no-trailer walk is tried first."""
    b = bytearray(encode_mp3(3, bitrate_idx=9, samplerate_idx=0))
    assert len(b) >= 128
    b[len(b) - 128 : len(b) - 125] = b"TAG"
    m = parse_mp3(bytes(b))
    assert m["n_frames"] == 3 and not m["id3v1"]
    # while a REAL trailer (frames end exactly 128 bytes early) is
    # still recognized
    m2 = parse_mp3(encode_mp3(3, bitrate_idx=9, samplerate_idx=0, id3v1=True))
    assert m2["n_frames"] == 3 and m2["id3v1"]


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=300))
def test_flac_frame_decoder_never_raises_untyped(blob):
    """decode_flac_pcm under arbitrary bytes: parse or typed FLACError,
    never an escaping IndexError/struct.error — including inputs that
    pass the STREAMINFO layer but are garbage at the frame layer."""
    from aoseventstreamer_spark.functions.audio import decode_flac_pcm

    try:
        decode_flac_pcm(blob)
    except FLACError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_flac_frame_decoder_garbage_after_valid_header(blob):
    from aoseventstreamer_spark.functions.audio import decode_flac_pcm

    prefix = encode_flac(44100, 2, 16, 0, frame_bytes=0)
    try:
        decode_flac_pcm(prefix + blob)
    except FLACError:
        pass
