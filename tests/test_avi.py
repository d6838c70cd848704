"""functions/avi.py: MJPEG-in-AVI container — real video FRAME decode
through functions/jpeg.py, roundtripped against the in-module encoder,
typed quarantine, and the Spark wrap/extract plumbing (r7)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aoseventstreamer_spark.functions.avi import (
    AVIError,
    decode_avi_frames,
    encode_avi_mjpeg,
    parse_avi,
)
from aoseventstreamer_spark.functions.jpeg import encode_jpeg


def _solid(g, h=16, w=16):
    return encode_jpeg(np.full((h, w), g, np.uint8), quality=95)


def test_roundtrip_meta_and_pixels():
    colors = [0, 40, 128, 220, 255]
    blob = encode_avi_mjpeg([_solid(c) for c in colors], 16, 16, 40000)
    m = parse_avi(blob)
    assert (m["width"], m["height"], m["n_frames"]) == (16, 16, 5)
    assert m["duration_ms"] == 200 and m["handler"] == "MJPG"
    _, decoded = decode_avi_frames(blob)
    for (i, px), c in zip(decoded, colors):
        assert px.shape == (16, 16)
        # solid-gray q95 frames invert EXACTLY (DC-only, q00=2 divides
        # 8*(g-128)) — the property q_video_frames' oracle relies on
        assert np.array_equal(px, np.full((16, 16), c, np.uint8)), c


def test_solid_gray_q95_exact_for_every_level():
    # the full 0..255 sweep of the exactness claim
    for g in range(0, 256, 17):
        blob = encode_avi_mjpeg([_solid(g, 8, 8)], 8, 8)
        _, [(_, px)] = decode_avi_frames(blob)
        assert int(px[0, 0]) == g and len(np.unique(px)) == 1


def test_frame_sampling_and_rgb_frames():
    rgb = np.zeros((16, 16, 3), np.uint8)
    rgb[:, :, 0] = 200
    frames = [_solid(10), encode_jpeg(rgb, quality=95), _solid(30)]
    blob = encode_avi_mjpeg(frames, 16, 16)
    _, picked = decode_avi_frames(blob, [2, 0])
    assert [i for i, _ in picked] == [2, 0]
    _, [(_, px)] = decode_avi_frames(blob, [1])
    assert px.ndim == 3  # RGB frame decodes to (h, w, 3)
    with pytest.raises(AVIError, match="out of range"):
        decode_avi_frames(blob, [3])


def test_empty_video():
    blob = encode_avi_mjpeg([], 16, 16)
    m = parse_avi(blob)
    assert m["n_frames"] == 0 and m["duration_ms"] == 0
    assert decode_avi_frames(blob)[1] == []


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],                        # cut RIFF header
        lambda b: b[:60],                        # cut inside hdrl
        lambda b: b"RIFX" + b[4:],               # wrong magic
        lambda b: b.replace(b"vids", b"auds", 1),  # first stream not video
        lambda b: b.replace(b"avih", b"avix", 1),  # missing main header
        lambda b: b[:-12],                       # truncated idx1
    ],
)
def test_malformed_raises_typed(mutate):
    blob = encode_avi_mjpeg([_solid(50)], 16, 16)
    with pytest.raises(AVIError):
        parse_avi(mutate(blob))


def test_frame_count_mismatch_raises():
    blob = bytearray(encode_avi_mjpeg([_solid(50), _solid(60)], 16, 16))
    # corrupt dwTotalFrames in avih (offset: find 'avih' + 8 + 16)
    at = blob.find(b"avih") + 8 + 16
    blob[at:at + 4] = (9).to_bytes(4, "little")
    with pytest.raises(AVIError, match="declares 9 frames"):
        parse_avi(bytes(blob))


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_parser_never_raises_untyped(blob):
    try:
        parse_avi(blob)
    except AVIError:
        pass


def test_wrap_extract_video_frames(spark):
    from aoseventstreamer_spark.operators.multimodal import (
        extract_video_frames,
        wrap_as_video,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (29, "c")], "doc_id long, text string"
    )
    rows = extract_video_frames(wrap_as_video(df)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.media_id, []).append(r)
    # doc 29 quarantines as one typed row
    assert len(by_doc[29]) == 1 and by_doc[29][0].err == "AVIError"
    # doc 1: 2 frames of 32x32, usec 40000
    f1 = sorted(by_doc[1], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in f1] == [0, 1]
    assert all((r.width, r.height) == (32, 32) for r in f1)
    assert f1[0].duration_ms == 2 * 40000 // 1000
    assert [r.gray for r in f1] == [(37 + i * 89) % 256 for i in range(2)]
    assert all(r.n_px == 32 * 32 for r in f1)


def test_sniff_header_types_avi_by_content():
    from aoseventstreamer_spark.operators.multimodal import sniff_header

    blob = encode_avi_mjpeg([_solid(77)] * 4, 32, 16, 25000)
    assert sniff_header(blob) == ("video/x-msvideo", 32, 16, 100)
    # truncated: mime-only, never raises (WAV stays unaffected)
    assert sniff_header(blob[:40]) == ("video/x-msvideo", None, None, None)


def test_sample_frames_emits_real_avi_keyframes(spark):
    """sample_frames on an MJPEG AVI yields the standalone JPEGs the
    container carries (decodable, evenly spaced), not byte slices —
    and corrupt AVI payloads fall back to slices, never failing."""
    from aoseventstreamer_spark.functions.jpeg import decode_jpeg
    from aoseventstreamer_spark.operators.multimodal import sample_frames

    colors = [10, 60, 110, 160, 210, 250]
    blob = encode_avi_mjpeg([_solid(c) for c in colors], 16, 16)
    media = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(blob[:30]))],
        "media_id long, payload binary",
    )
    out = sample_frames(media, max_frames=3).collect()
    mine = sorted(
        (r.frame_idx, bytes(r.frame_payload)) for r in out if r.media_id == 1
    )
    assert [i for i, _ in mine] == [0, 1, 2]
    # evenly spaced: frames 0, 2, 4 of the 6 -> colors 10, 110, 210
    got = [int(decode_jpeg(p)[0, 0]) for _, p in mine]
    assert got == [10, 110, 210]
    # the corrupt row fell back to byte slices without failing
    assert any(r.media_id == 2 for r in out)
