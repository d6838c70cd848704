"""GIF codec tests (functions/gif.py): exact round-trip for ≤256-color
images, LZW width-growth and table-overflow boundaries (adversarial
high-entropy inputs force both), interlace handling, sub-256 screens,
quantization determinism, and the multimodal sniff/codec agreement."""

from __future__ import annotations

import numpy as np
import pytest

from aoseventstreamer_spark.functions import gif


def _rng(seed=0):
    return np.random.RandomState(seed)


def test_roundtrip_small_flat_image():
    arr = np.zeros((5, 7, 3), dtype=np.uint8)
    arr[:, :, 0] = 200
    out = gif.decode_gif(gif.encode_gif(arr))
    assert np.array_equal(out, arr)


def test_roundtrip_palette_image_crosses_width_growth():
    # 200 distinct colors over a 64x64 image: the LZW dictionary grows
    # through several code widths; any encoder/decoder width desync
    # corrupts pixels at the first boundary
    r = _rng(1)
    palette = r.randint(0, 255, size=(200, 3)).astype(np.uint8)
    idx = r.randint(0, 200, size=(64, 64))
    arr = palette[idx]
    out = gif.decode_gif(gif.encode_gif(arr))
    assert np.array_equal(out, arr)


def test_roundtrip_high_entropy_crosses_table_overflow():
    # 256 colors, 256x256 random pixels: the 4096-entry table overflows
    # repeatedly, exercising the clear-code reset path on both sides
    r = _rng(2)
    palette = r.randint(0, 255, size=(256, 3)).astype(np.uint8)
    idx = r.randint(0, 256, size=(256, 256))
    arr = palette[idx]
    enc = gif.encode_gif(arr)
    out = gif.decode_gif(enc)
    assert np.array_equal(out, arr)


def test_roundtrip_two_color_min_code_floor():
    # 2 colors -> GIF's minimum code size floor of 2 must apply
    r = _rng(3)
    arr = np.where(
        r.randint(0, 2, size=(31, 17, 1)).astype(bool),
        np.uint8(255),
        np.uint8(0),
    ) * np.ones((1, 1, 3), dtype=np.uint8)
    out = gif.decode_gif(gif.encode_gif(arr.astype(np.uint8)))
    assert np.array_equal(out, arr)


def test_quantization_is_deterministic_and_332():
    r = _rng(4)
    arr = r.randint(0, 255, size=(40, 40, 3)).astype(np.uint8)  # >256 colors
    e1, e2 = gif.encode_gif(arr), gif.encode_gif(arr)
    assert e1 == e2
    out = gif.decode_gif(e1)
    assert np.array_equal(out[:, :, 0], arr[:, :, 0] >> 5 << 5)
    assert np.array_equal(out[:, :, 1], arr[:, :, 1] >> 5 << 5)
    assert np.array_equal(out[:, :, 2], arr[:, :, 2] >> 6 << 6)


def test_interlaced_image_decodes_to_display_order():
    # build an interlaced GIF by hand: encode normally, then flip the
    # interlace flag and reorder the index rows into pass order
    arr = np.arange(8 * 4 * 3, dtype=np.uint8).reshape(8, 4, 3) % 16 * 16
    plain = bytearray(gif.encode_gif(arr))
    # image descriptor sits right after header+LSD+GCT
    n_gct = 2 << (plain[10] & 0x07)
    desc = 13 + 3 * n_gct
    assert plain[desc] == 0x2C
    # decode the plain stream's indices, reorder rows into pass order,
    # re-encode the data stream with the interlace bit set
    decoded = gif.decode_gif(bytes(plain))
    pass_rows = [
        r
        for start, step in gif.INTERLACE_PASSES
        for r in range(start, 8, step)
    ]
    reordered = decoded[pass_rows]
    inter = bytearray(gif.encode_gif(reordered))
    inter[desc + 9] |= 0x40  # set the interlace flag
    out = gif.decode_gif(bytes(inter))
    assert np.array_equal(out, decoded)


def test_garbage_and_truncation_raise_giferror():
    with pytest.raises(gif.GIFError):
        gif.decode_gif(b"not a gif at all")
    good = gif.encode_gif(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(gif.GIFError):
        gif.decode_gif(good[: len(good) // 2])


def test_sniff_header_agrees_with_codec():
    from aoseventstreamer_spark.operators.multimodal import sniff_header

    arr = np.zeros((6, 9, 3), dtype=np.uint8)
    mime, w, h, _ = sniff_header(gif.encode_gif(arr))
    assert (mime, w, h) == ("image/gif", 9, 6)


def test_resize_images_uses_real_gif_pixels(spark):
    """Integration: a GIF payload through the multimodal resize pass
    comes back as a DECODABLE GIF at the target geometry whose pixels
    equal the direct decode→resample→quantize chain exactly (the
    whole path is deterministic — no DCT noise as in JPEG)."""
    from aoseventstreamer_spark.functions import png as PNG
    from aoseventstreamer_spark.operators import multimodal as MM

    r = _rng(7)
    palette = r.randint(0, 255, size=(64, 3)).astype(np.uint8)
    rgb = palette[r.randint(0, 64, size=(32, 64))]
    payload = gif.encode_gif(rgb)
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = MM.resize_images(media, max_side=16).collect()[0]
    assert (row.width, row.height) == (16, 8)
    out = gif.decode_gif(bytes(row.payload))
    assert out.shape == (8, 16, 3)
    direct = PNG.resize_bilinear(rgb, 16, 8)
    expect = gif.decode_gif(gif.encode_gif(direct))  # same quantization
    assert np.array_equal(out, expect)


# ----------------------------------------------------------- animation


def test_animation_frames_composite_disposals():
    """3-frame animation exercising all three disposal methods:
    frame 1 full red screen (disposal 1 = leave), frame 2 a blue patch
    (disposal 2 = restore background under the patch), frame 3 a green
    patch (disposal 3 is irrelevant for the last frame)."""
    red = np.full((4, 6, 3), [200, 0, 0], dtype=np.uint8)
    blue = np.full((2, 2, 3), [0, 0, 200], dtype=np.uint8)
    green = np.full((1, 3, 3), [0, 200, 0], dtype=np.uint8)
    data = gif.encode_gif_animation(
        (6, 4),
        [
            (0, 0, red, 1, None),
            (1, 1, blue, 2, None),
            (2, 0, green, 0, None),
        ],
        bg_color=(10, 10, 10),
    )
    f = gif.decode_gif_frames(data)
    assert len(f) == 3
    assert np.array_equal(f[0], red)
    # frame 2: red screen with the blue patch at (1,1)
    want1 = red.copy()
    want1[1:3, 1:3] = [0, 0, 200]
    assert np.array_equal(f[1], want1)
    # frame 3: disposal 2 restored the patch area to BACKGROUND, then
    # green painted at (0,2)
    want2 = red.copy()
    want2[1:3, 1:3] = [10, 10, 10]
    want2[0, 2:5] = [0, 200, 0]
    assert np.array_equal(f[2], want2)


def test_animation_transparency_keeps_canvas():
    base = np.full((3, 3, 3), [50, 60, 70], dtype=np.uint8)
    overlay = np.full((3, 3, 3), [200, 0, 0], dtype=np.uint8)
    mask = np.zeros((3, 3), dtype=bool)
    mask[1, 1] = True  # center pixel transparent -> base shows through
    data = gif.encode_gif_animation(
        (3, 3), [(0, 0, base, 1, None), (0, 0, overlay, 0, mask)]
    )
    f = gif.decode_gif_frames(data)
    want = overlay.copy()
    want[1, 1] = [50, 60, 70]
    assert np.array_equal(f[1], want)


def test_animation_disposal_previous_restores():
    a = np.full((2, 2, 3), [1, 2, 3], dtype=np.uint8)
    b = np.full((1, 1, 3), [200, 200, 0], dtype=np.uint8)
    c = np.full((1, 1, 3), [0, 200, 200], dtype=np.uint8)
    data = gif.encode_gif_animation(
        (2, 2),
        [(0, 0, a, 1, None), (0, 0, b, 3, None), (1, 1, c, 0, None)],
    )
    f = gif.decode_gif_frames(data)
    # frame 3: b's pixel was RESTORED to a (disposal 3), c painted
    want = a.copy()
    want[1, 1] = [0, 200, 200]
    assert np.array_equal(f[2], want)


def test_decode_frames_max_frames_stops_early():
    items = [
        (0, 0, np.full((2, 2, 3), [i * 30, 0, 0], dtype=np.uint8), 1, None)
        for i in range(5)
    ]
    data = gif.encode_gif_animation((2, 2), items)
    assert len(gif.decode_gif_frames(data, max_frames=2)) == 2
    assert len(gif.decode_gif_frames(data)) == 5


def test_sample_frames_extracts_real_gif_frames(spark):
    """Integration: an animated-GIF payload through sample_frames
    yields one decodable single-frame GIF per composited frame —
    the byte-slice stand-in no longer applies to GIFs."""
    from aoseventstreamer_spark.operators import multimodal as MM

    red = np.full((4, 4, 3), [200, 0, 0], dtype=np.uint8)
    blue = np.full((2, 2, 3), [0, 0, 200], dtype=np.uint8)
    data = gif.encode_gif_animation(
        (4, 4), [(0, 0, red, 1, None), (1, 1, blue, 0, None)]
    )
    media = spark.createDataFrame(
        [(7, bytearray(data))], "media_id long, payload binary"
    )
    rows = sorted(
        MM.sample_frames(media, max_frames=4).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in rows] == [0, 1]
    f0 = gif.decode_gif(bytes(rows[0].frame_payload))
    f1 = gif.decode_gif(bytes(rows[1].frame_payload))
    assert np.array_equal(f0, red)
    want1 = red.copy()
    want1[1:3, 1:3] = [0, 0, 200]
    assert np.array_equal(f1, want1)


def test_out_of_screen_frame_raises_giferror_not_valueerror():
    """A frame rectangle past the logical screen must surface as
    GIFError (the fallback contract sample_frames/resize rely on),
    never a raw numpy shape error that would kill the Spark task."""
    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(gif.encode_gif(arr))
    n_gct = 2 << (data[10] & 0x07)
    desc = 13 + 3 * n_gct
    assert data[desc] == 0x2C
    data[desc + 1 : desc + 3] = (3).to_bytes(2, "little")  # left=3, w=4
    with pytest.raises(gif.GIFError, match="outside logical screen"):
        gif.decode_gif(bytes(data))
    with pytest.raises(gif.GIFError, match="outside logical screen"):
        gif.decode_gif_frames(bytes(data))


def test_animation_full_332_palette_with_transparency_degrades():
    """All 256 quantized 3-3-2 colors + a transparency mask: the
    encoder must reserve the transparent slot by dropping the
    least-used color (ADVICE r5 — it used to raise GIFError, making
    sufficiently colorful animations unencodable)."""
    import numpy as np

    # 16x16 patch containing every 3-3-2 representative exactly once
    cols = [
        (r << 5, g << 5, b << 6)
        for r in range(8) for g in range(8) for b in range(4)
    ]
    patch = np.array(cols, dtype=np.uint8).reshape(16, 16, 3)
    mask = np.zeros((16, 16), dtype=bool)
    mask[0, 0] = True  # one transparent pixel over the background
    data = gif.encode_gif_animation((16, 16), [(0, 0, patch, 1, mask)])
    [f] = gif.decode_gif_frames(data)
    # transparent pixel shows the background (black)
    assert tuple(f[0, 0]) == (0, 0, 0)
    # every opaque pixel decodes to a palette color within one
    # quantization step of its source (the single dropped color maps
    # to its nearest survivor; all others are exact)
    src = patch.astype(int)
    out = f.astype(int)
    diffs = np.abs(src - out).sum(axis=2)
    diffs[0, 0] = 0  # masked pixel excluded
    assert (diffs == 0).sum() >= 16 * 16 - 2  # at most the dropped color moved
    assert diffs.max() <= 3 * 64  # nearest-survivor remap stays local
