"""PNG exotic-profile decode tests (functions/png.py): palette at
every legal depth, sub-byte grayscale scaling, 16-bit samples, Adam7
interlace (all filters, ragged sizes where passes go empty), and the
interlace encoder/decoder round-trip against the plain path."""

from __future__ import annotations

import numpy as np
import pytest

from aoseventstreamer_spark.functions import png as P


def _rng(seed=0):
    return np.random.RandomState(seed)


def test_palette_png_all_depths_lookup_exact():
    r = _rng(1)
    for depth in (1, 2, 4, 8):
        n = 1 << depth
        pal = r.randint(0, 255, size=(n, 3)).astype(np.uint8)
        idx = r.randint(0, n, size=(13, 9))
        out = P.decode_png(P.encode_png_palette(idx, pal, depth))
        assert np.array_equal(out, pal[idx])


def test_sub8_gray_scales_by_exact_factor():
    r = _rng(2)
    for depth in (1, 2, 4):
        mx = (1 << depth) - 1
        a = r.randint(0, mx + 1, size=(7, 11)).astype(np.uint8)
        out = P.decode_png(P.encode_png_gray_sub8(a, depth))
        assert out.shape == (7, 11, 1)
        assert np.array_equal(out[:, :, 0], a * (255 // mx))


def test_16bit_gray_and_rgb_decode_to_high_byte():
    r = _rng(3)
    g16 = r.randint(0, 1 << 16, size=(9, 5)).astype(np.uint16)
    out = P.decode_png(P.encode_png_16bit(g16))
    assert np.array_equal(out[:, :, 0], (g16 >> 8).astype(np.uint8))
    c16 = r.randint(0, 1 << 16, size=(6, 7, 3)).astype(np.uint16)
    out = P.decode_png(P.encode_png_16bit(c16))
    assert np.array_equal(out, (c16 >> 8).astype(np.uint8))


def test_adam7_roundtrip_all_filters_and_channels():
    r = _rng(4)
    for ch in (1, 2, 3, 4):
        arr = r.randint(0, 255, size=(21, 17, ch)).astype(np.uint8)
        for f in range(5):
            data = P.encode_png(arr, filter_type=f, interlace=True)
            out = P.decode_png(data)
            assert np.array_equal(out, arr), (ch, f)


def test_adam7_tiny_images_with_empty_passes():
    # sizes below the pass grid leave several Adam7 passes empty
    r = _rng(5)
    for h, w in [(1, 1), (1, 5), (3, 2), (4, 4), (8, 1)]:
        arr = r.randint(0, 255, size=(h, w, 3)).astype(np.uint8)
        out = P.decode_png(P.encode_png(arr, filter_type=4, interlace=True))
        assert np.array_equal(out, arr), (h, w)


def test_adam7_equals_plain_decode():
    r = _rng(6)
    arr = r.randint(0, 255, size=(19, 23, 3)).astype(np.uint8)
    plain = P.decode_png(P.encode_png(arr, filter_type=2))
    inter = P.decode_png(P.encode_png(arr, filter_type=2, interlace=True))
    assert np.array_equal(plain, inter)


def test_malformed_palette_raises():
    pal = np.zeros((4, 3), dtype=np.uint8)
    idx = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(P.encode_png_palette(idx, pal, 2))
    # strip the PLTE chunk -> palette image without PLTE must raise
    plte = data.find(b"PLTE")
    del data[plte - 4 : plte + 4 + 12 + 8]  # len+type+body+crc region
    with pytest.raises(P.PNGError):
        P.decode_png(bytes(data))
    with pytest.raises(P.PNGError):
        P.encode_png_palette(np.full((2, 2), 9, dtype=np.uint8), pal, 2)


def test_resize_images_decodes_palette_png(spark):
    """Integration: a palette PNG through the multimodal resize pass
    takes the REAL pixel path (output is a decodable 8-bit PNG at the
    target geometry whose pixels track the palette lookup)."""
    from aoseventstreamer_spark.operators import multimodal as MM

    r = _rng(7)
    pal = r.randint(0, 255, size=(16, 3)).astype(np.uint8)
    idx = r.randint(0, 16, size=(32, 64))
    payload = P.encode_png_palette(idx, pal, 4)
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = MM.resize_images(media, max_side=16).collect()[0]
    assert (row.width, row.height) == (16, 8)
    out = P.decode_png(bytes(row.payload))
    direct = P.resize_bilinear(pal[idx], 16, 8)
    assert np.array_equal(out, direct)
