"""GIF codec on stdlib + numpy — no media libraries.

Closes the GIF branch of the multimodal pixel tier (the PNG and
baseline-JPEG branches are `functions/png.py` / `functions/jpeg.py`):
``decode_gif`` reads GIF87a/GIF89a — global/local color tables,
interlacing, full 12-bit LZW with dictionary resets — and returns the
FIRST frame as an (h, w, 3) uint8 RGB array; ``encode_gif`` writes a
valid single-frame GIF89a with a real LZW compressor (dictionary
growth + clear-code resets, not the degenerate literal-only form).

Round-trip contract (tested): decode(encode(arr)) == arr exactly when
arr has ≤ 256 distinct colors (GIF is palette-indexed — the encoder
builds an exact palette). Arrays with more colors are quantized to
RGB 3-3-2 deterministically; that branch is lossy by format, not by
implementation.

Scope honestly held back: animation (only the first image descriptor
is decoded; later frames need disposal/compositing semantics) and
transparency (the GCE transparent index renders as its palette color —
single-frame training thumbnails have no background to composite
against). Both raise nothing: they degrade to the documented behavior.
"""

from __future__ import annotations

import numpy as np


class GIFError(ValueError):
    pass


# ---------------------------------------------------------------- LZW


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> list[int]:
    """GIF-variant LZW: variable code width starting at
    min_code_size+1, clear/end codes, dictionary capped at 4096."""
    clear = 1 << min_code_size
    end = clear + 1
    if min_code_size < 2 or min_code_size > 11:
        raise GIFError(f"bad LZW min code size {min_code_size}")
    base = {i: (i,) for i in range(clear)}
    table: dict[int, tuple[int, ...]] = dict(base)
    code_size = min_code_size + 1
    next_code = end + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + code_size <= nbits:
        i = bitpos >> 3
        window = int.from_bytes(data[i : i + 4], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = dict(base)
            code_size = min_code_size + 1
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise GIFError(f"LZW code {code} before any literal")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise GIFError(f"LZW code {code} out of sequence")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        out.extend(entry)
        if len(out) > max_pixels:
            raise GIFError("LZW stream longer than the image area")
        prev = entry
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Real LZW compressor (prefix dictionary, width growth, clear on
    table overflow) — the inverse of :func:`_lzw_decode`."""
    clear = 1 << min_code_size
    end = clear + 1
    w = _BitWriter()
    code_size = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    w.write(clear, code_size)
    s: tuple[int, ...] = ()
    for px in indices.tolist():
        cand = s + (px,)
        if cand in table:
            s = cand
            continue
        w.write(table[s], code_size)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # SYNC NOTE: the decoder assigns its k-th entry while
            # processing the (k+1)-th code, one step BEHIND this
            # encoder (which assigns on every emit, including the
            # first). The decoder widens its reads once ITS
            # next_code hits 2^w; matching that read width here
            # means widening one assignment later — when OUR
            # next_code passes 2^w:
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            # table full: a clear is always safe for the decoder
            # (it resets unconditionally on the clear code)
            w.write(clear, code_size)
            table = {(i,): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = end + 1
        s = (px,)
    if s:
        w.write(table[s], code_size)
    w.write(end, code_size)
    return w.flush()


# ---------------------------------------------------------------- decode


INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a as (h, w, 3) uint8 RGB."""
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise GIFError("not a GIF87a/GIF89a stream")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise GIFError("truncated global color table")
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left = int.from_bytes(data[pos + 1 : pos + 3], "little")
            top = int.from_bytes(data[pos + 3 : pos + 5], "little")
            iw = int.from_bytes(data[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(data[pos + 7 : pos + 9], "little")
            ipacked = data[pos + 9]
            pos += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                if pos + 3 * n > len(data):
                    raise GIFError("truncated local color table")
                pal = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise GIFError("no color table (neither global nor local)")
            min_code = data[pos]
            pos += 1
            chunks = []
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _lzw_decode(min_code, b"".join(chunks), iw * ih)
            if len(idx) < iw * ih:
                raise GIFError(
                    f"LZW stream truncated: {len(idx)} of {iw * ih} pixels"
                )
            arr = np.asarray(idx[: iw * ih], dtype=np.int32).reshape(ih, iw)
            if ipacked & 0x40:  # interlaced: reorder rows by pass
                deinter = np.empty_like(arr)
                src = 0
                for start, step in INTERLACE_PASSES:
                    for row in range(start, ih, step):
                        deinter[row] = arr[src]
                        src += 1
                arr = deinter
            if np.any(arr >= len(pal)):
                raise GIFError("pixel index outside the color table")
            if left + iw > sw or top + ih > sh:
                # a raw numpy shape error here would escape the
                # GIFError fallback contract the callers rely on
                raise GIFError("frame rectangle outside logical screen")
            frame = pal[arr]  # (ih, iw, 3)
            if (left, top, iw, ih) != (0, 0, sw, sh):
                # frame smaller than the logical screen: paste onto
                # the screen's background (palette color 0)
                canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
                canvas[:, :] = pal[0]
                canvas[top : top + ih, left : left + iw] = frame
                frame = canvas
            return frame.astype(np.uint8)
        elif block == 0x3B:
            break
        else:
            raise GIFError(f"unknown block 0x{block:02x} at {pos}")
    raise GIFError("no image descriptor before trailer")


def decode_gif_frames(data: bytes, max_frames: int = 0) -> list[np.ndarray]:
    """Every frame of an animated GIF, COMPOSITED to full logical-
    screen RGB (h, w, 3) uint8 arrays: graphic-control disposal
    methods (1 = leave, 2 = restore to background, 3 = restore to
    previous) and the transparent index (transparent pixels keep the
    canvas underneath) are applied, so frame N is what a viewer
    displays at step N — not the raw patch rectangle. ``max_frames``
    > 0 stops early (frame sampling does not need the whole
    animation decoded)."""
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise GIFError("not a GIF87a/GIF89a stream")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    packed = data[10]
    bg_idx = data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise GIFError("truncated global color table")
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    bg = gct[bg_idx] if (gct is not None and bg_idx < len(gct)) else np.zeros(3, np.uint8)
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    canvas[:, :] = bg
    frames: list[np.ndarray] = []
    disposal, transparent = 0, None
    while pos < len(data):
        block = data[pos]
        if block == 0x21:
            label = data[pos + 1]
            pos += 2
            sub_start = pos
            subs = []
            while pos < len(data) and data[pos] != 0:
                subs.append(data[pos + 1 : pos + 1 + data[pos]])
                pos += 1 + data[pos]
            pos += 1
            if label == 0xF9 and subs:  # graphic control extension
                gce = subs[0]
                disposal = (gce[0] >> 2) & 0x07
                transparent = gce[3] if (gce[0] & 0x01) else None
        elif block == 0x2C:
            left = int.from_bytes(data[pos + 1 : pos + 3], "little")
            top = int.from_bytes(data[pos + 3 : pos + 5], "little")
            iw = int.from_bytes(data[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(data[pos + 7 : pos + 9], "little")
            ipacked = data[pos + 9]
            pos += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                if pos + 3 * n > len(data):
                    raise GIFError("truncated local color table")
                pal = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise GIFError("no color table (neither global nor local)")
            min_code = data[pos]
            pos += 1
            chunks = []
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(min_code, b"".join(chunks), iw * ih)
            if len(idx) < iw * ih:
                raise GIFError(
                    f"LZW stream truncated: {len(idx)} of {iw * ih} pixels"
                )
            arr = np.asarray(idx[: iw * ih], dtype=np.int32).reshape(ih, iw)
            if ipacked & 0x40:
                deinter = np.empty_like(arr)
                src = 0
                for start, step in INTERLACE_PASSES:
                    for row in range(start, ih, step):
                        deinter[row] = arr[src]
                        src += 1
                arr = deinter
            if np.any(arr >= len(pal)):
                raise GIFError("pixel index outside the color table")
            if left + iw > sw or top + ih > sh:
                raise GIFError("frame rectangle outside logical screen")
            before = canvas.copy() if disposal == 3 else None
            patch = canvas[top : top + ih, left : left + iw]
            rgb = pal[arr]
            if transparent is not None:
                mask = (arr != transparent)[:, :, None]
                patch[:] = np.where(mask, rgb, patch)
            else:
                patch[:] = rgb
            frames.append(canvas.copy())
            if max_frames and len(frames) >= max_frames:
                return frames
            if disposal == 2:  # restore the patch area to background
                canvas[top : top + ih, left : left + iw] = bg
            elif disposal == 3 and before is not None:
                canvas = before
            disposal, transparent = 0, None
        elif block == 0x3B:
            break
        else:
            raise GIFError(f"unknown block 0x{block:02x} at {pos}")
    if not frames:
        raise GIFError("no image descriptor before trailer")
    return frames


# ---------------------------------------------------------------- encode


def encode_gif_animation(
    screen_wh: tuple[int, int],
    items: list[tuple[int, int, np.ndarray, int, np.ndarray | None]],
    bg_color: tuple[int, int, int] = (0, 0, 0),
) -> bytes:
    """Multi-frame GIF89a writer — the test-vector generator for
    :func:`decode_gif_frames`. ``items`` are
    (left, top, rgb_patch, disposal, transparent_mask): each becomes
    an image descriptor at (left, top) preceded by a graphic control
    extension carrying its disposal method; mask-true pixels encode
    as the reserved transparent index. One global palette (exact when
    ≤ 255 colors, else RGB 3-3-2) with slot 0 = background."""
    sw, sh = screen_wh
    colors: set[tuple[int, int, int]] = {tuple(int(x) for x in bg_color)}
    for _, _, patch, _, _ in items:
        if patch.ndim != 3 or patch.shape[2] != 3 or patch.dtype != np.uint8:
            raise GIFError("patches must be (h, w, 3) uint8")
        colors.update(map(tuple, patch.reshape(-1, 3).tolist()))
    quant = len(colors) > 255  # one slot reserved for transparency

    def q332(c):
        return (c[0] >> 5 << 5, c[1] >> 5 << 5, c[2] >> 6 << 6)

    if quant:
        colors = {q332(c) for c in colors} | {q332(tuple(bg_color))}
    pal_list = sorted(colors)
    bg_key = q332(tuple(bg_color)) if quant else tuple(int(x) for x in bg_color)
    pal_list.remove(bg_key)
    pal_list = [bg_key] + pal_list  # background at index 0
    if len(pal_list) > 255:
        # the full 3-3-2 grid (256 colors) would leave no slot for the
        # reserved transparent index — degrade deterministically by
        # dropping the least-used non-background color (ties: smallest
        # RGB) and remapping it to its nearest survivor, instead of
        # refusing to encode colorful animations (ADVICE r5).
        from collections import Counter

        # quant is necessarily True here: an exact (unquantized)
        # palette is capped at 255 colors by the quant flag itself
        counts: Counter = Counter()
        for _, _, patch, _, _ in items:
            counts.update(
                q332(tuple(c)) for c in patch.reshape(-1, 3).tolist()
            )
        drop = min(pal_list[1:], key=lambda c: (counts[c], c))
        pal_list.remove(drop)
        nearest = min(
            pal_list,
            key=lambda c: (
                sum((a - b) ** 2 for a, b in zip(c, drop)), c
            ),
        )
    else:
        drop = nearest = None
    lut = {c: i for i, c in enumerate(pal_list)}
    if drop is not None:
        lut[drop] = lut[nearest]
    trans_idx = len(pal_list)  # reserved transparent slot (≤ 255 now)
    bits = max(2, int(trans_idx).bit_length())
    table_n = 1 << bits
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[: len(pal_list)] = np.array(pal_list, dtype=np.uint8)

    out = bytearray()
    out += b"GIF89a"
    out += int(sw).to_bytes(2, "little") + int(sh).to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT, bg index 0
    out += pal.tobytes()
    for left, top, patch, disposal, mask in items:
        ph, pw = patch.shape[:2]
        flat = patch.reshape(-1, 3)
        if quant:
            keys = [q332(tuple(c)) for c in flat.tolist()]
        else:
            keys = list(map(tuple, flat.tolist()))
        idx = np.array([lut[k] for k in keys], dtype=np.int32)
        if mask is not None:
            idx = np.where(mask.reshape(-1), trans_idx, idx)
        # graphic control extension
        flags = (disposal & 0x07) << 2 | (1 if mask is not None else 0)
        out += bytes([0x21, 0xF9, 4, flags, 0, 0, trans_idx, 0])
        out += b"\x2c"
        out += int(left).to_bytes(2, "little") + int(top).to_bytes(2, "little")
        out += int(pw).to_bytes(2, "little") + int(ph).to_bytes(2, "little")
        out += b"\x00"
        min_code = bits
        out += bytes([min_code])
        lzw = _lzw_encode(min_code, idx)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def encode_gif(arr: np.ndarray) -> bytes:
    """Single-frame GIF89a. Exact palette when the image has ≤ 256
    distinct colors (lossless round-trip); deterministic RGB 3-3-2
    quantization otherwise (lossy by format)."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise GIFError("encode_gif expects (h, w, 3) uint8")
    h, wd = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        q = (
            (flat[:, 0].astype(np.int32) >> 5 << 5) * 65536
            + (flat[:, 1].astype(np.int32) >> 5 << 5) * 256
            + (flat[:, 2].astype(np.int32) >> 6 << 6)
        )
        uq, inverse = np.unique(q, return_inverse=True)
        colors = np.stack(
            [uq // 65536, (uq // 256) % 256, uq % 256], axis=1
        ).astype(np.uint8)
    n_colors = len(colors)
    bits = max(2, int(n_colors - 1).bit_length())  # GIF table ≥ 4 entries
    table_n = 1 << bits
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[:n_colors] = colors
    out = bytearray()
    out += b"GIF89a"
    out += int(wd).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag + size, bg 0
    out += pal.tobytes()
    out += b"\x2c" + b"\x00" * 4  # image at (0, 0)
    out += int(wd).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += b"\x00"  # no LCT, not interlaced
    min_code = bits
    out += bytes([min_code])
    lzw = _lzw_encode(min_code, inverse.astype(np.int32).reshape(-1))
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
