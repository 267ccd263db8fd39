"""Dependency-free BMP codec — the third image container (after PNG and
GIF), sharing the DIB pixel machinery with `avi_codec` (AVI frames ARE
DIBs; BMP wraps one DIB in a 14-byte file header).

Declared support: 'BM' files with a BITMAPINFOHEADER (40-byte) DIB
header, 8-bit palettized and 24-bit BGR pixels, BI_RGB (bottom-up or
top-down) and BI_RLE8 (bottom-up 8-bit) compressions — decoded to
canonical (h, w, 3) uint8 RGB exactly like the AVI frame tiers.
Everything outside that — other header sizes, bit depths, compressions,
geometry that disagrees with the pixel data, RLE streams that derail —
returns None so callers null-route to the raw-byte path.

Pure stdlib `struct` + numpy; layout from the public BMP/DIB
specification. Not derived from the reference repo (text-only; no media
surface — extension parity documented in COVERAGE.md).
"""

from __future__ import annotations

import struct

import numpy as np

from .avi_codec import _MAX_FRAME_BYTES, _decode_rle8, _stride


def is_bmp(payload: bytes) -> bool:
    return len(payload) >= 14 and payload[:2] == b"BM"


def decode_bmp(payload: bytes):
    """Decode a BMP byte string to (width, height, rgb) where rgb is an
    (h, w, 3) uint8 array. Returns None outside the declared support
    (see module docstring)."""
    try:
        if not is_bmp(payload) or len(payload) < 54:
            return None
        (data_off,) = struct.unpack("<I", payload[10:14])
        (hdr_size, bw, bh, planes, bits, comp) = struct.unpack(
            "<IiiHHI", payload[14:34])
        if hdr_size != 40 or planes != 1 or bits not in (8, 24):
            return None
        if comp not in (0, 1) or (comp == 1 and bits != 8):
            return None
        top_down = bh < 0
        if comp == 1 and top_down:
            return None  # RLE8 is bottom-up by definition
        w, h = bw, abs(bh)
        if w <= 0 or h <= 0:
            return None
        stride = _stride(w, bits)
        if stride * h > _MAX_FRAME_BYTES:
            return None
        palette = None
        if bits == 8:
            (clr_used,) = struct.unpack("<I", payload[46:50])
            n_pal = clr_used or 256
            pal_off = 14 + hdr_size
            if pal_off + n_pal * 4 > len(payload):
                return None
            pal = np.frombuffer(
                payload, np.uint8, n_pal * 4, pal_off).reshape(-1, 4)
            palette = pal[:, [2, 1, 0]]  # RGBQUAD is B,G,R,_
        if data_off > len(payload):
            return None
        data = payload[data_off:]
        if comp == 1:
            idx = _decode_rle8(data, w, h)
            if idx is None or idx.max(initial=0) >= palette.shape[0]:
                return None
            return w, h, palette[idx][::-1].copy()
        if len(data) < stride * h:
            return None
        rows = np.frombuffer(
            data, np.uint8, stride * h).reshape(h, stride)
        if bits == 8:
            idx = rows[:, :w]
            if idx.max(initial=0) >= palette.shape[0]:
                return None
            rgb = palette[idx]
        else:
            rgb = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]
        if not top_down:
            rgb = rgb[::-1]
        return w, h, rgb.copy()
    except (struct.error, ValueError):
        return None


def encode_bmp(pixels: np.ndarray, rle: bool = False,
               top_down: bool = False) -> bytes:
    """Encode an (h, w) uint8 gray array as an 8-bit grayscale-palette
    BMP (optionally BI_RLE8-compressed via the shared row encoder), or
    an (h, w, 3) uint8 RGB array as a 24-bit BI_RGB BMP. The fixture
    builder for the decoder; rle requires the gray form and bottom-up
    rows (per spec)."""
    from .avi_codec import _rle8_frame

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        bits = 8
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w, _ = arr.shape
        bits = 24
        assert not rle, "BI_RLE8 is 8-bit only"
    else:
        raise ValueError("encode_bmp expects (h,w) gray or (h,w,3) RGB")
    assert h > 0 and w > 0
    assert not (rle and top_down), "RLE8 is bottom-up by definition"
    stride = _stride(w, bits)

    if rle:
        body = _rle8_frame(arr)
        comp = 1
    else:
        rows = np.zeros((h, stride), dtype=np.uint8)
        src = arr if top_down else arr[::-1]
        if bits == 8:
            rows[:, :w] = src
        else:
            rows[:, :w * 3] = src[:, :, ::-1].reshape(h, w * 3)
        body = rows.tobytes()
        comp = 0

    pal = b""
    if bits == 8:
        g = np.arange(256, dtype=np.uint8)
        pal = np.stack([g, g, g, np.zeros_like(g)], axis=1).tobytes()
    data_off = 14 + 40 + len(pal)
    bh = -h if top_down else h
    dib = struct.pack("<IiiHHIIiiII", 40, w, bh, 1, bits, comp,
                      len(body), 0, 0, 256 if bits == 8 else 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0,
                              data_off)
    return hdr + dib + pal + body
