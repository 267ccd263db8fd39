"""Dependency-free AVI/DIB video codec — the video analogue of
`wav_codec.py` (same RIFF container family) and `png_codec.py`.

Moves the VIDEO modality from the declared byte-slice stub to REAL
decode for the uncompressed tier: RIFF/AVI container parsing with
uncompressed DIB ('00db') frame payloads — 8-bit palettized and 24-bit
BGR, bottom-up or top-down rows, 4-byte-aligned strides. Everything
outside that declared surface — compressed fourccs, other bit depths,
truncated containers, geometry that disagrees between headers and frame
bytes — returns None so callers null-route to the raw-byte path exactly
like unsupported PNGs/WAVs do. Compressed codecs (H.264 etc.) remain
environment-dependent (no libav here); the uncompressed tier is the one
a dependency-free engine can make hash-checkable.

Pure stdlib `struct` + numpy; layout from the public RIFF/AVI and
BITMAPINFOHEADER specifications (the canonical hdrl/strl/movi chunk
tree every AVI reader implements). Not derived from the reference repo
(text-only; no media surface — extension parity documented in
COVERAGE.md).

Decoded frames are always (h, w, 3) uint8 RGB: 8-bit indices expand
through the palette (RGBQUAD order is B,G,R,reserved), 24-bit rows
reorder BGR → RGB — one canonical pixel layout downstream kernels and
SQL oracles can share across both tiers.
"""

from __future__ import annotations

import struct

import numpy as np

RIFF_MAGIC = b"RIFF"

# absurd-size guard: refuse to allocate for frame geometry promising more
# than this many bytes (mirrors png_codec / wav_codec caps)
_MAX_FRAME_BYTES = 256 * 1024 * 1024


def is_avi(payload: bytes) -> bool:
    return (len(payload) >= 12 and payload[:4] == RIFF_MAGIC
            and payload[8:12] == b"AVI ")


def _iter_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) walking a RIFF chunk run;
    chunks pad to even offsets."""
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        body = pos + 8
        if body + size > end:
            return  # truncated chunk: caller treats missing parts as absent
        yield cid, body, size
        pos = body + size + (size & 1)


def _stride(width: int, bits: int) -> int:
    return ((width * (bits // 8) + 3) // 4) * 4


def decode_avi(payload: bytes):
    """Decode an AVI byte string to (fps, width, height, frames) where
    frames is an (n_frames, height, width, 3) uint8 RGB array. Returns
    None for anything outside the declared support (not RIFF/AVI, no
    'vids' stream, compression tag != 0 (BI_RGB), bits not in {8, 24},
    8-bit without a palette, frame chunks whose size disagrees with the
    header geometry)."""
    try:
        if not is_avi(payload):
            return None
        n = len(payload)
        width = height = None
        bits = None
        palette = None
        scale = rate = None
        usec_per_frame = None
        frame_blobs: list[bytes] = []
        top_down = False

        def walk(pos: int, end: int) -> None:
            nonlocal width, height, bits, palette, scale, rate
            nonlocal usec_per_frame, top_down
            for cid, body, size in _iter_chunks(payload, pos, end):
                if cid == b"LIST":
                    walk(body + 4, body + size)
                elif cid == b"avih" and size >= 40:
                    (uspf,) = struct.unpack("<I", payload[body:body + 4])
                    usec_per_frame = uspf
                elif cid == b"strh" and size >= 32:
                    fcc = payload[body:body + 4]
                    if fcc == b"vids":
                        scale, rate = struct.unpack(
                            "<II", payload[body + 20:body + 28])
                elif cid == b"strf" and size >= 40 and width is None:
                    (_bisz, bw, bh, _planes, bc, comp) = struct.unpack(
                        "<IiiHHI", payload[body:body + 20])
                    width, bits = bw, bc
                    if bh < 0:
                        top_down, height = True, -bh
                    else:
                        height = bh
                    if comp != 0:  # BI_RGB only: compressed tiers null-route
                        width = None
                        return
                    if bc == 8 and size >= 40 + 4:
                        pal = np.frombuffer(
                            payload, dtype=np.uint8, offset=body + 40,
                            count=min(size - 40, 256 * 4)).reshape(-1, 4)
                        palette = pal[:, [2, 1, 0]]  # RGBQUAD is B,G,R,_
                elif cid in (b"00db", b"00dc"):
                    frame_blobs.append(payload[body:body + size])

        walk(12, n)
        if width is None or height is None or bits not in (8, 24):
            return None
        if width <= 0 or height <= 0 or not frame_blobs:
            return None
        if bits == 8 and palette is None:
            return None
        stride = _stride(width, bits)
        if stride * height > _MAX_FRAME_BYTES:
            return None
        frames = []
        for blob in frame_blobs:
            if len(blob) != stride * height:
                return None  # geometry disagreement: refuse, don't guess
            rows = np.frombuffer(blob, dtype=np.uint8).reshape(
                height, stride)
            if bits == 8:
                idx = rows[:, :width]
                if idx.max(initial=0) >= palette.shape[0]:
                    return None
                rgb = palette[idx]
            else:
                bgr = rows[:, :width * 3].reshape(height, width, 3)
                rgb = bgr[:, :, ::-1]
            if not top_down:
                rgb = rgb[::-1]  # DIB rows are bottom-up
            frames.append(rgb)
        if scale and rate:
            fps = rate / scale
        elif usec_per_frame:
            fps = 1_000_000.0 / usec_per_frame
        else:
            return None
        return float(fps), width, height, np.stack(frames).copy()
    except (struct.error, ValueError):
        return None


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode an (n, h, w) uint8 array as an 8-bit grayscale-palette AVI,
    or an (n, h, w, 3) uint8 RGB array as a 24-bit BGR AVI — uncompressed
    DIB frames, bottom-up rows, 4-byte-aligned strides. The test-fixture
    synthesizer for the decoder's property tests and the deterministic
    video payload builder (`multimodal.attach_video`)."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim == 3:
        nf, h, w = arr.shape
        bits = 8
    elif arr.ndim == 4 and arr.shape[3] == 3:
        nf, h, w, _ = arr.shape
        bits = 24
    else:
        raise ValueError("encode_avi expects (n,h,w) gray or (n,h,w,3) RGB")
    assert nf > 0 and h > 0 and w > 0 and fps > 0
    stride = _stride(w, bits)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    blobs = []
    for f in range(nf):
        if bits == 8:
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, :w] = arr[f][::-1]  # bottom-up
        else:
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, :w * 3] = arr[f][::-1, :, ::-1].reshape(h, w * 3)
        blobs.append(rows.tobytes())
    frame_size = stride * h

    avih = struct.pack(
        "<IIIIIIIIII", 1_000_000 // fps, frame_size * fps, 0, 0x10,
        nf, 0, 1, frame_size, w, h) + b"\x00" * 16
    strh = (b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, nf, frame_size,
        0xFFFFFFFF, 0) + struct.pack("<4h", 0, 0, w, h))
    bmih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, 0,
                       frame_size, 0, 0, 256 if bits == 8 else 0, 0)
    strf = bmih
    if bits == 8:
        g = np.arange(256, dtype=np.uint8)
        strf += np.stack([g, g, g, np.zeros_like(g)],
                         axis=1).tobytes()  # grayscale RGBQUADs (B,G,R,_)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", b) for b in blobs))
    body = b"AVI " + hdrl + movi
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body
