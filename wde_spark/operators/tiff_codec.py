"""Dependency-free TIFF codec — the sixth image container, carrying the
PackBits byte-run compression (the third RLE variant after BI_RLE8 and
GIF's LZW-adjacent runs, and the simplest: literal-run / repeat-run
control bytes, restarted per row).

Declared support: BOTH byte orders — little-endian ('II*\\0') and
big-endian ('MM\\0*') — baseline TIFF with a single IFD and a single
strip; 8-bit grayscale (PhotometricInterpretation 1, SamplesPerPixel 1)
and 8-bit RGB (PI 2, SPP 3); Compression 1 (none) or 32773 (PackBits);
value offsets either inline (<= 4 bytes, left-justified per TIFF 6.0)
or pointed. Everything outside that — tiles, multiple strips, other bit
depths, predictors, other compressions — returns None so callers
null-route to the raw-byte path.

PackBits (from the public TIFF 6.0 spec, section 9): control byte n in
[0, 127] copies n+1 literal bytes; n in [-127, -1] (two's complement)
repeats the next byte 1-n times; -128 is a no-op. The encoder restarts
the coder at every row boundary (spec requirement), which is also what
keeps rows independently decodable.

Pure stdlib `struct` + numpy; layout from the public TIFF 6.0
specification. Not derived from the reference repo (text-only; no media
surface — extension parity documented in COVERAGE.md).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 64 * 1024 * 1024

# IFD tag ids (TIFF 6.0)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BPS = 258
_T_COMP = 259
_T_PHOTO = 262
_T_STRIP_OFF = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_CNT = 279


def is_tiff(payload: bytes) -> bool:
    return payload[:4] in (b"II*\x00", b"MM\x00*")


def packbits_encode_row(row: bytes) -> bytes:
    """PackBits-encode ONE row (the coder restarts per row per spec).
    Runs of >= 3 equal bytes become repeat-runs; everything else packs
    into literal-runs of <= 128."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # measure the run at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 3:
            out.append((257 - (j - i)) & 0xFF)
            out.append(row[i])
            i = j
            continue
        # literal run: until the next >=3 repeat or 128 bytes (a 2-byte
        # step may not overshoot the cap — control byte 128 is a no-op,
        # not a length)
        lit_start = i
        while i < n and i - lit_start < 128:
            j = i + 1
            while j < n and j - i < 128 and row[j] == row[i]:
                j += 1
            if j - i >= 3:
                break
            i = min(j, lit_start + 128)
        out.append(i - lit_start - 1)
        out += row[lit_start:i]
    return bytes(out)


def packbits_decode(data: bytes, expect: int):
    """Decode a PackBits stream to exactly `expect` bytes, or None on a
    derailed stream (overrun / underrun / truncation)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expect:
        c = data[i]
        i += 1
        if c == 128:
            continue  # no-op
        if c < 128:
            if i + c + 1 > n:
                return None
            out += data[i:i + c + 1]
            i += c + 1
        else:
            if i >= n:
                return None
            out += bytes((data[i],)) * (257 - c)
            i += 1
    if len(out) != expect:
        return None
    return bytes(out)


def _ifd_entry(e: str, tag: int, typ: int, count: int,
               value: int) -> bytes:
    # inline values are LEFT-justified in the 4-byte field (TIFF 6.0
    # §2), so a count-1 SHORT packs as (H value, H 0) in EITHER byte
    # order — never as a 4-byte long
    if typ == 3 and count == 1:
        vf = struct.pack(e + "HH", value, 0)
    else:
        vf = struct.pack(e + "I", value)
    return struct.pack(e + "HHI", tag, typ, count) + vf


def encode_tiff(pixels: np.ndarray, packbits: bool = True,
                big: bool = False) -> bytes:
    """Encode an (h, w) uint8 grayscale or (h, w, 3) uint8 RGB array as
    a single-strip baseline TIFF — little-endian ('II') by default,
    big-endian ('MM') with big=True — PackBits-compressed by default.
    The fixture builder for the decode path; lossless, so the SQL
    oracle predicts every decoded byte."""
    assert pixels.dtype == np.uint8 and pixels.ndim in (2, 3)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    spp = 1 if gray else 3
    raw = pixels.tobytes()
    row_bytes = w * spp
    if packbits:
        strip = b"".join(
            packbits_encode_row(raw[r * row_bytes:(r + 1) * row_bytes])
            for r in range(h))
        comp = 32773
    else:
        strip = raw
        comp = 1
    # layout: header(8) | strip | [bps array for RGB] | IFD
    e = ">" if big else "<"
    magic = b"MM\x00*" if big else b"II*\x00"
    strip_off = 8
    pos = strip_off + len(strip)
    if spp == 3:
        bps_off = pos
        bps_extra = struct.pack(e + "HHH", 8, 8, 8)
        pos += len(bps_extra)
    else:
        bps_extra = b""
    ifd_off = pos + (pos & 1)  # word-align the IFD
    pad = b"\x00" * (ifd_off - pos)
    entries = [
        _ifd_entry(e, _T_WIDTH, 3, 1, w),
        _ifd_entry(e, _T_HEIGHT, 3, 1, h),
        _ifd_entry(e, _T_BPS, 3, spp, 8 if spp == 1 else bps_off),
        _ifd_entry(e, _T_COMP, 3, 1, comp),
        _ifd_entry(e, _T_PHOTO, 3, 1, 1 if gray else 2),
        _ifd_entry(e, _T_STRIP_OFF, 4, 1, strip_off),
        _ifd_entry(e, _T_SPP, 3, 1, spp),
        _ifd_entry(e, _T_ROWS_PER_STRIP, 3, 1, h),
        _ifd_entry(e, _T_STRIP_CNT, 4, 1, len(strip)),
    ]
    ifd = (struct.pack(e + "H", len(entries)) + b"".join(entries)
           + struct.pack(e + "I", 0))
    return (magic + struct.pack(e + "I", ifd_off) + strip
            + bps_extra + pad + ifd)


def decode_tiff(payload: bytes):
    """Decode a TIFF byte string to (width, height, rgb) with rgb an
    (h, w, 3) uint8 array (grayscale replicates across channels, like
    the AVI/BMP tiers' canonical form). Returns None outside the
    declared support (see module docstring)."""
    try:
        if not is_tiff(payload) or len(payload) < 8:
            return None
        e = ">" if payload[:2] == b"MM" else "<"
        (ifd_off,) = struct.unpack(e + "I", payload[4:8])
        if ifd_off + 2 > len(payload):
            return None
        (n_ent,) = struct.unpack(e + "H", payload[ifd_off:ifd_off + 2])
        if ifd_off + 2 + 12 * n_ent + 4 > len(payload):
            return None
        tags = {}
        for ent in range(n_ent):
            off = ifd_off + 2 + 12 * ent
            tag, typ, count = struct.unpack(
                e + "HHI", payload[off:off + 8])
            # inline values are left-justified in the 4-byte field, so
            # a count-1 SHORT reads from the FIRST two bytes in either
            # byte order (reading the field as a long would shift it
            # 16 bits in an 'MM' file)
            if typ == 3 and count == 1:
                (val,) = struct.unpack(
                    e + "H", payload[off + 8:off + 10])
            else:
                (val,) = struct.unpack(
                    e + "I", payload[off + 8:off + 12])
            tags[tag] = (typ, count, val, off + 8)
        for req in (_T_WIDTH, _T_HEIGHT, _T_COMP, _T_PHOTO,
                    _T_STRIP_OFF, _T_STRIP_CNT):
            if req not in tags:
                return None
        w = tags[_T_WIDTH][2]
        h = tags[_T_HEIGHT][2]
        comp = tags[_T_COMP][2]
        photo = tags[_T_PHOTO][2]
        spp = tags[_T_SPP][2] if _T_SPP in tags else 1
        if comp not in (1, 32773) or (photo, spp) not in ((1, 1), (2, 3)):
            return None
        if w <= 0 or h <= 0 or w * h * spp > _MAX_PIXELS:
            return None
        # bits per sample: inline short(s) or pointed array — all must be 8
        if _T_BPS in tags:
            typ, count, val, val_pos = tags[_T_BPS]
            if typ != 3 or count != spp:
                return None
            if count * 2 <= 4:
                bps = struct.unpack(
                    f"{e}{count}H", payload[val_pos:val_pos + 2 * count])
            else:
                if val + 2 * count > len(payload):
                    return None
                bps = struct.unpack(
                    f"{e}{count}H", payload[val:val + 2 * count])
            if any(b != 8 for b in bps):
                return None
        if tags[_T_STRIP_OFF][1] != 1 or tags[_T_STRIP_CNT][1] != 1:
            return None  # single strip only
        s_off, s_cnt = tags[_T_STRIP_OFF][2], tags[_T_STRIP_CNT][2]
        if s_off + s_cnt > len(payload):
            return None
        strip = payload[s_off:s_off + s_cnt]
        expect = w * h * spp
        raw = strip if comp == 1 else packbits_decode(strip, expect)
        if raw is None or len(raw) != expect:
            return None
        px = np.frombuffer(raw, np.uint8)
        if spp == 1:
            rgb = np.repeat(px.reshape(h, w, 1), 3, axis=2)
        else:
            rgb = px.reshape(h, w, 3)
        return w, h, rgb.copy()
    except (struct.error, ValueError, IndexError):
        return None
