"""Dependency-free WAV/PCM codec — the audio analogue of `png_codec.py`.

Gives the audio modality REAL decode (the r8 verdict's next-slice ask):
RIFF/WAVE container parsing with uncompressed PCM payloads, 8-bit unsigned
and 16-bit signed little-endian, mono or multi-channel. Everything outside
that declared surface — compressed codecs (format tag != 1), 24/32-bit,
truncated containers, wrong magic — returns None so callers null-route to
the raw-byte path exactly like unsupported PNGs do.

Pure stdlib `struct` + numpy; format layout from the public RIFF/WAVE
specification (the canonical fmt/data chunk layout every WAV reader
implements). Not derived from the reference repo (text-only; no media
surface — extension parity documented in COVERAGE.md).
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"

# absurd-size guard: refuse to allocate for a data chunk promising more
# than this many bytes (mirrors png_codec's pre-allocation cap)
_MAX_DATA_BYTES = 256 * 1024 * 1024


def is_wav(payload: bytes) -> bool:
    return (len(payload) >= 12 and payload[:4] == WAV_MAGIC
            and payload[8:12] == b"WAVE")


def decode_wav(payload: bytes):
    """Decode a WAV byte string to (sample_rate, n_channels, bits,
    samples) where samples is an (n_frames, n_channels) numpy array —
    uint8 for 8-bit PCM (unsigned, 128-centered per the format), int16
    for 16-bit. Returns None for anything outside the declared support
    (not RIFF/WAVE, non-PCM format tag, bits not in {8, 16}, zero or
    inconsistent geometry, truncated data chunk)."""
    try:
        if not is_wav(payload):
            return None
        pos, n = 12, len(payload)
        fmt = None
        data = None
        while pos + 8 <= n:
            cid = payload[pos:pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
            body = payload[pos + 8:pos + 8 + size]
            if len(body) < size:
                return None  # truncated chunk
            pos += 8 + size + (size & 1)  # chunks pad to even offsets
            if cid == b"fmt " and fmt is None:
                if size < 16:
                    return None
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data" and data is None:
                data = body
        if fmt is None or data is None:
            return None
        audio_format, channels, sample_rate, _brate, block_align, bits = fmt
        if audio_format != 1 or bits not in (8, 16) or channels < 1:
            return None
        if sample_rate <= 0 or len(data) > _MAX_DATA_BYTES:
            return None
        if block_align != channels * (bits // 8):
            return None
        n_frames = len(data) // block_align
        data = data[: n_frames * block_align]
        if n_frames == 0:
            return None
        dtype = np.uint8 if bits == 8 else np.dtype("<i2")
        samples = np.frombuffer(data, dtype=dtype).reshape(
            n_frames, channels)
        return sample_rate, channels, bits, samples
    except (struct.error, ValueError):
        return None


def encode_wav(samples: np.ndarray, sample_rate: int,
               bits: int = 16) -> bytes:
    """Encode an (n,) or (n, channels) array as PCM WAV — uint8 for
    bits=8, int16 little-endian for bits=16. The test-fixture synthesizer
    for the decoder's property tests and the deterministic audio payload
    builder (`multimodal.attach_audio`)."""
    assert bits in (8, 16)
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, channels = arr.shape
    dtype = np.uint8 if bits == 8 else np.dtype("<i2")
    body = arr.astype(dtype).tobytes()
    block_align = channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body
              + (b"\x00" if len(body) & 1 else b""))
    return (WAV_MAGIC + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
            + chunks)
