"""Vendored minimal audio codec: RIFF/WAVE PCM decode (+ encode for test
fixtures), pure stdlib-``struct`` + NumPy.

Third application of the vendored-codec playbook (after PNG/JPEG in
imagecodec.py): librosa/soundfile are not installed in this sandbox, so
without this module ``extract_media_features(decode='real')`` could never
produce real audio statistics.  Implemented from the public RIFF/WAVE
format (Microsoft/IBM multimedia programming interface spec, 1991; the
same layout Go's community wav readers and CPython's ``wave`` module
parse):

* container: ``RIFF <size> WAVE`` then ``<id:4><size:u32le><payload>``
  chunks, payloads padded to even length;
* ``fmt ``: format 1 (integer PCM, 8/16/24/32-bit) and format 3
  (IEEE float32/64), any channel count (downmixed to mono by mean);
* ``data``: interleaved frames -> float64 mono in [-1, 1].

Decode failures (not RIFF/WAVE, compressed formats like MP3/OGG,
truncated chunks) return None — callers fall back to hash features with
an honest ``decode_status``, mirroring the image tier's behavior.

Untrusted-payload bounds (same rationale as imagecodec's zlib-bomb
guard): sample data beyond ``_DECODE_BYTE_CAP`` raw bytes is refused up
front, and only the declared ``data`` chunk is sliced — a lying chunk
size cannot read past the payload.
"""

from __future__ import annotations

import struct

import numpy as np

_DECODE_BYTE_CAP = 1 << 28           # 256 MB of raw sample data

# (bits, format) -> numpy dtype + full-scale divisor; 8-bit PCM is
# unsigned with midpoint 128, wider integer widths are signed two's
# complement, floats are already in [-1, 1]
_INT_SCALE = {8: 128.0, 16: 32768.0, 24: 8388608.0, 32: 2147483648.0}


def wav_decode(data: bytes):
    """-> (mono float64 samples in [-1, 1], sample_rate) or None."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)          # chunks pad to even
        if cid == b"fmt " and len(payload) >= 16:
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif cid == b"data":
            raw = payload
            if fmt is not None:
                break                         # fmt must precede data
    if fmt is None or raw is None:
        return None
    audio_fmt, channels, rate, _byte_rate, _block, bits = fmt
    if channels < 1 or rate < 1 or len(raw) > _DECODE_BYTE_CAP:
        return None
    if audio_fmt == 1 and bits in (8, 16, 24, 32):
        width = bits // 8
        n = len(raw) // (width * channels) * (width * channels)
        if n == 0:
            return None
        buf = np.frombuffer(raw, np.uint8, n)
        if bits == 8:
            samples = buf.astype(np.float64) - 128.0
        elif bits == 24:
            b = buf.reshape(-1, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            samples = np.where(v >= 1 << 23, v - (1 << 24),
                               v).astype(np.float64)
        else:
            dt = np.dtype("<i2") if bits == 16 else np.dtype("<i4")
            samples = buf.view(dt).astype(np.float64)
        samples /= _INT_SCALE[bits]
    elif audio_fmt == 3 and bits in (32, 64):
        dt = np.dtype("<f4") if bits == 32 else np.dtype("<f8")
        width = bits // 8
        n = len(raw) // (width * channels) * (width * channels)
        if n == 0:
            return None
        samples = np.frombuffer(raw, np.uint8, n).view(dt).astype(np.float64)
    else:
        return None                           # compressed / exotic format
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, int(rate)


def wav_encode(samples, rate: int, bits: int = 16,
               channels: int = 1) -> bytes:
    """Deterministic PCM encoder for fixtures/tests: float [-1, 1] -> WAV.
    Integer widths quantize by round(s * 2^(bits-1)) clipped to range, so
    k/2^(bits-1) values round-trip bit-exactly."""
    s = np.asarray(samples, dtype=np.float64)
    if channels > 1:
        s = np.repeat(s, channels)            # duplicate mono across chans
    scale = _INT_SCALE[bits]
    if bits == 8:
        raw = (np.clip(np.round(s * scale), -128, 127) + 128) \
            .astype(np.uint8).tobytes()
    elif bits == 24:
        v = np.clip(np.round(s * scale), -scale, scale - 1).astype(np.int64)
        v = np.where(v < 0, v + (1 << 24), v)
        b = np.stack([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF],
                     axis=1).astype(np.uint8)
        raw = b.tobytes()
    else:
        dt = np.dtype("<i2") if bits == 16 else np.dtype("<i4")
        raw = np.clip(np.round(s * scale), -scale, scale - 1) \
            .astype(dt).tobytes()
    width = bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * width * channels,
                      width * channels, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt +
              b"data" + struct.pack("<I", len(raw)) + raw +
              (b"\x00" if len(raw) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
