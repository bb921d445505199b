"""Vendored minimal AVI (RIFF) container walker for MJPEG streams, plus a
fixture-grade writer.  Pure stdlib ``struct`` — fourth application of the
vendored-codec playbook (PNG/JPEG, WAV, now AVI).

Public-spec source: the AVI RIFF form (Microsoft Video for Windows
programming guide; OpenDML AVI extensions).  Layout walked here::

    RIFF <size> 'AVI '
      LIST <size> 'hdrl'
        'avih' <size> <dwMicroSecPerFrame:u32le> ...
      LIST <size> 'movi'
        '##dc'/'##db' <size> <frame bytes>        (## = stream number)
        LIST <size> 'rec '  [ '##dc' ... ]        (interleave grouping)

``avi_mjpeg_decode`` returns the ordered list of video-frame payloads and
the per-frame duration; callers feed each payload to
``imagecodec.jpeg_decode`` (MJPEG frames are baseline JPEGs).  Non-RIFF /
non-AVI input, or AVIs with zero video chunks, return None — callers fall
back with an honest ``decode_status``, like the image/audio tiers.

Untrusted-payload bounds: chunk sizes are clamped to the buffer (a lying
size cannot overread), recursion is limited to the one LIST level the
format uses, and total collected frame bytes are capped.
"""

from __future__ import annotations

import struct

_FRAME_BYTE_CAP = 1 << 28            # 256 MB of collected frame payloads


def _scan_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) within [pos, end)."""
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        start = pos + 8
        size = min(size, max(end - start, 0))     # lying sizes clamp
        yield cid, start, size
        pos = start + size + (size & 1)           # chunks pad to even


def avi_mjpeg_decode(data: bytes):
    """-> (ordered list of video frame payload bytes, usec_per_frame)
    or None if this isn't an AVI with video chunks."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    usec_per_frame, frames, budget = None, [], _FRAME_BYTE_CAP

    def is_video(cid: bytes) -> bool:
        return (len(cid) == 4 and cid[:2].isdigit()
                and cid[2:] in (b"dc", b"db"))

    for cid, start, size in _scan_chunks(data, 12, len(data)):
        if cid != b"LIST":
            continue
        form = data[start:start + 4]
        if form == b"hdrl":
            for c2, s2, z2 in _scan_chunks(data, start + 4, start + size):
                if c2 == b"avih" and z2 >= 4:
                    (usec_per_frame,) = struct.unpack("<I",
                                                      data[s2:s2 + 4])
        elif form == b"movi":
            for c2, s2, z2 in _scan_chunks(data, start + 4, start + size):
                members = [(c2, s2, z2)]
                if c2 == b"LIST" and data[s2:s2 + 4] == b"rec ":
                    members = list(_scan_chunks(data, s2 + 4, s2 + z2))
                for c3, s3, z3 in members:
                    if is_video(c3):
                        budget -= z3
                        if budget < 0:
                            return None
                        frames.append(data[s3:s3 + z3])
    if not frames:
        return None
    return frames, int(usec_per_frame or 0)


def avi_mjpeg_encode(frames: list[bytes], usec_per_frame: int) -> bytes:
    """Fixture-grade writer: just enough AVI structure (avih + movi) for
    the walker above and for deterministic test/oracle payloads.  A real
    deployment writes through ffmpeg."""
    def chunk(cid: bytes, payload: bytes) -> bytes:
        return (cid + struct.pack("<I", len(payload)) + payload +
                (b"\x00" if len(payload) & 1 else b""))

    avih = struct.pack("<I", usec_per_frame) + b"\x00" * 52
    hdrl = b"hdrl" + chunk(b"avih", avih)
    movi = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    body = (b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi))
    return b"RIFF" + struct.pack("<I", len(body)) + body
