"""Vendored image codec (C19 backing): PNG/JPEG round-trips and the
reference's recode-if-smaller decision logic against real bytes."""

import os
import struct
import zlib

import numpy as np
import pytest

from goscrape_spark.functions.imagecodec import (
    jpeg_decode,
    jpeg_encode,
    png_decode,
    png_encode,
)
from goscrape_spark.operators.images import recode_image_bytes


def _test_image(h=56, w=72, seed=0):
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([(x * 3) % 256, (y * 4) % 256, ((x + y) * 2) % 256],
                   axis=2)
    return np.clip(img + rng.randint(-8, 8, img.shape), 0,
                   255).astype(np.uint8)


def test_png_roundtrip_bit_exact():
    img = _test_image()
    assert (png_decode(png_encode(img)) == img).all()


def test_png_all_filters_decode():
    """Hand-filter four scanlines with filter types 1-4 (Sub/Up/Average/
    Paeth per RFC 2083 §6) and check the decoder reconstructs them."""
    img = _test_image(h=4, w=9, seed=3)
    ch, stride = 3, 9 * 3
    rows = [img[y].reshape(-1).astype(int) for y in range(4)]
    raw = bytearray()

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    prev = [0] * stride
    for y, ftype in enumerate([1, 2, 3, 4]):
        cur = rows[y]
        filt = []
        for i in range(stride):
            left = cur[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            pred = {1: left, 2: up, 3: (left + up) >> 1,
                    4: paeth(left, up, ul)}[ftype]
            filt.append((cur[i] - pred) & 0xFF)
        raw.append(ftype)
        raw.extend(filt)
        prev = list(cur)

    def chunk(typ, payload):
        return (struct.pack(">I", len(payload)) + typ + payload +
                struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n" +
           chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 4, 8, 2, 0, 0, 0)) +
           chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    assert (png_decode(png) == img).all()


def _chunk(typ, payload):
    return (struct.pack(">I", len(payload)) + typ + payload +
            struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))


def test_png_palette_trns_premultiplies():
    """Palette PNG (color type 3) with a tRNS chunk: transparent entries
    must premultiply onto black like the other alpha paths (the
    reference's Go decode honors tRNS)."""
    # palette: red, green, blue; tRNS: red opaque, green half, blue omitted
    plte = bytes([255, 0, 0, 0, 200, 0, 0, 0, 250])
    trns = bytes([255, 128])
    idx = np.array([[0, 1, 2]], dtype=np.uint8)   # 1x3, one index per px
    raw = b"\x00" + idx.tobytes()
    png = (b"\x89PNG\r\n\x1a\n" +
           _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 1, 8, 3, 0, 0, 0)) +
           _chunk(b"PLTE", plte) + _chunk(b"tRNS", trns) +
           _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    dec = png_decode(png)
    assert dec is not None
    assert (dec[0, 0] == [255, 0, 0]).all()          # opaque
    assert (dec[0, 1] == [0, 100, 0]).all()          # (200*128+127)//255
    assert (dec[0, 2] == [0, 0, 250]).all()          # beyond tRNS -> opaque


def test_png_slow_filter_cap_bails_out(monkeypatch):
    """Average/Paeth rows beyond the per-image byte budget make the
    vendored decoder return None (caller keeps original bytes) instead of
    pinning an executor core in the per-byte Python loop."""
    import goscrape_spark.functions.imagecodec as mod

    img = _test_image(h=8, w=16, seed=5)
    # filter every row with Paeth (type 4) via the encoder-side transform
    ch, stride = 3, 16 * 3
    raw = bytearray()
    prev = [0] * stride
    for y in range(8):
        cur = img[y].reshape(-1).astype(int)
        raw.append(4)
        for i in range(stride):
            left = int(cur[i - ch]) if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if pa <= pb and pa <= pc else \
                (up if pb <= pc else ul)
            raw.append((int(cur[i]) - pred) & 0xFF)
        prev = list(cur)
    png = (b"\x89PNG\r\n\x1a\n" +
           _chunk(b"IHDR", struct.pack(">IIBBBBB", 16, 8, 8, 2, 0, 0, 0)) +
           _chunk(b"IDAT", zlib.compress(bytes(raw))) +
           _chunk(b"IEND", b""))
    assert (png_decode(png) == img).all()            # within budget: decodes
    monkeypatch.setattr(mod, "_SLOW_FILTER_BYTE_CAP", stride * 4)
    assert png_decode(png) is None                   # over budget: bail out


def test_png_rgba_premultiplies_like_go():
    """Alpha composites onto black — what Go's image/jpeg sees through
    NRGBA.RGBA() in the reference's recodePNG path."""
    px = np.array([[[200, 100, 50, 255], [200, 100, 50, 128],
                    [200, 100, 50, 0]]], dtype=np.uint8)
    h, w = 1, 3
    raw = b"\x00" + px.tobytes()

    def chunk(typ, payload):
        return (struct.pack(">I", len(payload)) + typ + payload +
                struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n" +
           chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)) +
           chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    got = png_decode(png)
    assert (got[0, 0] == [200, 100, 50]).all()
    assert (got[0, 2] == [0, 0, 0]).all()
    assert abs(int(got[0, 1, 0]) - 200 * 128 // 255) <= 1


def test_jpeg_roundtrip_quality():
    img = _test_image()
    sizes = []
    for q in (30, 75, 90):
        jp = jpeg_encode(img, q)
        assert jp.startswith(b"\xff\xd8") and jp.endswith(b"\xff\xd9")
        dec = jpeg_decode(jp)
        assert dec is not None and dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int)).mean()
        assert err < 20, (q, err)
        sizes.append(len(jp))
    assert sizes[0] < sizes[2]   # lower quality -> smaller file


def test_jpeg_decode_rejects_garbage():
    assert jpeg_decode(b"\xff\xd8garbage") is None
    assert jpeg_decode(b"not a jpeg") is None
    # progressive (SOF2) must be declined, not mis-decoded
    img = _test_image(16, 16)
    jp = bytearray(jpeg_encode(img, 75))
    jp[jp.index(b"\xff\xc0") + 1] = 0xC2
    assert jpeg_decode(bytes(jp)) is None


def test_jpeg_decode_external_baseline():
    """A JPEG produced by a real encoder (subsampled) decodes.

    Fixture: ``python.jpg`` ships with CPython's own test suite
    (Lib/test/test_email/data/python.jpg) — resolved portably from the
    installed ``test`` package location.
    """
    import importlib.util

    spec = importlib.util.find_spec("test")
    if not (spec and spec.submodule_search_locations):
        pytest.skip("CPython test package not installed on this host")
    path = os.path.join(next(iter(spec.submodule_search_locations)),
                        "test_email", "data", "python.jpg")
    if not os.path.exists(path):
        pytest.skip("CPython test-suite fixture not shipped in this build")
    dec = jpeg_decode(open(path, "rb").read())
    assert dec is not None and dec.shape == (16, 16, 3)


# ---------------------------------------------------------------------------
# the reference's decision logic (images.go:17-99) against real bytes
# ---------------------------------------------------------------------------


def test_recode_png_to_smaller_jpeg():
    img = _test_image(80, 120, seed=1)
    png = png_encode(img)
    out = recode_image_bytes(png, 40)
    assert out.startswith(b"\xff\xd8")        # became a JPEG
    assert len(out) < len(png)                # ...because it was smaller
    dec = jpeg_decode(out)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 20


def test_recode_keeps_original_when_not_smaller():
    # a tiny image: JPEG header overhead dominates, recode comes out larger
    img = np.full((2, 2, 3), 128, dtype=np.uint8)
    png = png_encode(img)
    assert recode_image_bytes(png, 90) == png


def test_recode_passthrough_cases():
    img = _test_image(16, 16)
    png = png_encode(img)
    assert recode_image_bytes(png, 0) == png       # quality 0 = disabled
    assert recode_image_bytes(png, 100) == png     # out-of-range = disabled
    assert recode_image_bytes(b"GIF89a...", 50) == b"GIF89a..."
    truncated = png[:40]                           # decode error -> keep
    assert recode_image_bytes(truncated, 50) == truncated


def test_recode_jpeg_to_jpeg_lower_quality():
    img = _test_image(64, 96, seed=2)
    hi = jpeg_encode(img, 95)
    out = recode_image_bytes(hi, 30)
    assert len(out) < len(hi)
    assert jpeg_decode(out) is not None


def test_png_truecolor_and_gray_trns_color_key():
    """tRNS color keys for color types 2 and 0: matching pixels decode
    transparent -> premultiplied to black (Go's decode honors these too)."""
    img = np.zeros((1, 3, 3), np.uint8)
    img[0] = [[10, 20, 30], [1, 2, 3], [10, 20, 30]]
    raw = b"\x00" + img.tobytes()
    png = (b"\x89PNG\r\n\x1a\n" +
           _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 1, 8, 2, 0, 0, 0)) +
           _chunk(b"tRNS", struct.pack(">HHH", 10, 20, 30)) +
           _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    dec = png_decode(png)
    assert (dec[0, 0] == [0, 0, 0]).all()        # keyed -> black
    assert (dec[0, 1] == [1, 2, 3]).all()        # unkeyed -> unchanged
    assert (dec[0, 2] == [0, 0, 0]).all()

    gray = np.array([[7, 8, 7]], np.uint8).reshape(1, 3, 1)
    raw = b"\x00" + gray.tobytes()
    png = (b"\x89PNG\r\n\x1a\n" +
           _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 1, 8, 0, 0, 0, 0)) +
           _chunk(b"tRNS", struct.pack(">H", 7)) +
           _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    dec = png_decode(png)
    assert (dec[0, 0] == 0).all() and (dec[0, 2] == 0).all()
    assert (dec[0, 1] == [8, 8, 8]).all()


def test_png_zlib_bomb_output_is_bounded():
    """A PNG declaring tiny dimensions whose IDAT inflates to ~100 MB must
    decode the declared pixels only — decompression output is hard-bounded
    at h*(stride+1), so the bomb cannot allocate gigabytes per task."""
    import tracemalloc

    img = np.array([[[10, 20, 30], [40, 50, 60]],
                    [[70, 80, 90], [1, 2, 3]]], dtype=np.uint8)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(2))
    bomb = zlib.compress(raw + b"\x00" * (100 << 20), 9)   # ~100 KB input
    png = (b"\x89PNG\r\n\x1a\n" +
           _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)) +
           _chunk(b"IDAT", bomb) + _chunk(b"IEND", b""))
    tracemalloc.start()
    dec = png_decode(png)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert (dec == img).all()              # declared pixels decode exactly
    assert peak < 8 << 20                  # bounded, not the 100 MB payload


def test_png_absurd_dimensions_refused_before_decompress():
    """IHDR dimensions implying > _DECODE_BYTE_CAP raw bytes are refused
    up front — no decompression happens at all."""
    png = (b"\x89PNG\r\n\x1a\n" +
           _chunk(b"IHDR",
                  struct.pack(">IIBBBBB", 2 ** 30, 2 ** 30, 8, 2, 0, 0, 0)) +
           _chunk(b"IDAT", zlib.compress(b"\x00" * 16)) +
           _chunk(b"IEND", b""))
    assert png_decode(png) is None


def test_png_truncated_stream_with_window_tail():
    """A stream whose final bytes sit in the inflate window (input fully
    consumed before the output budget is reached) still decodes via the
    bounded flush path."""
    img = _test_image(h=3, w=5, seed=9)
    assert (png_decode(png_encode(img)) == img).all()
