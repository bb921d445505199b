"""Magic-byte content sniffing (F11).

The reference uses ``h2non/filetype.Match`` to distinguish known binary types
from HTML pages (scraper/scraper.go:187-191): a recognized type keeps its
original path and skips link rewriting; an unknown type is treated as an HTML
page.  We port the signature subset that matters for web content; everything
else is "unknown" (= page), which matches the reference for text content
(h2non/filetype has no text matchers).

Spark fast path: :func:`col_file_extension` is a pure column expression over
the first bytes of a binary column — no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (extension, magic prefix, offset) — mirrors h2non/filetype matchers for the
# formats a crawler meets. Checked in order; first match wins.
_SIGNATURES: list[tuple[str, bytes, int]] = [
    ("jpg", b"\xff\xd8\xff", 0),
    ("png", b"\x89PNG\r\n\x1a\n", 0),
    ("gif", b"GIF8", 0),
    ("webp", b"WEBP", 8),
    ("bmp", b"BM", 0),
    ("ico", b"\x00\x00\x01\x00", 0),
    ("tif", b"II*\x00", 0),
    ("tif", b"MM\x00*", 0),
    ("pdf", b"%PDF", 0),
    ("zip", b"PK\x03\x04", 0),
    ("gz", b"\x1f\x8b", 0),
    ("mp4", b"ftyp", 4),
    ("mp3", b"ID3", 0),
    ("ogg", b"OggS", 0),
    ("wav", b"WAVE", 8),
    ("woff", b"wOFF", 0),
    ("woff2", b"wOF2", 0),
    ("ttf", b"\x00\x01\x00\x00", 0),
    ("otf", b"OTTO", 0),
]


def sniff_extension(data: bytes) -> str:
    """Return the matched file extension, or '' for unknown (= HTML page)."""
    if not data:
        return ""
    for ext, magic, off in _SIGNATURES:
        if data[off : off + len(magic)] == magic:
            return ext
    return ""


def col_file_extension(body: Column) -> Column:
    """F11 as a pure column expression: magic-prefix compare on the binary
    body column; '' means unknown/page."""
    expr = F.lit("")
    # build the when-chain in reverse so the first signature has priority
    for ext, magic, off in reversed(_SIGNATURES):
        prefix = F.substring(body, off + 1, len(magic))
        expr = F.when(prefix == F.lit(bytearray(magic)), F.lit(ext)).otherwise(expr)
    return expr
