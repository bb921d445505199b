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
# formats a crawler meets (image/video/audio/font/archive/document sets of
# github.com/h2non/filetype, prefix-checkable subset). Checked in order;
# first match wins.  Only the MATCH/NO-MATCH outcome affects crawl parity
# (scraper/scraper.go:187-191 uses the extension solely to pick binary vs
# page handling); the extension string itself feeds the media-kind metadata.
_SIGNATURES: list[tuple[str, bytes, int]] = [
    # images
    ("jpg", b"\xff\xd8\xff", 0),
    ("png", b"\x89PNG\r\n\x1a\n", 0),
    ("gif", b"GIF8", 0),
    ("webp", b"WEBP", 8),
    ("bmp", b"BM", 0),
    ("ico", b"\x00\x00\x01\x00", 0),
    ("tif", b"II*\x00", 0),
    ("tif", b"MM\x00*", 0),
    ("psd", b"8BPS", 0),
    # documents / archives
    ("pdf", b"%PDF", 0),
    ("zip", b"PK\x03\x04", 0),     # also docx/xlsx/pptx/epub containers
    ("gz", b"\x1f\x8b", 0),
    ("tar", b"ustar", 257),
    ("rar", b"Rar!\x1a\x07", 0),
    ("7z", b"7z\xbc\xaf\x27\x1c", 0),
    ("bz2", b"BZh", 0),
    ("xz", b"\xfd7zXZ\x00", 0),
    ("zst", b"\x28\xb5\x2f\xfd", 0),
    ("exe", b"MZ", 0),
    ("elf", b"\x7fELF", 0),
    ("sqlite", b"SQLite", 0),
    ("rtf", b"{\\rtf", 0),
    ("ps", b"%!", 0),
    ("swf", b"CWS", 0),
    ("swf", b"FWS", 0),
    ("deb", b"!<arch>", 0),
    ("crx", b"Cr24", 0),
    ("dcm", b"DICM", 128),
    # video
    ("mp4", b"ftyp", 4),           # also m4v/mov/heic/avif ftyp containers
    ("webm", b"\x1aE\xdf\xa3", 0),  # EBML: webm/mkv
    ("avi", b"AVI ", 8),
    ("flv", b"FLV\x01", 0),
    ("mpg", b"\x00\x00\x01\xba", 0),
    ("wmv", b"\x30\x26\xb2\x75\x8e\x66\xcf\x11", 0),
    # audio
    ("mp3", b"ID3", 0),
    ("ogg", b"OggS", 0),
    ("wav", b"WAVE", 8),
    ("flac", b"fLaC", 0),
    ("mid", b"MThd", 0),
    ("amr", b"#!AMR", 0),
    ("aiff", b"AIFF", 8),
    # fonts
    ("woff", b"wOFF", 0),
    ("woff2", b"wOF2", 0),
    ("ttf", b"\x00\x01\x00\x00", 0),
    ("otf", b"OTTO", 0),
]


# bytes of body prefix that suffice for every signature above (max offset +
# max magic length, padded); lets light-weight stages ship only a head slice
SNIFF_HEAD_BYTES = 300


# first-byte dispatch: a page body (e.g. '<') only probes the handful of
# signatures that could still match (non-zero offsets), not all of them
_OFFSET_SIGS = [s for s in _SIGNATURES if s[2] != 0]
_JUMP: dict[int, list[tuple[str, bytes, int]]] = {
    first: [s for s in _SIGNATURES if s[2] != 0 or s[1][0] == first]
    for first in {m[0] for _, m, off in _SIGNATURES if off == 0}
}


def sniff_extension(data: bytes) -> str:
    """Return the matched file extension, or '' for unknown (= HTML page)."""
    if not data:
        return ""
    for ext, magic, off in _JUMP.get(data[0], _OFFSET_SIGS):
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
