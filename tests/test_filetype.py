"""F11 magic-byte classifier: Python sniff + column expression agree and
cover the h2non/filetype matcher families the reference consults
(scraper/scraper.go:187-191)."""

from goscrape_spark.functions.filetype import (
    SNIFF_HEAD_BYTES,
    _SIGNATURES,
    col_file_extension,
    sniff_extension,
)

CASES = [
    (b"\xff\xd8\xff\xe0jfif", "jpg"),
    (b"\x89PNG\r\n\x1a\nidat", "png"),
    (b"GIF89a", "gif"),
    (b"RIFF\x00\x00\x00\x00WEBPVP8", "webp"),
    (b"RIFF\x00\x00\x00\x00WAVEfmt", "wav"),
    (b"RIFF\x00\x00\x00\x00AVI LIST", "avi"),
    (b"%PDF-1.7", "pdf"),
    (b"PK\x03\x04word/", "zip"),
    (b"\x1f\x8b\x08", "gz"),
    (b"x" * 257 + b"ustar\x0000", "tar"),
    (b"Rar!\x1a\x07\x01\x00", "rar"),
    (b"7z\xbc\xaf\x27\x1c", "7z"),
    (b"BZh91AY", "bz2"),
    (b"\xfd7zXZ\x00", "xz"),
    (b"\x28\xb5\x2f\xfd", "zst"),
    (b"MZ\x90\x00", "exe"),
    (b"\x7fELF\x02", "elf"),
    (b"SQLite format 3\x00", "sqlite"),
    (b"{\\rtf1\\ansi", "rtf"),
    (b"\x00\x00\x00\x18ftypmp42", "mp4"),
    (b"\x1aE\xdf\xa3\x01", "webm"),
    (b"FLV\x01\x05", "flv"),
    (b"ID3\x03", "mp3"),
    (b"OggS\x00", "ogg"),
    (b"fLaC\x00", "flac"),
    (b"MThd\x00", "mid"),
    (b"wOFF\x00", "woff"),
    (b"wOF2\x00", "woff2"),
    (b"OTTO\x00", "otf"),
    (b"x" * 128 + b"DICM", "dcm"),
    # unknowns stay pages
    (b"<html><body>hi</body></html>", ""),
    (b"body { color: red }", ""),
    (b"", ""),
]


def test_sniff_extension_table():
    for data, want in CASES:
        assert sniff_extension(data) == want, data[:20]


def test_signatures_fit_head_window():
    assert all(off + len(magic) <= SNIFF_HEAD_BYTES
               for _, magic, off in _SIGNATURES)


def test_col_file_extension_matches_python(spark):
    df = spark.createDataFrame([(i, bytearray(d)) for i, (d, _) in
                                enumerate(CASES)], "i int, body binary")
    got = {r.i: r.ext for r in
           df.select("i", col_file_extension(df.body).alias("ext")).collect()}
    for i, (data, want) in enumerate(CASES):
        assert got[i] == want, (i, data[:20])
