"""Fused per-page pass (process_pages_df) must agree with the separate
extract / rewrite / sniff / path operators it replaces."""

from pyspark.sql import functions as F

from goscrape_spark.functions.filetype import sniff_extension
from goscrape_spark.functions.urlmath import get_file_path
from goscrape_spark.functions.urlnorm import parse_url
from goscrape_spark.operators.extract import (
    extract_media_refs,
    process_pages_df,
    ref_dedup_key,
)
from goscrape_spark.operators.rewrite import rewrite_document

HOST = "fused.example.org"

PAGES = [
    (f"https://{HOST}/", b'<html><a href="/p1">x</a>'
     b'<img src="/i.png" srcset="/s1.png 480w, /s2.png 800w">'
     b'<link href="/css/a.css" rel="stylesheet">'
     b'<style>h1 { background: url(/bg.png); }</style></html>', 0),
    (f"https://{HOST}/p1", b'<html><body background="b.gif">'
     b'<a href="https://other.net/ext">e</a></body></html>', 1),
    (f"https://{HOST}/logo.png", b"\x89PNG\r\n\x1a\nrawbytes", 2),
    (f"https://{HOST}/empty", b"", 3),
]


def test_fused_matches_components(spark):
    df = spark.createDataFrame(PAGES, "url string, body binary, seq bigint")
    got = {r.url: r for r in
           process_pages_df(df, HOST, "out").collect()}
    assert set(got) == {u for u, _, _ in PAGES}
    for url, body, seq in PAGES:
        r = got[url]
        text = body.decode("utf-8", errors="replace")
        is_page = sniff_extension(body) == ""
        assert r.seq == seq
        assert r.is_page == is_page
        assert r.file_path == get_file_path(parse_url(url), HOST, "out",
                                            is_page)
        want_refs = [
            {"kind": k, "media_ref": m, "ref_no_frag": nf,
             "scheme": s, "host": h, "path": p,
             "dedup_key": ref_dedup_key(nf, h, p, HOST)}
            for k, m, nf, s, h, p in extract_media_refs(text, url)
            if s in ("http", "https")]
        assert [row.asDict() for row in r.refs] == want_refs
        if is_page:
            new_text, changed = rewrite_document(text, url, HOST)
            want = new_text.encode("utf-8") if changed else body
        else:
            want = body
        assert bytes(r.body) == want
    # the binary page keeps its raw bytes and original path
    png = got[f"https://{HOST}/logo.png"]
    assert not png.is_page and bytes(png.body).startswith(b"\x89PNG")
    assert png.file_path.endswith("/logo.png")
