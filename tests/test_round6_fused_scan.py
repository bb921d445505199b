"""Round-6 optimization guard: the single-scan fused page pass
(extract.process_page) must agree byte-for-byte with the separate
extract_media_refs + rewrite_document it fuses — including the
ignored-prefix node-abort quirk, srcset handling, style blocks, duplicate
attrs, unparsable refs, and binary/empty bodies."""

from goscrape_spark.operators.extract import extract_media_refs, process_page
from goscrape_spark.operators.rewrite import rewrite_document

HOST = "fused.example.org"

BODIES = [
    # the synthetic-bench page shape: style urls + img/srcset + links
    '<html><head><title>p</title>\n'
    "<style>h1 { background: url('/img/bg3.png'); } "
    ".x { background: url(/img/tile7.png); }</style></head>\n"
    '<body background="/img/body-bg.png">\n<p>lorem ipsum</p>\n'
    '<img src="https://a1.assets.example.com/img/9.png" '
    'srcset="/img/s9-480.png 480w, /img/s9-800.png 800w">\n'
    '<a href="/p/1">l</a>\n<a href="/p/2">l</a>\n</body></html>',
    # ignored-prefix node abort: earlier attr rewritten, then # aborts node
    '<img data-src="/real.png" src="#frag"><a href="/x">k</a>',
    '<a href="data:text/plain,hi">d</a><a href="mailto:x@y">m</a>'
    '<a href="/#top">t</a>',
    # duplicate attr (first wins), unquoted + single-quoted values
    "<img src=/a.png src=/b.png><a href='/q?x=1#f'>q</a>",
    # unparsable ref (control char) + empty value + external link/asset
    '<a href="">e</a><img src="ht tp://bad\x00url">'
    '<a href="https://other.net/page">ext</a>'
    '<img src="https://other.net/pic.jpg">',
    # entities in attrs, srcset with descriptors and spacing
    '<a href="/p?a=1&amp;b=2">amp</a>'
    '<img srcset=" s1.png  2x , /abs/s2.png ">',
    # style with no rewrites needed (already-relative refs stay)
    "<style>.a { background: url(rel.png); }</style>",
    # nested/raw-text edge: style inside comment is skipped by the scanner
    "<!-- <style>.c{background:url(/no.png)}</style> --><a href=/ok>o</a>",
    "",  # empty body
]


def test_process_page_matches_components():
    for i, text in enumerate(BODIES):
        url = f"https://{HOST}/p/{i}" if i % 2 else f"https://{HOST}/d{i}/"
        want_refs = extract_media_refs(text, url)
        want_text, want_changed = rewrite_document(text, url, HOST)
        got_refs, got_text, got_changed = process_page(text, url, HOST)
        assert got_refs == want_refs, f"refs diverge on body {i}"
        assert got_changed == want_changed, f"changed flag diverges on {i}"
        assert got_text == (want_text if want_changed else text), \
            f"rewritten text diverges on body {i}"


def test_process_page_no_rewrite_mode():
    text = '<a href="/x">k</a><img src="/i.png">'
    url = f"https://{HOST}/p"
    refs, out, changed = process_page(text, url, HOST, do_rewrite=False)
    assert refs == extract_media_refs(text, url)
    assert out == text and changed is False
