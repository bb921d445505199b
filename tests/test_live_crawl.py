"""Live end-to-end crawl: the full engine against a real localhost HTTP
server — fetch (S1/S2), extraction, admission, CSS discovery, rewrite, and
export all through the production (non-mock) path."""

import os
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from goscrape_spark.config import CrawlConfig
from goscrape_spark.plans.crawl import crawl
from goscrape_spark.sources.export import export_output_tree

PAGES = {
    "/": ('<html><head><link href="/site.css" rel="stylesheet"></head>'
          '<body><a href="/page2">p2</a><img src="/logo.png"></body></html>'),
    "/page2": '<html><body><a href="/">home</a><a href="/page3/">x</a></body></html>',
    "/page3/": "<html><body>leaf</body></html>",
    # css-discovered refs must be ABSOLUTE to be admitted (the reference
    # enqueues the raw unresolved url() src, css/css.go:44-52); {BASE} is
    # substituted with the live server origin per request
    "/site.css": "body { background: url({BASE}/bg.png); }",
    "/logo.png": "PNGDATA",
    "/bg.png": "BGDATA",
}


class Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        body = PAGES.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.end_headers()
        body = body.replace("{BASE}", f"http://{self.headers['Host']}")
        self.wfile.write(body.encode())

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_live_crawl_end_to_end(spark, server, tmp_path):
    host = server.split("//")[1]
    res = crawl(spark, CrawlConfig(url=f"{server}/"), pages=None, live=True)
    assert res.seen_set() == {"/", "/page2", "/page3", "/site.css",
                              "/logo.png", "/bg.png"}
    order = [(r.url, r.kind) for r in res.ordered_fetches()]
    assert order == [
        (f"{server}/", "page"),
        (f"{server}/site.css", "asset"),      # link stage
        (f"{server}/logo.png", "asset"),      # images stage
        (f"{server}/bg.png", "asset"),        # css-discovered
        (f"{server}/page2", "page"),
        (f"{server}/page3/", "page"),
    ]
    root = str(tmp_path / "live")
    export_output_tree(res.output, root)
    index = open(os.path.join(root, host, "index.html")).read()
    assert 'href="site.css"' in index
    assert 'src="logo.png"' in index
    assert 'href="page2.html"' in index
    # css file stored unrewritten (reference's dead cssProcessor rewrite)
    css = open(os.path.join(root, host, "site.css")).read()
    assert f"url({server}/bg.png)" in css