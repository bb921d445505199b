"""Real-HTTP fetch stage against a localhost server (no external network)."""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from goscrape_spark.config import CrawlConfig
from goscrape_spark.sources.fetch import http_fetch_df

HITS = {}


class Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        HITS[self.path] = HITS.get(self.path, 0) + 1
        if self.path == "/flaky" and HITS[self.path] <= 2:
            self.send_response(429)
            self.end_headers()
            return
        if self.path == "/missing":
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.end_headers()
        self.wfile.write(f"<html>page {self.path} ua={self.headers.get('User-Agent')}</html>".encode())

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_http_fetch(spark, server):
    urls = [(f"{server}/a",), (f"{server}/b",), (f"{server}/flaky",),
            (f"{server}/missing",)]
    frontier = spark.createDataFrame(urls, "url string")
    cfg = CrawlConfig(url=server, user_agent="goscrape-spark-test",
                      retry_delay_ms=10)
    out = {r.url: r for r in http_fetch_df(frontier, cfg).collect()}
    assert out[f"{server}/a"].status == "ok"
    assert b"page /a" in bytes(out[f"{server}/a"].body)
    assert b"ua=goscrape-spark-test" in bytes(out[f"{server}/a"].body)
    assert out[f"{server}/flaky"].status == "ok"
    assert out[f"{server}/flaky"].attempts == 3  # two 429s then success
    assert out[f"{server}/missing"].status == "missing"
