"""CLI flag surface + mock-web crawl through the command line."""

import os

from goscrape_spark.cli import build_parser, run
from goscrape_spark.sources.fixtures import SITE_CSS, pages_df


def test_parser_flags():
    p = build_parser()
    a = p.parse_args(["https://x.org/", "--depth", "2", "--include", "^/a",
                      "--exclude", "b$", "--header", "X-T:1",
                      "--user", "u:pw", "--imagequality", "80"])
    assert a.urls == ["https://x.org/"] and a.depth == 2
    assert a.include == ["^/a"] and a.exclude == ["b$"]
    assert a.user == "u:pw" and a.imagequality == 80
    # the reference defaults --depth to 10, NOT unlimited (main.go:32)
    assert p.parse_args(["https://x.org/"]).depth == 10


def test_cli_crawl_mock_web(spark, tmp_path):
    pages_path = str(tmp_path / "pages.parquet")
    pages_df(spark, SITE_CSS).write.parquet(pages_path)
    out = str(tmp_path / "out")
    rc = run(["https://example.org/", "--pages-parquet", pages_path,
              "--output", out], spark=spark)
    assert rc == 0
    idx = os.path.join(out, "example.org", "index.html")
    assert os.path.exists(idx)
    assert "url('background.jpg')" in open(idx).read()


def test_cli_robots_sitemaps_bloom_flags(spark, tmp_path):
    """The round-5 extension flags end-to-end through the argv path:
    --robots installs fixture rules, --sitemaps seeds from the fixture's
    robots Sitemap line, --bloom enables the pre-filter (same output)."""
    base = "http://flags.example"
    pages = {
        f"{base}/robots.txt": (f"User-agent: *\nDisallow: /private/\n"
                               f"Sitemap: {base}/sm.xml\n"),
        f"{base}/": ('<html><a href="/private/x.html">x</a>'
                     '<a href="/pub.html">p</a></html>'),
        f"{base}/private/x.html": "<html>blocked</html>",
        f"{base}/pub.html": "<html>public</html>",
        f"{base}/sm.xml":
            f"<urlset><url><loc>{base}/extra.html</loc></url></urlset>",
        f"{base}/extra.html": "<html>sitemap-only</html>",
    }
    pages_path = str(tmp_path / "pages.parquet")
    pages_df(spark, pages).write.parquet(pages_path)
    out = str(tmp_path / "out")
    rc = run([f"{base}/", "--pages-parquet", pages_path, "--output", out,
              "--robots", "--sitemaps", "--bloom"], spark=spark)
    assert rc == 0
    root = os.path.join(out, "flags.example")
    assert os.path.exists(os.path.join(root, "pub.html"))
    assert os.path.exists(os.path.join(root, "extra.html"))   # via sitemap
    assert not os.path.exists(os.path.join(root, "private"))  # via robots
