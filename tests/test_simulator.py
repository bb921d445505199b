"""Sequential-oracle tests pinned to the Go tests' golden values
(scraper/scraper_test.go:47-195)."""

from goscrape_spark.config import CrawlConfig
from goscrape_spark.plans.simulator import crawl_sequential
from goscrape_spark.sources.fixtures import (
    SITE_ATTRS,
    SITE_CSS,
    SITE_LINKS,
    SITE_LINKS_START,
)


def test_scraper_links():
    # TestScraperLinks (scraper/scraper_test.go:47-96)
    res = crawl_sequential(CrawlConfig(url=SITE_LINKS_START), SITE_LINKS)
    assert res.error is None
    assert res.seen == {"/", "/page2", "/sub", "/style.css"}
    # BFS + per-page stage order: / -> style.css (link asset) -> page2 -> /sub/
    assert [f.url for f in res.fetches] == [
        "https://example.org/",
        "https://example.org/style.css",
        "https://example.org/page2",
        "https://example.org/sub/",
    ]
    assert [f.kind for f in res.fetches] == ["page", "asset", "page", "page"]


def test_scraper_attributes():
    # TestScraperAttributes (scraper/scraper_test.go:98-132)
    res = crawl_sequential(CrawlConfig(url="https://example.org/"), SITE_ATTRS)
    assert res.seen == {"/", "/bg.gif"}
    assert [f.url for f in res.fetches] == [
        "https://example.org/", "https://example.org/bg.gif"]


def test_scraper_internal_css():
    # TestScraperInternalCss (scraper/scraper_test.go:134-195)
    res = crawl_sequential(CrawlConfig(url="https://example.org/"), SITE_CSS)
    assert res.seen == {"/", "/background.jpg", "/img/bg.jpg", "/bg3.jpg"}
    content = res.files["example.org/index.html"].decode()
    assert "url('background.jpg')" in content
    assert "url('img/bg.jpg')" in content
    assert "url(bg3.jpg)" in content  # unquoted already-relative: unchanged


def test_max_depth():
    # depth semantics (scraper/checks.go:57-60 + scraper.go:229): pages exist
    # at levels 0..max_depth
    pages = {
        "https://example.org/": '<a href="/p1">x</a>',
        "https://example.org/p1": '<a href="/p2">x</a>',
        "https://example.org/p2": '<a href="/p3">x</a>',
    }
    res = crawl_sequential(CrawlConfig(url="https://example.org/", max_depth=1),
                           pages)
    assert [f.url for f in res.fetches] == [
        "https://example.org/", "https://example.org/p1"]
    # /p2 was REJECTED by depth but still poisons the seen set (checks.go:42-60)
    assert res.seen == {"/", "/p1", "/p2"}


def test_include_exclude():
    pages = {
        "https://example.org/": '<a href="/keep/a">x</a><a href="/drop/b">x</a>',
        "https://example.org/keep/a": "",
    }
    res = crawl_sequential(
        CrawlConfig(url="https://example.org/", includes=["^/$", "^/keep"]),
        pages)
    assert [f.url for f in res.fetches] == [
        "https://example.org/", "https://example.org/keep/a"]
    assert res.seen == {"/", "/keep/a", "/drop/b"}

    res2 = crawl_sequential(
        CrawlConfig(url="https://example.org/", excludes=["^/drop"]), pages)
    assert [f.url for f in res2.fetches] == [
        "https://example.org/", "https://example.org/keep/a"]


def test_external_pages_not_followed_assets_downloaded():
    pages = {
        "https://example.org/": ('<a href="https://other.com/x">x</a>'
                                 '<img src="https://other.com/i.png">'),
        "https://other.com/i.png": "px",
    }
    res = crawl_sequential(CrawlConfig(url="https://example.org/"), pages)
    # external page rejected (checks.go:51-55) but key inserted; external
    # asset fetched, keyed by full URL
    assert res.seen == {"/", "https://other.com/x", "https://other.com/i.png"}
    assert [f.url for f in res.fetches] == [
        "https://example.org/", "https://other.com/i.png"]
    # external asset stored under _other.com/ (fileutil.go:34-38)
    assert "example.org/_other.com/i.png" in res.files


def test_retry_exhaustion():
    from goscrape_spark.plans.simulator import PageFixture
    pages = {
        "https://example.org/": '<img src="/a.png"><img src="/b.png">',
        "https://example.org/a.png": PageFixture(body=b"x", retry_after=3),
        "https://example.org/b.png": PageFixture(body=b"x", retry_after=11),
    }
    res = crawl_sequential(CrawlConfig(url="https://example.org/"), pages)
    recs = {f.url: f for f in res.fetches}
    assert recs["https://example.org/a.png"].status == "ok"
    assert recs["https://example.org/a.png"].attempts == 4
    assert recs["https://example.org/b.png"].status == "exhausted"


def test_depth0_redirect_rebase():
    from goscrape_spark.plans.simulator import PageFixture
    # scraper.go:193-198: response URL of the seed becomes the new base —
    # changes the same-host predicate mid-crawl
    pages = {
        "https://old.org/": PageFixture(
            body=b'<a href="https://new.org/p">x</a>',
            resp_url="https://new.org/"),
        "https://new.org/p": PageFixture(body=b""),
    }
    res = crawl_sequential(CrawlConfig(url="https://old.org/"), pages)
    assert [f.url for f in res.fetches] == [
        "https://old.org/", "https://new.org/p"]
    assert res.seen == {"/", "/p"}
