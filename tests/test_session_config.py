"""S3/S4 session config ports (headers + cookie jar)."""

from datetime import datetime, timezone

from goscrape_spark.functions.cookies import (
    Cookie,
    cookie_header_value,
    parse_headers,
    read_cookie_file,
    save_cookies,
)


def test_parse_headers():
    # Headers() splits on the first ':' only (scraper/http.go:99-108)
    assert parse_headers(["X-A:1", "X-B:a:b", "bogus"]) == {
        "X-A": "1", "X-B": "a:b"}


def test_cookie_roundtrip(tmp_path):
    p = tmp_path / "cookies.json"
    cookies = [Cookie("sid", "abc",
                      datetime(2030, 1, 1, tzinfo=timezone.utc)),
               Cookie("theme", "dark")]
    save_cookies(str(p), cookies)
    back = read_cookie_file(str(p))
    assert [(c.name, c.value) for c in back] == [("sid", "abc"),
                                                 ("theme", "dark")]
    assert back[0].expires.year == 2030


def test_cookie_header_drops_expired():
    now = datetime(2026, 1, 1, tzinfo=timezone.utc)
    cookies = [Cookie("old", "x", datetime(2020, 1, 1, tzinfo=timezone.utc)),
               Cookie("new", "y", datetime(2030, 1, 1, tzinfo=timezone.utc)),
               Cookie("forever", "z")]
    assert cookie_header_value(cookies, now) == "new=y; forever=z"
