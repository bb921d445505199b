"""Ports of scraper/url_test.go + scraper/fileutil_test.go fixture tables."""

from goscrape_spark.functions.urlmath import (
    MAX_FILENAME_LENGTH,
    fnv1a_32,
    get_file_path,
    get_page_file_path,
    resolve_srcset_urls,
    resolve_url,
    split_srcset,
    truncate_filename,
    url_relative_to_other,
    url_relative_to_root,
)
from goscrape_spark.functions.urlnorm import GoURL, parse_url


def test_resolve_url():
    # TestResolveURL (scraper/url_test.go:10-43)
    pathless = GoURL(scheme="https", host="petpic.xyz", path="")
    url = GoURL(scheme="https", host="petpic.xyz", path="/earth/")
    cases = [
        (pathless, "", True, "", "index.html"),
        (pathless, "#contents", True, "", "#contents"),
        (url, "brasil/index.html", True, "", "brasil/index.html"),
        (url, "brasil/rio/index.html", True, "", "brasil/rio/index.html"),
        (url, "../argentina/cat.jpg", False, "", "../argentina/cat.jpg"),
    ]
    for base, ref, is_link, rel, expected in cases:
        assert resolve_url(base, ref, "petpic.xyz", is_link, rel) == expected, (ref, expected)


def test_url_relative_to_other():
    # Test_urlRelativeToOther (scraper/url_test.go:45-65)
    cases = [
        ("/earth/brasil/rio/cat.jpg", "/earth/brasil/rio/", "cat.jpg"),
        ("/earth/brasil/rio/cat.jpg", "/earth/", "brasil/rio/cat.jpg"),
        ("/earth/cat.jpg", "/earth/brasil/rio/", "../../cat.jpg"),
        ("/earth/argentina/cat.jpg", "/earth/brasil/rio/", "../../argentina/cat.jpg"),
        ("/earth/brasil/rio/cat.jpg", "/mars/dogtown/", "../../earth/brasil/rio/cat.jpg"),
        ("///earth//////cat.jpg", "///earth/brasil//rio////////", "../../cat.jpg"),
    ]
    for src, base, expected in cases:
        assert url_relative_to_other(GoURL(path=src), GoURL(path=base)) == expected, (src, base)


def test_url_relative_to_root():
    # Test_urlRelativeToRoot (scraper/url_test.go:67-84)
    cases = [
        ("/earth/brasil/rio/cat.jpg", "../../../"),
        ("cat.jpg", ""),
        ("/earth/argentina", "../"),
        ("///earth//////cat.jpg", "../"),
    ]
    for path, expected in cases:
        assert url_relative_to_root(GoURL(path=path)) == expected, path


def test_get_file_path():
    # TestGetFilePath (scraper/fileutil_test.go:14-45); output dir "" and
    # base URL https://google.com/ throughout.
    cases = [
        ("https://github.com/", "google.com/_github.com/index.html"),
        ("https://github.com/#fragment", "google.com/_github.com/index.html"),
        ("https://github.com/test", "google.com/_github.com/test.html"),
        ("https://github.com/test/", "google.com/_github.com/test/index.html"),
        ("https://github.com/test.aspx", "google.com/_github.com/test.aspx"),
        ("https://google.com/settings", "google.com/settings.html"),
    ]
    for download_url, expected in cases:
        u = parse_url(download_url)
        assert get_file_path(u, "google.com", "", True) == expected, download_url


def test_get_page_file_path():
    assert get_page_file_path(GoURL(path="")) == "index.html"
    assert get_page_file_path(GoURL(path="/")) == "index.html"
    assert get_page_file_path(GoURL(path="/a/")) == "/a/index.html"
    assert get_page_file_path(GoURL(path="/a")) == "/a.html"
    assert get_page_file_path(GoURL(path="/a.aspx")) == "/a.aspx"


def test_truncate_filename():
    # TestTruncateFilename (scraper/fileutil_test.go:47-110)
    assert truncate_filename("test.css") == "test.css"
    long_name = "very-" * 40 + "long-filename.css"
    out = truncate_filename(long_name)
    assert len(out) <= MAX_FILENAME_LENGTH and out.endswith(".css") and out != long_name
    no_ext = "very-" * 40 + "long-filename"
    out2 = truncate_filename(no_ext)
    assert len(out2) <= MAX_FILENAME_LENGTH and out2 != no_ext
    assert truncate_filename("") == ""
    at_max = "a" * MAX_FILENAME_LENGTH
    assert truncate_filename(at_max) == at_max
    # uniqueness via FNV suffix
    prefix = "this-is-a-very-long-filename-prefix" * 6
    r1 = truncate_filename(prefix + "-file1.css")
    r2 = truncate_filename(prefix + "-file2.css")
    assert r1 != r2
    assert len(r1) <= MAX_FILENAME_LENGTH and len(r2) <= MAX_FILENAME_LENGTH


def test_fnv1a_32_known_vectors():
    # Published FNV-1a 32 test vectors (public domain reference values)
    assert fnv1a_32(b"") == 0x811C9DC5
    assert fnv1a_32(b"a") == 0xE40C292C
    assert fnv1a_32(b"foobar") == 0xBF9CF968


def test_srcset():
    # htmlindex/htmlindex.go:158-173 via htmlindex_test.go fixtures
    assert split_srcset("test-480w.jpg 480w, test-800w.jpg 800w") == [
        "test-480w.jpg", "test-800w.jpg"]
    base = parse_url("http://domain.com")
    out = resolve_srcset_urls(
        base, "https://domain.com/test-480w.jpg 480w, https://domain.com/test-800w.jpg 800w",
        "domain.com", False, "")
    assert out == "test-480w.jpg 480w, test-800w.jpg 800w"
