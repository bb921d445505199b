"""Property-based tests (hypothesis) for the pure URL/path kernels."""

from hypothesis import given, settings
from hypothesis import strategies as st

from goscrape_spark.functions.gopath import go_clean, go_join
from goscrape_spark.functions.urlmath import (
    MAX_FILENAME_LENGTH,
    fnv1a_32,
    truncate_filename,
)
from goscrape_spark.functions.urlnorm import (
    dedup_key,
    normalize_url_path,
    parse_url,
    resolve_reference,
    strip_fragment_str,
)

path_seg = st.text(alphabet="abcdefghij0123456789-_.", min_size=0, max_size=8)
paths = st.lists(path_seg, min_size=0, max_size=6).map(
    lambda segs: "/" + "/".join(segs))


@given(paths)
def test_normalize_contract(p):
    # Go's normalizeURLPath strips exactly ONE trailing slash
    # (strings.TrimSuffix, scraper/checks.go:18-20) — so "///" -> "//",
    # deliberately NOT idempotent; the port must match that, not "improve" it
    out = normalize_url_path(p)
    if p == "":
        assert out == "/"
    elif p != "/" and p.endswith("/"):
        assert out == p[:-1]
    else:
        assert out == p


@given(paths, st.text(alphabet="abc123", max_size=5))
def test_dedup_key_ignores_fragment(p, frag):
    base = f"https://h.example.com{p}"
    assert dedup_key(parse_url(strip_fragment_str(base + "#" + frag)),
                     "h.example.com") == \
        dedup_key(parse_url(base), "h.example.com")


@given(paths)
def test_absolute_ref_resolution_is_ref(p):
    base = parse_url("https://base.org/dir/page")
    ref = parse_url(f"https://other.org{p}")
    out = resolve_reference(base, ref)
    assert out.host == "other.org"
    # path survives modulo dot-segment removal (none present here unless
    # generated segments are '.'/'..')
    if "/./" not in p and "/../" not in p and "//" not in p \
            and not p.endswith("/.") and not p.endswith(".."):
        assert out.path == p


@given(st.lists(path_seg, min_size=1, max_size=5))
def test_go_join_clean_invariants(segs):
    joined = go_join(*segs)
    if joined:
        assert go_clean(joined) == joined  # join output is already clean
        assert "//" not in joined


@given(st.binary(max_size=64))
def test_fnv_reference(data):
    # independent reference implementation
    h = 0x811C9DC5
    for b in data:
        h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
    assert fnv1a_32(data) == h


@given(st.text(alphabet="abcdefg.", min_size=0, max_size=400))
@settings(max_examples=200)
def test_truncate_bounds(name):
    out = truncate_filename(name)
    assert len(out) <= max(len(name), MAX_FILENAME_LENGTH)
    if len(name) <= MAX_FILENAME_LENGTH:
        assert out == name
    else:
        assert len(out) <= MAX_FILENAME_LENGTH


@given(st.text(alphabet="abcdefg.", min_size=201, max_size=400),
       st.text(alphabet="xyz", min_size=1, max_size=3))
def test_truncate_distinguishes_suffixes(name, suffix):
    a = truncate_filename(name + suffix + ".css")
    b = truncate_filename(name + suffix + "q.css")
    assert a != b  # FNV suffix keeps distinct names distinct
