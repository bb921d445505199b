"""CSS ``url()`` token extraction (C12) and rewrite helpers (C13).

Port of the reference's css package (css/css.go:13-53), which tokenizes CSS
with gorilla/css and keeps TokenURI matches of ``^url\\(['"]?(.*?)['"]?\\)$``,
skipping ``data:`` URIs.  We tokenize sequentially with one alternation regex
so that comments and strings consume ``url(`` occurrences exactly like the
reference's scanner, then apply the same anchored regex.

Also ports ``replaceCSSUrls`` (scraper/html.go:167-179) used by the
``<style>``-block rewrite.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..functions.urlnorm import GoURL, parse_url, resolve_reference

# Sequential tokenization: comments and strings are consumed before a url(
# inside them could be seen, mirroring gorilla/css scanner ordering.
_TOKEN_RE = re.compile(
    r"/\*.*?\*/"                                        # comment
    r"|(?P<uri>url\(\s*(?:\"(?:[^\"\\]|\\.)*\""         # url( "string" )
    r"|'(?:[^'\\]|\\.)*'"                               # url( 'string' )
    r"|[^\s)]*)\s*\))"                                  # url( raw )
    r"|\"(?:[^\"\\]|\\.)*\""                            # bare string
    r"|'(?:[^'\\]|\\.)*'",
    re.S,
)

# cssURLRe (css/css.go:13)
_CSS_URL_RE = re.compile(r"^url\(['\"]?(.*?)['\"]?\)$", re.S)


@dataclass(frozen=True)
class CssRef:
    token: str      # full token text, e.g. url('/img/bg.jpg')
    src: str        # inner URL string, e.g. /img/bg.jpg
    resolved: str   # absolute URL resolved against the base
    start: int      # token start offset in the css text


def css_extract(css_text: str, base: GoURL) -> list[CssRef]:
    """C12: all URI tokens in document order, resolved against ``base``
    (css/css.go:21-53). ``data:`` URIs are skipped."""
    out: list[CssRef] = []
    for m in _TOKEN_RE.finditer(css_text):
        token = m.group("uri")
        if token is None:
            continue
        gm = _CSS_URL_RE.match(token)
        if gm is None:
            continue
        src = gm.group(1)
        if src.lower().startswith("data:"):
            continue  # skip embedded data (css/css.go:39-41)
        try:
            resolved = resolve_reference(base, parse_url(src))
        except ValueError:
            continue
        out.append(CssRef(token=token, src=src, resolved=resolved.string(),
                          start=m.start()))
    return out


def replace_css_urls(before: str, after: str, content: str) -> str:
    """Port of ``replaceCSSUrls`` (scraper/html.go:167-179): replace
    url("X") / url('X') / url(X) with url('<after>')."""
    for prefix in ('"', "'", ""):
        wrong = f"url({prefix}{before}{prefix})"
        fixed = f"url('{after}')"
        content = content.replace(wrong, fixed)
    return content


def rewrite_style_content(css_text: str, rewrites: dict[str, str]) -> str:
    """Apply replaceCSSUrls for each (before -> after) pair.

    The reference iterates a Go map (random order, scraper/html.go:138-144);
    we iterate in sorted order for determinism — order only matters in the
    pathological case where one rewrite's output collides with another's
    input, which the fixtures (and sane CSS) never hit.
    """
    for before in sorted(rewrites):
        css_text = replace_css_urls(before, rewrites[before], css_text)
    return css_text
