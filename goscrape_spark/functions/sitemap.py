"""Sitemap protocol (sitemaps.org) parsing — column expressions first.

North_rule extension (the reference has no sitemap support): sitemaps are
how a web-scale crawl bootstraps its frontier beyond link discovery.  A
site may declare sitemaps in robots.txt (``Sitemap:`` lines, host-wide —
harvested by ``functions.robotstxt.parse_sitemap_urls``); each sitemap is
either a ``<urlset>`` of page ``<loc>`` entries or a ``<sitemapindex>``
pointing at further sitemaps (50k entries / 50 MB per file by spec, so a
large site fans out to thousands of files — which is why extraction here
is a JVM-side column expression over a DISTRIBUTED fetch, never a
driver-side XML walk).

Scope: ``<loc>`` values with the five XML entities unescaped and CDATA
wrappers stripped; ``<sitemapindex>`` detection.  Other per-URL fields
(lastmod/priority/changefreq) are ignored, like most consumers do.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# (?s): a <loc> value may be split across lines by pretty-printers
_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_CDATA_RE = r"^<!\[CDATA\[(.*)\]\]>$"
# &amp; LAST, so '&amp;lt;' decodes to the literal '&lt;' (standard order)
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&apos;", "'"), ("&amp;", "&")]


def _unescape(c: Column) -> Column:
    c = F.regexp_replace(c, _CDATA_RE, r"$1")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def col_sitemap_locs(body: Column) -> Column:
    """``array<string>`` of ``<loc>`` values in document order, unescaped.
    ``body`` is the decoded XML text column."""
    return F.transform(
        F.regexp_extract_all(body, F.lit(_LOC_RE), F.lit(1)),
        _unescape)


def col_is_sitemap_index(body: Column) -> Column:
    """True when the document is a ``<sitemapindex>`` (its locs are further
    SITEMAPS, not pages)."""
    return body.contains("<sitemapindex")


def parse_sitemap(text: str) -> tuple[bool, list[str]]:
    """Sequential reference implementation for tests: ``(is_index, locs)``.
    Must agree exactly with the column expressions above."""
    locs = []
    for m in re.finditer(_LOC_RE, text):
        v = m.group(1)
        v = re.sub(_CDATA_RE, r"\1", v)
        for ent, ch in _ENTITIES:
            v = v.replace(ent, ch)
        locs.append(v)
    return "<sitemapindex" in text, locs
