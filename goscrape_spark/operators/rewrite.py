"""Offline link rewriting: splice adjusted references into original bytes.

Ports the reference's rewrite stage (scraper/html.go:26-179):

- ``fixURLReferences``/``fixHTMLNodeURLs`` — per-node attribute rewrite via
  ``resolveURL`` (C4) / ``resolveSrcSetURLs`` (C11);
- ``fixScriptNodeURL``  — <style> block rewrite via css extraction +
  ``replaceCSSUrls`` (C13/C14);
- F9 ignored prefixes (scraper/html.go:17-22): a value starting with
  ``#``, ``/#``, ``data:``, ``mailto:`` aborts rewriting of the WHOLE node
  (the reference returns from fixNodeURL inside its attr loop).

Unlike the reference we do not re-render a DOM: adjusted values are spliced
into the original text at the scanner-recorded offsets, so unrelated bytes
are preserved exactly (the reference's ``html.Render`` normalizes markup —
SURVEY §2.8 C18 sets span-sequence equality as the parity target instead).

The reference's CSS-FILE rewrite (cssProcessor, scraper/download.go:104-131)
is knowingly dead code: it keys its rewrite map by the full ``url(...)``
token and ``replaceCSSUrls`` wraps the key in ``url(...)`` again, so no
replacement ever matches.  Downloaded CSS assets are therefore stored
byte-identical; only asset DISCOVERY works.  We reproduce that (see
plans/simulator.py and plans/crawl.py), and offer the obvious fix behind
``rewrite_css_file`` for users who want working offline CSS.

Spark surface: :func:`rewrite_documents_df` — an Arrow-batched ``mapInPandas``
over (url, body) rows; one scanner pass + splice per document, no per-row
Python dispatch.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urlmath import (
    resolve_srcset_urls,
    resolve_url,
    url_relative_to_root,
)
from ..functions.urlnorm import GoURL, parse_url
from .cssx import css_extract, rewrite_style_content
from .extract import NODES, SRCSET_ATTRIBUTES, scan_tags

# scraper/html.go:17-22
IGNORED_URL_PREFIXES = ("#", "/#", "data:", "mailto:")


def _escape_attr(value: str, quote: str) -> str:
    """Minimal escaping for splicing a value back into its quoting context."""
    value = value.replace("&", "&amp;")
    if quote == '"':
        value = value.replace('"', "&#34;")
    elif quote == "'":
        value = value.replace("'", "&#39;")
    return value


def rewrite_document(text: str, page_url: str, main_page_host: str) -> tuple[str, bool]:
    """C16+C14: rewrite all URL references of a page to relative offline
    paths.  Returns (new_text, changed) — ``changed`` mirrors the
    reference's hasChanges (scraper/html.go:31-39)."""
    base = parse_url(page_url)
    relative_to_root = url_relative_to_root(base)
    tags, _ = scan_tags(text)
    edits: list[tuple[int, int, str]] = []
    changed = False

    for tag in tags:
        if tag.name == "style":
            if tag.content_start < 0 or tag.content_end <= tag.content_start:
                continue
            css_text = text[tag.content_start : tag.content_end]
            rewrites: dict[str, str] = {}
            for ref in css_extract(css_text, base):
                adjusted = resolve_url(base, ref.src, main_page_host, False,
                                       relative_to_root)
                if adjusted != ref.src:
                    rewrites[ref.src] = adjusted
            if rewrites:
                new_css = rewrite_style_content(css_text, rewrites)
                edits.append((tag.content_start, tag.content_end, new_css))
                changed = True
            continue

        attrlist = NODES.get(tag.name)
        if attrlist is None:
            continue
        is_hyperlink = tag.name == "a"
        node_changed = False
        for attr in tag.attrs:
            if attr.name not in attrlist:
                continue
            value = attr.value.strip()
            if value == "":
                continue
            if value.startswith(IGNORED_URL_PREFIXES):
                # Reference quirk (scraper/html.go:87-91): an ignored prefix
                # returns false from fixNodeURL for the WHOLE node — earlier
                # attrs of this node stay mutated in the tree but do not
                # count toward hasChanges.
                node_changed = False
                break
            if attr.name in SRCSET_ATTRIBUTES:
                adjusted = resolve_srcset_urls(base, value, main_page_host,
                                               is_hyperlink, relative_to_root)
            else:
                adjusted = resolve_url(base, value, main_page_host,
                                       is_hyperlink, relative_to_root)
            if adjusted == value:
                continue
            edits.append((attr.vstart, attr.vend,
                          _escape_attr(adjusted, attr.quote)))
            node_changed = True
        changed = changed or node_changed

    if not edits or not changed:
        return text, False
    edits.sort(key=lambda e: e[0])
    out: list[str] = []
    pos = 0
    for start, end, repl in edits:
        if start < pos:
            continue  # overlapping edit (duplicate attr) — first wins
        out.append(text[pos:start])
        out.append(repl)
        pos = end
    out.append(text[pos:])
    return "".join(out), changed


def rewrite_css_file(css_text: str, css_url: str, main_page_host: str) -> str:
    """The FIXED version of the reference's dead cssProcessor rewrite
    (scraper/download.go:104-131): rewrite each url() ref relative to the CSS
    file's directory.  NOT used on the parity path."""
    u = parse_url(css_url)
    dir_path = u.path[: u.path.rfind("/") + 1] if "/" in u.path else "/"
    css_dir = GoURL(scheme=u.scheme, host=u.host, path=dir_path)
    rewrites: dict[str, str] = {}
    for ref in css_extract(css_text, u):
        adjusted = resolve_url(css_dir, ref.src, main_page_host, False, "")
        if adjusted != ref.src:
            rewrites[ref.src] = adjusted
    return rewrite_style_content(css_text, rewrites)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

REWRITTEN_SCHEMA = "url string, body binary, changed boolean"


def rewrite_documents_df(fetched: DataFrame, main_page_host: str,
                         url_col: str = "url",
                         body_col: str = "body") -> DataFrame:
    """Arrow-batched page rewrite: (url, body) -> (url, rewritten body,
    changed)."""
    src = fetched.select(F.col(url_col).alias("url"),
                         F.col(body_col).alias("body"))

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            urls, bodies, flags = [], [], []
            for url, body in zip(pdf["url"], pdf["body"]):
                raw = bytes(body) if body is not None else b""
                text = raw.decode("utf-8", errors="replace")
                new_text, changed = rewrite_document(text, url, main_page_host)
                urls.append(url)
                bodies.append(new_text.encode("utf-8") if changed else raw)
                flags.append(changed)
            yield pd.DataFrame({"url": urls, "body": bodies, "changed": flags})

    return src.mapInPandas(run, schema=REWRITTEN_SCHEMA)
