"""HTML → interleaved span extraction (C17, C10, C12).

Re-expresses the reference's htmlindex DOM walk (htmlindex/htmlindex.go:33-64,
101-155) as a single offset-tracking scan over the raw document text, emitting
the ``documents`` span schema of BASELINE.json:input_hint:

    (kind, text, media_ref, offset)

kinds: ``text`` (text runs), ``a``, ``img``, ``img-srcset``, ``link``,
``script``, ``body-bg``, ``style-url``.

The scanner also records raw value offsets (vstart/vend) so the rewrite stage
(operators/rewrite.py) can splice adjusted references into the ORIGINAL bytes
— sidestepping x/net/html's re-render normalization entirely (SURVEY §2.8
C18: parity target is span-sequence equality, not byte-identical renders).

Parser notes: the reference uses golang.org/x/net/html (a full HTML5 tree
builder).  For the extraction semantics that matter — start tags with their
attributes in document order, raw text content of style/script, comments
skipped — a tolerant scanner is equivalent on non-pathological markup and is
far cheaper inside Arrow batches.  Entities in attribute values and text are
decoded like x/net/html does.

Spark surface: :func:`extract_spans_df` (url+body → exploded span rows via
``mapInPandas``) and :func:`documents_table` (span-array form).  No per-row
Python: the scanner runs once per document inside Arrow batches.
"""

from __future__ import annotations

import html as _htmlmod
import re
from typing import Iterator, NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urlmath import split_srcset
from ..functions.urlnorm import GoURL, parse_url, resolve_reference
from .cssx import css_extract

# Tags and their URL-bearing attributes (htmlindex/attributes.go:54-81).
NODES: dict[str, list[str]] = {
    "a": ["href"],
    "body": ["background"],
    "img": ["src", "data-src", "srcset", "data-srcset"],
    "link": ["href"],
    "script": ["src"],
    "style": [],  # css text content, parsed by the style parser
}

SRCSET_ATTRIBUTES = {"srcset", "data-srcset"}

# kind emitted per (tag, attr-class)
_KIND_BY_TAG = {"a": "a", "body": "body-bg", "img": "img", "link": "link",
                "script": "script"}

# tag that owns each span kind, for rebuilding per-tag URL lists (A1/A2)
TAG_BY_KIND = {"a": "a", "img": "img", "img-srcset": "img", "link": "link",
               "script": "script", "body-bg": "body", "style-url": "style"}

# Raw-text elements: content is not parsed for tags (x/net/html behavior).
_RAW_TEXT_TAGS = {"script", "style", "textarea", "title", "xmp", "iframe",
                  "noembed", "noframes"}

_TAG_OPEN_RE = re.compile(r"<([a-zA-Z][a-zA-Z0-9:-]*)")
_ATTR_RE = re.compile(
    r"""\s*([^\s/>=]+)(?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]*)))?"""
)


# NamedTuples, not frozen dataclasses: constructed per attr/tag/span in the
# hot Arrow stage, where frozen-dataclass __init__ overhead is measurable.
class Attr(NamedTuple):
    name: str
    value: str      # entity-decoded raw value (NOT trimmed)
    vstart: int     # raw value span in document text (excludes quotes)
    vend: int
    quote: str      # '"', "'", or '' for unquoted/value-less


class Tag(NamedTuple):
    name: str
    attrs: tuple[Attr, ...]
    start: int
    end: int        # end of the start tag ('>' + 1)
    tag_idx: int
    content_start: int = -1  # raw-text content range (style/script), else -1
    content_end: int = -1


class Span(NamedTuple):
    kind: str
    text: str
    media_ref: str
    offset: int
    tag_idx: int = -1
    attr: str = ""
    vstart: int = -1
    vend: int = -1
    token: str = ""  # full css token for style-url spans


# one scanner dispatch regex: comments, declarations/PIs, close tags, or a
# start tag name — searched from the current position (C-speed skipping)
_MARKUP_RE = re.compile(
    r"<(?:(?P<comment>!--)|(?P<decl>[!?])|(?P<close>/)"
    r"|(?P<name>[a-zA-Z][a-zA-Z0-9:-]*))")

# skip a start tag's body (respecting quoted '>' inside attribute values)
_TAG_BODY_RE = re.compile(r"""(?:"[^"]*"|'[^']*'|[^>"'])*""")

# tags whose attributes we actually need to parse (URL-bearing, NODES)
_PARSE_ATTR_TAGS = frozenset(NODES)

_CLOSE_RES = {t: re.compile(r"</" + t + r"[\s>/]", re.I)
              for t in _RAW_TEXT_TAGS}


def scan_tags(text: str) -> tuple[list[Tag], list[tuple[int, int]]]:
    """Scan document text; return (tags in document order, text runs).

    Regex-driven: markup boundaries and attribute lists are matched by
    compiled patterns (C speed); per-attribute Python work happens only for
    the six URL-bearing tags."""
    tags: list[Tag] = []
    text_runs: list[tuple[int, int]] = []
    pos, n = 0, len(text)
    tag_idx = 0
    run_start = 0

    def flush_run(end: int) -> None:
        nonlocal run_start
        if end > run_start:
            text_runs.append((run_start, end))

    while pos < n:
        m = _MARKUP_RE.search(text, pos)
        if m is None:
            flush_run(n)
            break
        lt = m.start()
        kind = m.lastgroup
        if kind == "comment":
            flush_run(lt)
            close = text.find("-->", m.end())
            pos = n if close == -1 else close + 3
            run_start = pos
            continue
        if kind != "name":  # declaration/PI or close tag
            flush_run(lt)
            close = text.find(">", lt)
            pos = n if close == -1 else close + 1
            run_start = pos
            continue
        flush_run(lt)
        name = m.group("name").lower()
        bm = _TAG_BODY_RE.match(text, m.end())
        body_end = bm.end()
        self_closing = body_end > m.end() and text[body_end - 1] == "/"
        end = body_end + 1 if body_end < n else n  # consume '>'

        attrs: list[Attr] = []
        if name in _PARSE_ATTR_TAGS and body_end > m.end():
            seen_names: set[str] = set()
            for am in _ATTR_RE.finditer(text, m.end(), body_end):
                aname = am.group(1).lower()
                li = am.lastindex
                if li == 2:
                    raw, q, vstart = am.group(2), '"', am.start(2)
                elif li == 3:
                    raw, q, vstart = am.group(3), "'", am.start(3)
                elif li == 4:
                    raw, q, vstart = am.group(4), "", am.start(4)
                else:
                    raw, q, vstart = "", "", am.end()
                if aname not in seen_names:  # HTML5: first duplicate wins
                    seen_names.add(aname)
                    attrs.append(Attr(name=aname,
                                      value=_htmlmod.unescape(raw),
                                      vstart=vstart,
                                      vend=vstart + len(raw), quote=q))

        content_start = content_end = -1
        if name in _RAW_TEXT_TAGS and not self_closing:
            cm = _CLOSE_RES[name].search(text, end)
            if cm:
                content_start, content_end = end, cm.start()
                gt = text.find(">", cm.start())
                end = n if gt == -1 else gt + 1
            else:
                content_start, content_end = end, n
                end = n
        tags.append(Tag(name=name, attrs=tuple(attrs), start=lt, end=end,
                        tag_idx=tag_idx, content_start=content_start,
                        content_end=content_end))
        tag_idx += 1
        pos = end
        run_start = pos
    return tags, text_runs


def extract_spans(text: str, base_url: str, include_text: bool = True) -> list[Span]:
    """C17: document text -> span sequence in document order.

    ``media_ref`` is the reference resolved against ``base_url`` exactly as
    htmlindex does (htmlindex/htmlindex.go:108-115); unresolvable refs are
    skipped (ibid:110).
    """
    base = parse_url(base_url)
    tags, text_runs = scan_tags(text)
    events: list[tuple[int, Span]] = []
    offset = 0  # assigned after sorting by position
    for tag in tags:
        if tag.name == "style":
            # styleParser (htmlindex/htmlindex.go:175-191): css refs of the
            # text child, resolved against the page URL.
            if tag.content_start < 0 or tag.content_end <= tag.content_start:
                continue
            css_text = text[tag.content_start : tag.content_end]
            for ref in css_extract(css_text, base):
                events.append(((tag.content_start + ref.start, 0), Span(
                    kind="style-url", text=ref.src, media_ref=ref.resolved,
                    offset=-1, tag_idx=tag.tag_idx, attr="",
                    vstart=tag.content_start, vend=tag.content_end,
                    token=ref.token)))
            continue
        attrlist = NODES.get(tag.name)
        if attrlist is None:
            continue
        for attr in tag.attrs:
            if attr.name not in attrlist:
                continue
            value = attr.value.strip()  # TrimSpace (htmlindex.go:128)
            if attr.name in SRCSET_ATTRIBUTES:
                for k, cand in enumerate(split_srcset(value)):
                    ref = _resolve_or_none(base, cand)
                    if ref is None:
                        continue
                    events.append(((attr.vstart, k), Span(
                        kind="img-srcset", text=cand, media_ref=ref,
                        offset=-1, tag_idx=tag.tag_idx, attr=attr.name,
                        vstart=attr.vstart, vend=attr.vend)))
            else:
                ref = _resolve_or_none(base, value)
                if ref is None:
                    continue
                events.append(((attr.vstart, 0), Span(
                    kind=_KIND_BY_TAG[tag.name], text=value, media_ref=ref,
                    offset=-1, tag_idx=tag.tag_idx, attr=attr.name,
                    vstart=attr.vstart, vend=attr.vend)))
    if include_text:
        for rs, re_ in text_runs:
            raw = text[rs:re_]
            if raw.strip() == "":
                continue
            events.append(((rs, 0), Span(kind="text", text=_htmlmod.unescape(raw),
                                    media_ref="", offset=-1,
                                    vstart=rs, vend=re_)))
    events.sort(key=lambda e: e[0])
    out = []
    for offset, (_, sp) in enumerate(events):
        out.append(Span(kind=sp.kind, text=sp.text, media_ref=sp.media_ref,
                        offset=offset, tag_idx=sp.tag_idx, attr=sp.attr,
                        vstart=sp.vstart, vend=sp.vend, token=sp.token))
    return out


def _resolve_or_none(base: GoURL, reference: str) -> str | None:
    try:
        return resolve_reference(base, parse_url(reference)).string()
    except ValueError:
        return None


def extract_media_refs(text: str, base_url: str) -> list[tuple]:
    """Fast path for the crawl loop: (kind, media_ref, ref_no_frag, scheme,
    host, path) tuples.

    Candidate generation needs just the tag-kind and the resolved reference —
    per-tag lists get ``array_sort(collect_set(...))`` downstream, so span
    offsets, text runs, and splice offsets are dead weight there.  The URL
    components (scheme/host/path + fragment-stripped string) fall out of the
    resolver for free here, letting admission skip three JVM-side regex
    extractions per candidate row.
    """
    base = parse_url(base_url)
    tags, _ = scan_tags(text)
    out: list[tuple] = []

    def emit(kind: str, u) -> None:
        full = u.string()
        no_frag = full.split("#", 1)[0]
        out.append((kind, full, no_frag, u.scheme, u.host, u.path))

    for tag in tags:
        if tag.name == "style":
            if tag.content_start < 0 or tag.content_end <= tag.content_start:
                continue
            for ref in css_extract(text[tag.content_start:tag.content_end],
                                   base):
                try:
                    emit("style-url", parse_url(ref.resolved))
                except ValueError:
                    continue
            continue
        attrlist = NODES.get(tag.name)
        if attrlist is None:
            continue
        for attr in tag.attrs:
            if attr.name not in attrlist:
                continue
            value = attr.value.strip()
            if attr.name in SRCSET_ATTRIBUTES:
                for cand in split_srcset(value):
                    try:
                        emit("img-srcset",
                             resolve_reference(base, parse_url(cand)))
                    except ValueError:
                        continue
            else:
                try:
                    emit(_KIND_BY_TAG[tag.name],
                         resolve_reference(base, parse_url(value)))
                except ValueError:
                    continue
    return out


def process_page(text: str, page_url: str, seed_host: str,
                 do_rewrite: bool = True) -> tuple[list[tuple], str, bool]:
    """Fused extract_media_refs + rewrite_document over ONE scan_tags pass.

    Byte-for-byte equivalent to running :func:`extract_media_refs` and
    :func:`rewrite.rewrite_document` separately (pinned by
    tests/test_fused_process.py + test_round6_fused_scan.py) but the
    document is scanned once and each <style> block's css_extract runs
    once — the two scans were ~45% of the per-page Python cost in the
    crawl's hot Arrow stage (guide §4.2: make the per-batch native work
    lean; OPTIMIZATION_r06.md has the profile).

    Returns ``(refs, new_text, changed)``; with ``do_rewrite=False`` the
    rewrite side is skipped entirely (binary bodies) and ``(refs, text,
    False)`` comes back.
    """
    from ..functions.urlmath import (
        resolve_srcset_urls,
        resolve_url,
        url_relative_to_root,
    )
    from .cssx import rewrite_style_content
    from .rewrite import IGNORED_URL_PREFIXES, _escape_attr

    base = parse_url(page_url)
    tags, _ = scan_tags(text)
    refs: list[tuple] = []
    edits: list[tuple[int, int, str]] = []
    changed = False
    relative_to_root = url_relative_to_root(base) if do_rewrite else ""

    def emit(kind: str, u) -> None:
        full = u.string()
        no_frag = full.split("#", 1)[0]
        refs.append((kind, full, no_frag, u.scheme, u.host, u.path))

    for tag in tags:
        if tag.name == "style":
            # styleParser: extraction emits every resolvable url() ref;
            # rewrite replaces adjusted tokens (both over ONE css_extract)
            if tag.content_start < 0 or tag.content_end <= tag.content_start:
                continue
            css_text = text[tag.content_start:tag.content_end]
            css_refs = css_extract(css_text, base)
            for ref in css_refs:
                try:
                    emit("style-url", parse_url(ref.resolved))
                except ValueError:
                    continue
            if do_rewrite:
                rewrites: dict[str, str] = {}
                for ref in css_refs:
                    adjusted = resolve_url(base, ref.src, seed_host, False,
                                           relative_to_root)
                    if adjusted != ref.src:
                        rewrites[ref.src] = adjusted
                if rewrites:
                    edits.append((tag.content_start, tag.content_end,
                                  rewrite_style_content(css_text, rewrites)))
                    changed = True
            continue
        attrlist = NODES.get(tag.name)
        if attrlist is None:
            continue
        is_hyperlink = tag.name == "a"
        node_changed = False
        # rewrite's ignored-prefix quirk aborts the NODE's rewrite loop
        # (scraper/html.go:87-91) but never the extraction side
        rw_aborted = not do_rewrite
        for attr in tag.attrs:
            if attr.name not in attrlist:
                continue
            value = attr.value.strip()
            is_srcset = attr.name in SRCSET_ATTRIBUTES
            if is_srcset:
                for cand in split_srcset(value):
                    try:
                        emit("img-srcset",
                             resolve_reference(base, parse_url(cand)))
                    except ValueError:
                        continue
            else:
                try:
                    emit(_KIND_BY_TAG[tag.name],
                         resolve_reference(base, parse_url(value)))
                except ValueError:
                    pass
            if rw_aborted:
                continue
            if value == "":
                continue
            if value.startswith(IGNORED_URL_PREFIXES):
                node_changed = False
                rw_aborted = True
                continue
            if is_srcset:
                adjusted = resolve_srcset_urls(base, value, seed_host,
                                               is_hyperlink, relative_to_root)
            else:
                adjusted = resolve_url(base, value, seed_host, is_hyperlink,
                                       relative_to_root)
            if adjusted == value:
                continue
            edits.append((attr.vstart, attr.vend,
                          _escape_attr(adjusted, attr.quote)))
            node_changed = True
        changed = changed or node_changed

    if not edits or not changed:
        return refs, text, False
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
    return refs, "".join(out), True


def tag_urls(spans: list[Span], tag: str) -> list[str]:
    """A1/A2: distinct, lexicographically sorted reference URLs for a tag
    (htmlindex/htmlindex.go:67-89)."""
    refs = {s.media_ref for s in spans
            if TAG_BY_KIND.get(s.kind) == tag and s.media_ref}
    return sorted(refs)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

SPAN_FIELDS = ("kind string, text string, media_ref string, offset int, "
               "tag_idx int, attr string, vstart int, vend int, token string")

EXPLODED_SCHEMA = "url string, " + SPAN_FIELDS

DOCUMENTS_SCHEMA = ("doc_id string, spans array<struct<kind:string,"
                    "text:string,media_ref:string,offset:int>>")


def _decode(body) -> str:
    if body is None:
        return ""
    if isinstance(body, (bytes, bytearray, memoryview)):
        return bytes(body).decode("utf-8", errors="replace")
    return str(body)


MINIMAL_SCHEMA = ("url string, kind string, media_ref string, "
                  "ref_no_frag string, scheme string, host string, "
                  "path string")

PROCESSED_SCHEMA = (
    "url string, seq bigint, file_path string, body binary, "
    "is_page boolean, refs array<struct<kind:string, media_ref:string, "
    "ref_no_frag:string, scheme:string, host:string, path:string, "
    "dedup_key:string>>")


def ref_dedup_key(ref_no_frag: str, host: str, path: str,
                  seed_host: str) -> str:
    """The shouldURLBeDownloaded key projection (scraper/checks.go:31-40)
    on pre-split URL parts: path for same-host, full fragment-free URL for
    external, '' -> '/', trailing slash dropped.  Mirrors
    functions.urlnorm.dedup_key / col_dedup_key exactly."""
    base = path if host == seed_host else ref_no_frag
    if base == "":
        base = "/"
    if base != "/" and base.endswith("/"):
        base = base[:-1]
    return base


def process_pages_df(pages: "DataFrame", seed_host: str,
                     outdir: str) -> "DataFrame":
    """FUSED per-page pass: media-ref extraction (C17/A1), binary sniff
    (F11), offline rewrite (C4-C18), and output-path computation (C7/C8)
    in ONE Arrow stage — each page body crosses the JVM->Python boundary
    exactly once per epoch (separate extract/rewrite/path stages shipped
    it three times; the boundary copy, not the parsing, dominates at
    ~KB-sized pages).  Refs come back as an array<struct> column and are
    exploded JVM-side for candidate generation — the same span-array
    document shape as the input_hint table.

    Refs arrive with their admission ``dedup_key`` precomputed (string ops
    are ~free here; the JVM regex projection it replaces runs per candidate
    at 10^10-row scale) and non-http(s) refs are dropped at the source: the
    reference's scheme check precedes the seen insert
    (scraper/checks.go:27-29), so such refs are observable nowhere —
    not in the seen set, the fetch log, or the output tree.

    Input: (url, body, seq).  Output: PROCESSED_SCHEMA, one row per page,
    ``body`` already rewritten for pages / raw for binaries
    (scraper/scraper.go:240-273 storeDownload semantics)."""
    from ..functions.filetype import sniff_extension
    from ..functions.urlmath import get_file_path

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            urls, seqs, fps, outs, isp, refs_col = [], [], [], [], [], []
            for url, body, seq in zip(pdf["url"], pdf["body"], pdf["seq"]):
                raw = bytes(body) if body is not None else b""
                is_page = sniff_extension(raw) == ""
                text = _decode(raw)
                raw_refs, new_text, changed = process_page(
                    text, url, seed_host, do_rewrite=is_page)
                refs = [
                    {"kind": k, "media_ref": m, "ref_no_frag": nf,
                     "scheme": s, "host": h, "path": p,
                     "dedup_key": ref_dedup_key(nf, h, p, seed_host)}
                    for k, m, nf, s, h, p in raw_refs
                    if s in ("http", "https")]
                out = new_text.encode("utf-8") if changed else raw
                urls.append(url)
                seqs.append(seq)
                fps.append(get_file_path(parse_url(url), seed_host, outdir,
                                         is_page))
                outs.append(out)
                isp.append(is_page)
                refs_col.append(refs)
            yield pd.DataFrame({"url": urls, "seq": seqs, "file_path": fps,
                                "body": outs, "is_page": isp,
                                "refs": refs_col})

    return pages.select("url", "body", "seq") \
                .mapInPandas(run, schema=PROCESSED_SCHEMA)


def extract_spans_df(fetched: DataFrame, url_col: str = "url",
                     body_col: str = "body",
                     include_text: bool = True,
                     minimal: bool = False) -> DataFrame:
    """url+body rows -> exploded span rows, one Arrow batch at a time.

    Input: DataFrame with (url string, body binary).  Output: one row per
    span with the internal schema (url, kind, text, media_ref, offset,
    tag_idx, attr, vstart, vend, token) — or, with ``minimal=True``, the
    3-column (url, kind, media_ref) fast path used by the crawl loop
    (columns built as flat lists: no per-row tuple boxing).
    """
    src = fetched.select(F.col(url_col).alias("url"), F.col(body_col).alias("body"))

    if minimal:
        def run_min(batches) -> Iterator:
            import pandas as pd

            cols = ("kind", "media_ref", "ref_no_frag", "scheme", "host",
                    "path")
            for pdf in batches:
                urls: list[str] = []
                data: dict[str, list] = {c: [] for c in cols}
                for url, body in zip(pdf["url"], pdf["body"]):
                    for tup in extract_media_refs(_decode(body), url):
                        urls.append(url)
                        for c, v in zip(cols, tup):
                            data[c].append(v)
                yield pd.DataFrame({"url": urls, **data})

        return src.mapInPandas(run_min, schema=MINIMAL_SCHEMA)

    def run(batches) -> Iterator:
        import pandas as pd

        cols = ("url", "kind", "text", "media_ref", "offset", "tag_idx",
                "attr", "vstart", "vend", "token")
        for pdf in batches:
            data: dict[str, list] = {c: [] for c in cols}
            for url, body in zip(pdf["url"], pdf["body"]):
                text = _decode(body)
                for s in extract_spans(text, url, include_text=include_text):
                    data["url"].append(url)
                    data["kind"].append(s.kind)
                    data["text"].append(s.text)
                    data["media_ref"].append(s.media_ref)
                    data["offset"].append(s.offset)
                    data["tag_idx"].append(s.tag_idx)
                    data["attr"].append(s.attr)
                    data["vstart"].append(s.vstart)
                    data["vend"].append(s.vend)
                    data["token"].append(s.token)
            yield pd.DataFrame(data)

    return src.mapInPandas(run, schema=EXPLODED_SCHEMA)


def documents_table(fetched: DataFrame, url_col: str = "url",
                    body_col: str = "body") -> DataFrame:
    """The BASELINE.json:input_hint table: (doc_id, spans array<struct>)."""
    exploded = extract_spans_df(fetched, url_col, body_col)
    return (
        exploded
        .groupBy(F.col("url").alias("doc_id"))
        .agg(F.array_sort(F.collect_list(F.struct(
            F.col("offset"), F.col("kind"), F.col("text"), F.col("media_ref"),
        ))).alias("_spans"))
        .select("doc_id", F.transform(
            "_spans", lambda s: F.struct(
                s["kind"].alias("kind"), s["text"].alias("text"),
                s["media_ref"].alias("media_ref"), s["offset"].alias("offset"))
        ).alias("spans"))
    )
