"""Ports of Go's `path` / `path/filepath` (slash-separated) helpers.

The reference leans on Go's path cleaning in several places that affect
byte-exact output paths and rewritten references:

- ``path.Join`` inside ``resolveURL`` (reference scraper/url.go:27) and
  ``urlRelativeToOther`` (scraper/url.go:116),
- ``filepath.Dir/Base/Join/Ext`` inside ``getFilePath`` (scraper/fileutil.go:40-53).

Go's ``path.Clean`` and Python's ``posixpath.normpath`` implement the same
Plan9 "cleanname" algorithm, but the wrappers differ on empty inputs, so the
exact Go edge cases are reproduced here.  All functions are pure and
vectorization-friendly (called inside Arrow/pandas UDF batches).
"""

from __future__ import annotations

import posixpath


def go_clean(p: str) -> str:
    """Go ``path.Clean``: normpath, with Clean("") == "."."""
    if p == "":
        return "."
    # fast path: already clean (no "//", no "." segment — "/." catches both
    # "/./" and "/../", a leading "." catches "./" and "../" — and no
    # trailing slash normpath would strip).  normpath is identity there.
    if ("//" not in p and "/." not in p and p[0] != "."
            and (p[-1] != "/" or p == "/")):
        return p
    out = posixpath.normpath(p)
    # posixpath.normpath collapses leading "//" to "//" (POSIX allows it);
    # Go path.Clean collapses it to "/".
    if out.startswith("//"):
        out = out[1:]
    return out


def go_join(*elems: str) -> str:
    """Go ``path.Join``: join non-empty elements with "/" then Clean.

    Returns "" when every element is empty (Go behavior).
    """
    parts = [e for e in elems if e != ""]
    if not parts:
        return ""
    return go_clean("/".join(parts))


def go_dir(p: str) -> str:
    """Go ``path.Dir``: everything but the last element, Cleaned."""
    head = posixpath.dirname(p)
    return go_clean(head)


def go_base(p: str) -> str:
    """Go ``path.Base``: last element; "" -> "."; all-slashes -> "/"."""
    if p == "":
        return "."
    p = p.rstrip("/")
    if p == "":
        return "/"
    i = p.rfind("/")
    return p[i + 1 :]


def go_ext(p: str) -> str:
    """Go ``path.Ext``: suffix from the final dot in the final element."""
    i = p.rfind(".")
    if i > p.rfind("/"):  # a dot exists and lies in the final element
        return p[i:]
    return ""
