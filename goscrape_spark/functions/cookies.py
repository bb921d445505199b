"""Cookie jar + header-list session config (S3/S4).

Ports the reference's driver-side session setup:

- ``Headers([]string)`` — "k:v" strings split on the FIRST colon
  (scraper/http.go:99-108);
- cookie file load/save — JSON ``[{"name","value","expires"}]`` bound to the
  start URL's host (scraper/cookies.go:21-59, main.go:214-246).

These are driver-side config in the rebuild (SURVEY §1.1): the resulting
header/cookie dicts are broadcast into the HTTP fetch session
(sources/fetch.py); they never enter the dataflow.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from datetime import datetime


def parse_headers(headers: list[str]) -> dict[str, str]:
    """Port of ``Headers`` (scraper/http.go:99-108)."""
    out: dict[str, str] = {}
    for header in headers:
        parts = header.split(":", 1)
        if len(parts) == 2:
            out[parts[0]] = parts[1]
    return out


@dataclass
class Cookie:
    """scraper/cookies.go:12-18."""

    name: str
    value: str
    expires: datetime | None = None


def read_cookie_file(path: str) -> list[Cookie]:
    """main.go:214-230: JSON cookie file -> cookie list."""
    with open(path) as f:
        raw = json.load(f)
    out = []
    for c in raw:
        expires = None
        if c.get("expires"):
            expires = datetime.fromisoformat(c["expires"].replace("Z", "+00:00"))
        out.append(Cookie(name=c["name"], value=c.get("value", ""),
                          expires=expires))
    return out


def save_cookies(path: str, cookies: list[Cookie]) -> None:
    """main.go:232-246."""
    raw = []
    for c in cookies:
        d: dict = {"name": c.name, "value": c.value}
        if c.expires is not None:
            d["expires"] = c.expires.isoformat()
        raw.append(d)
    with open(path, "w") as f:
        json.dump(raw, f)


def cookie_header_value(cookies: list[Cookie], now: datetime | None = None) -> str:
    """Serialized Cookie: header for the fetch session, expired ones dropped
    (cookiejar semantics, scraper/cookies.go:39-59)."""
    vals = []
    for c in cookies:
        if c.expires is not None and now is not None and c.expires <= now:
            continue
        vals.append(f"{c.name}={c.value}")
    return "; ".join(vals)
