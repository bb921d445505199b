"""robots.txt parsing + rule matching (RFC 9309 subset).

North_rule extension (the reference has no robots support — BASELINE.json
names "robots" as part of the frontier design).  This module is the pure
logic; the distributed matcher is ``operators.politeness.apply_robots_rfc``
and the live fetch hook is in ``plans/crawl.py``.

Implemented per RFC 9309:

* record groups: one or more consecutive ``User-agent`` lines followed by
  ``Allow`` / ``Disallow`` rules; non-group lines (``Sitemap`` etc.) are
  ignored and do NOT break a group;
* group selection: the group whose user-agent token is the LONGEST
  case-insensitive prefix of the product token wins; ``*`` matches any
  product and is used only when no specific group matches (RFC 9309 §2.2.1);
* rule matching: ``*`` matches any character sequence, ``$`` anchors the
  end-of-path; rules are percent-encoded octet prefixes otherwise;
* precedence: the MOST SPECIFIC match (longest pattern) wins; on a tie an
  ``Allow`` rule wins (§2.2.2); no match ⇒ allowed;
* an empty ``Disallow:`` value means "allow everything" and contributes no
  rule.
"""

from __future__ import annotations

import re


def _parse_groups(text: str) -> dict[str, dict]:
    """Collect groups: ``token -> {"rules": [(pattern, is_allow)...],
    "delay": float | None}``.  Shared by :func:`parse_robots` and
    :func:`parse_crawl_delay`."""
    groups: dict[str, dict] = {}
    cur_tokens: list[str] = []
    in_ua_run = False  # consecutive User-agent lines stack into one head
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_ua_run:
                cur_tokens = []
            in_ua_run = True
            if not value:
                # an empty token would prefix-match EVERY product token and
                # silently shadow the '*' group — ignore the line
                continue
            cur_tokens.append(value.lower())
            for t in cur_tokens:
                groups.setdefault(t, {"rules": [], "delay": None})
        elif field in ("allow", "disallow"):
            in_ua_run = False
            if not value:
                continue  # empty Disallow/Allow contributes nothing
            for t in cur_tokens:
                groups.setdefault(t, {"rules": [], "delay": None})
                groups[t]["rules"].append((value, field == "allow"))
        elif field == "crawl-delay":
            # de-facto extension (Bing/Yandex; not in RFC 9309): seconds,
            # fractional allowed, unparseable values ignored
            in_ua_run = False
            try:
                delay = float(value)
            except ValueError:
                continue
            if delay < 0:
                continue
            for t in cur_tokens:
                groups.setdefault(t, {"rules": [], "delay": None})
                groups[t]["delay"] = delay
        else:
            # Sitemap/unknown: not rules, do not break the group
            in_ua_run = False
    return groups


def _select_group(groups: dict[str, dict], agent: str) -> dict | None:
    """RFC 9309 §2.2.1 group selection: the group whose token is the
    LONGEST case-insensitive prefix of the product token; ``*`` fallback."""
    agent_lc = agent.lower()
    best: str | None = None
    for token in groups:
        if token != "*" and agent_lc.startswith(token):
            if best is None or len(token) > len(best):
                best = token
    if best is not None:
        return groups[best]
    return groups.get("*")


def parse_robots(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """Parse robots.txt for ``agent`` -> ordered ``(pattern, is_allow)``.

    ``agent`` is the product token (e.g. ``goscrape``); matching follows
    RFC 9309 §2.2.1 — the group with the longest user-agent token that is
    a case-insensitive prefix of ``agent`` applies, falling back to the
    ``*`` group.
    """
    group = _select_group(_parse_groups(text), agent)
    return group["rules"] if group else []


def parse_crawl_delay(text: str, agent: str = "*") -> float | None:
    """``Crawl-delay`` (seconds) of the group selected for ``agent``, or
    ``None``.  Same group selection as :func:`parse_robots`; the directive
    is the de-facto Bing/Yandex extension, not part of RFC 9309."""
    group = _select_group(_parse_groups(text), agent)
    return group["delay"] if group else None


def parse_sitemap_urls(text: str) -> list[str]:
    """``Sitemap:`` lines, in file order.  Host-wide per sitemaps.org —
    NOT scoped to any user-agent group, so this scans every line rather
    than going through group selection."""
    out: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, value = line.split(":", 1)
        if field.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def rule_regex(pattern: str) -> str:
    """robots rule pattern -> an anchored regex in the Java/RE2 common
    subset (portable across Spark ``rlike`` and DuckDB ``regexp_matches``):
    ``*`` -> ``.*``, trailing ``$`` -> end anchor, everything else literal,
    match anchored at the path start."""
    anchored_end = pattern.endswith("$")
    if anchored_end:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = ".*".join(parts)
    return "^" + body + ("$" if anchored_end else "")


def match_allowed(path: str, rules: list[tuple[str, bool]]) -> bool:
    """Reference (sequential) matcher: most-specific rule wins, Allow wins
    length ties, no match allows.  The distributed matcher
    (``apply_robots_rfc``) must agree with this function exactly — it is
    the oracle for tests."""
    best: tuple[int, bool] | None = None
    for pattern, is_allow in rules:
        if re.match(rule_regex(pattern), path) is None:
            continue
        # specificity key: pattern length (RFC 9309 §2.2.2), allow wins
        # ties (True > False in the tuple compare)
        key = (len(pattern), is_allow)
        if best is None or key > best:
            best = key
    return True if best is None else best[1]
