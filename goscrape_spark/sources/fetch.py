"""Real HTTP fetch stage (S1/S2): per-host Arrow batches over the frontier.

The mock-fetch join (J2) is the test/bench seam; this module is the
production fetcher with the same output schema, expressed the Spark-native
way:

* ``groupBy(host).applyInPandas`` — all URLs of one host land in ONE batch on
  one executor, so per-host politeness (J5) is enforced locally by sleeping
  between requests, and connections/cookies are reused per host;
* 429 retry with the reference's LINEAR backoff ``(retries+1) x 1500ms``, max
  10 retries (scraper/http.go:18-23,50-96), inline within the batch — crawl
  order is unaffected, exactly like the reference's blocking sleep;
* session config (UA, basic auth, extra headers, timeout) from CrawlConfig
  (scraper/http.go:25-48; auth scraper/scraper.go:144-146).

Output schema matches the mock path: (url, body, resp_url, status, attempts)
with status ok/missing/exhausted ('missing' = request error or non-200/429).

This sandbox has no network egress; tests drive it against a localhost
http.server (tests/test_http_fetch.py).
"""

from __future__ import annotations

import base64
import time as _time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions.urlnorm import col_host

FETCHED_SCHEMA = ("url string, body binary, resp_url string, status string, "
                  "attempts int")
# live fetch additionally surfaces the batch's final cookie-jar snapshot so
# the driver can accumulate Set-Cookie state across epochs (S4)
FETCHED_LIVE_SCHEMA = FETCHED_SCHEMA + ", set_cookies array<string>"


def _jar_cookie(d: dict):
    """A host-only http.cookiejar.Cookie from the portable dict form
    {name, value, domain, path, expires(epoch|None)} — the same matching
    semantics as the reference's cookiejar.Jar.SetCookies with no Domain
    attribute (scraper/cookies.go:39-59)."""
    import http.cookiejar

    return http.cookiejar.Cookie(
        version=0, name=d["name"], value=d["value"], port=None,
        port_specified=False, domain=d.get("domain", ""),
        domain_specified=False, domain_initial_dot=False,
        path=d.get("path", "/"), path_specified=False, secure=False,
        expires=d.get("expires"), discard=d.get("expires") is None,
        comment=None, comment_url=None, rest={})


def config_cookie_dicts(config: CrawlConfig) -> list[dict]:
    """The configured jar in portable dict form, bound to the start URL's
    host like the reference's jar.SetCookies(u, cookies)
    (scraper/cookies.go:39-59, scraper/scraper.go:106-109)."""
    from ..functions.urlnorm import parse_url

    host = (parse_url(config.url).host or "").partition(":")[0]
    out = []
    for c in config.cookies:
        exp = int(c.expires.timestamp()) if c.expires is not None else None
        out.append({"name": c.name, "value": c.value, "domain": host,
                    "path": "/", "expires": exp})
    return out


def http_fetch_df(frontier: DataFrame, config: CrawlConfig,
                  url_col: str = "url",
                  session_cookies: list[dict] | None = None,
                  host_delays_ms: dict[str, int] | None = None) -> DataFrame:
    """Fetch every frontier URL over real HTTP, one batch per host.

    Cookies ride a REAL per-batch http.cookiejar: the batch's jar starts
    from the configured cookies (+ ``session_cookies`` accumulated by the
    crawl loop from earlier epochs' Set-Cookie responses), absorbs
    Set-Cookie mid-batch exactly like the reference's shared
    cookiejar.Jar on the http.Client (scraper/scraper.go:106-118), and
    snapshots its final state into the ``set_cookies`` column so the driver
    can carry the session forward and persist it (main.go:183,231-246)."""
    max_retries = config.max_retries
    retry_delay = config.retry_delay_ms / 1000.0
    politeness = config.politeness_delay_ms / 1000.0
    # robots.txt Crawl-delay per host (seconds), merged max-wise with the
    # configured global delay inside each host batch; tiny driver-built
    # dict, captured in the closure (ships once per task, like headers)
    host_delays = {h: ms / 1000.0
                   for h, ms in (host_delays_ms or {}).items()}
    timeout = config.timeout or 30
    proxy = config.proxy
    headers = dict(config.headers)
    if config.user_agent:
        headers["User-Agent"] = config.user_agent
    if config.username:
        cred = f"{config.username}:{config.password}"
        headers["Authorization"] = "Basic " + base64.b64encode(
            cred.encode()).decode()
    # S4: base jar state; session_cookies (keyed by domain/path/name) win
    # over the static config jar — they are the crawl's newer state
    base_cookies: dict[tuple, dict] = {
        (d["domain"], d.get("path", "/"), d["name"]): d
        for d in config_cookie_dicts(config)}
    for d in (session_cookies or []):
        base_cookies[(d["domain"], d.get("path", "/"), d["name"])] = d
    base_list = list(base_cookies.values())

    src = frontier.select(F.col(url_col).alias("url")) \
                  .withColumn("host", col_host(F.col("url")))

    def fetch_host(key, pdf):
        import http.cookiejar
        import json as _json
        import urllib.error
        import urllib.parse
        import urllib.request

        import pandas as pd

        jar = http.cookiejar.CookieJar()
        for d in base_list:
            jar.set_cookie(_jar_cookie(d))
        # every redirect hop's host counts as "contacted" for tombstone
        # scoping below — an intermediate hop (a -> B -> c) can delete its
        # own cookie, and only resp.geturl() (the final hop) is otherwise
        # visible
        hop_hosts: set[str] = set()

        class _HopTracker(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, req, fp, code, msg, hdrs, newurl):
                h = urllib.parse.urlsplit(newurl).hostname
                if h:
                    hop_hosts.add(h)
                return super().redirect_request(req, fp, code, msg, hdrs,
                                                newurl)

        # S5: proxy transport (scraper/scraper.go:111-115) — one opener per
        # host batch, routing both schemes through the configured proxy;
        # the cookie processor presents + absorbs per standard jar matching
        handlers = [_HopTracker(),
                    urllib.request.HTTPCookieProcessor(jar)]
        if proxy:
            handlers.append(
                urllib.request.ProxyHandler({"http": proxy, "https": proxy}))
        opener = urllib.request.build_opener(*handlers)

        rows = {"url": [], "body": [], "resp_url": [], "status": [],
                "attempts": []}
        # effective per-host spacing: the larger of the configured global
        # delay and this host's robots Crawl-delay (J5 + Crawl-delay ext.)
        batch_delay = max(politeness, host_delays.get(str(key[0]), 0.0))
        first = True
        for url in sorted(pdf["url"]):
            if not first and batch_delay > 0:
                _time.sleep(batch_delay)
            first = False
            body, resp_url, status, attempts = None, url, "missing", 0
            for retries in range(max_retries + 2):
                if retries == max_retries + 1:
                    # exhausted: max_retries+1 requests were actually made —
                    # matches the mock join and the sequential oracle
                    status = "exhausted"
                    attempts = max_retries + 1
                    break
                attempts = retries + 1
                req = urllib.request.Request(url, headers=headers)
                try:
                    with opener.open(req, timeout=timeout) as resp:
                        body = resp.read()
                        resp_url = resp.geturl()
                        status = "ok"
                        break
                except urllib.error.HTTPError as e:
                    if e.code == 429:
                        # linear backoff (scraper/http.go:70-75)
                        _time.sleep((retries + 1) * retry_delay)
                        continue
                    status = "missing"
                    break
                except Exception:
                    status = "missing"
                    break
            rows["url"].append(url)
            rows["body"].append(body)
            rows["resp_url"].append(resp_url)
            rows["status"].append(status)
            rows["attempts"].append(attempts)

        # Snapshot DELTAS only, on the batch's first row (None elsewhere).
        # The jar starts from the whole base jar (cookie matching needs
        # it), but emitting the full jar back would let a batch for an
        # unrelated asset host clobber a same-round Set-Cookie update from
        # the cookie's own host at the driver's last-write-wins merge.  So:
        # * a live cookie is emitted only if it is new or its
        #   (value, expires) changed vs the batch's base jar;
        # * an expiry tombstone (expires=0) is emitted only for base
        #   cookies whose domain this batch actually contacted (the
        #   grouped host, plus redirect targets) — only those servers
        #   could have deleted them.
        contacted = {str(key[0]).partition(":")[0]} | hop_hosts
        for ru in rows["resp_url"]:
            h = urllib.parse.urlsplit(ru).hostname
            if h:
                contacted.add(h)

        def domain_contacted(dom: str) -> bool:
            d = dom.lstrip(".")
            return any(h == d or h.endswith("." + d) for h in contacted)

        snap = {(c.domain, c.path, c.name): {
                    "name": c.name, "value": c.value, "domain": c.domain,
                    "path": c.path, "expires": c.expires}
                for c in jar}
        deltas = {}
        for k, c in snap.items():
            b = base_cookies.get(k)
            if b is None or (c["value"], c["expires"]) != \
                    (b["value"], b.get("expires")):
                deltas[k] = c
        for k, d in base_cookies.items():
            if k not in snap and domain_contacted(d["domain"]):
                deltas[k] = dict(d, expires=0)
        rows["set_cookies"] = [None] * len(rows["url"])
        if rows["set_cookies"]:
            rows["set_cookies"][0] = [_json.dumps(d, sort_keys=True)
                                      for d in deltas.values()]
        return pd.DataFrame(rows)

    return src.groupBy("host").applyInPandas(fetch_host,
                                             schema=FETCHED_LIVE_SCHEMA)
