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


def http_fetch_df(frontier: DataFrame, config: CrawlConfig,
                  url_col: str = "url") -> DataFrame:
    """Fetch every frontier URL over real HTTP, one batch per host."""
    max_retries = config.max_retries
    retry_delay = config.retry_delay_ms / 1000.0
    politeness = config.politeness_delay_ms / 1000.0
    timeout = config.timeout or 30
    proxy = config.proxy
    headers = dict(config.headers)
    if config.user_agent:
        headers["User-Agent"] = config.user_agent
    if config.username:
        cred = f"{config.username}:{config.password}"
        headers["Authorization"] = "Basic " + base64.b64encode(
            cred.encode()).decode()
    if config.cookies:
        # S4: cookie jar -> Cookie header (scraper/scraper.go:106-109,
        # scraper/cookies.go:39-59); expiry evaluated at session start like
        # the reference's jar.SetCookies at client construction
        from datetime import datetime, timezone

        from ..functions.cookies import cookie_header_value
        val = cookie_header_value(config.cookies,
                                  now=datetime.now(timezone.utc))
        if val:
            headers["Cookie"] = val

    src = frontier.select(F.col(url_col).alias("url")) \
                  .withColumn("host", col_host(F.col("url")))

    def fetch_host(key, pdf):
        import urllib.error
        import urllib.request

        import pandas as pd

        # S5: proxy transport (scraper/scraper.go:111-115) — one opener per
        # host batch, routing both schemes through the configured proxy
        if proxy:
            opener = urllib.request.build_opener(
                urllib.request.ProxyHandler({"http": proxy, "https": proxy}))
        else:
            opener = urllib.request.build_opener()

        rows = {"url": [], "body": [], "resp_url": [], "status": [],
                "attempts": []}
        first = True
        for url in sorted(pdf["url"]):
            if not first and politeness > 0:
                _time.sleep(politeness)
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
        return pd.DataFrame(rows)

    return src.groupBy("host").applyInPandas(fetch_host, schema=FETCHED_SCHEMA)
