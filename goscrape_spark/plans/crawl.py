"""Epoch-synchronous distributed crawl (the flagship plan).

Re-expresses the reference's sequential BFS loop (scraper/scraper.go:152-236)
as a DataFrame iteration that provably reproduces its crawl order and URL
seen-set (SURVEY §3.4):

* each **epoch** = one BFS level; the frontier is a DataFrame of pages with a
  global discovery sequence number;
* fetching is a **mock-fetch join** against the ``pages`` fixture table (J2,
  the reference's own test seam, scraper/scraper_test.go:35-42); a real
  crawler would swap in an ``applyInPandas``-per-host HTTP fetcher with the
  same output schema (S1/S2);
* per-page candidates (assets + links) are exploded from the extracted span
  table, stage-ranked exactly like the sequential loop's consideration order
  — link -> script -> body -> style assets (each lexicographically sorted,
  A2/O1), then the images queue (body dups, img refs, CSS-discovered refs),
  then a-links (scraper/download.go:19-65, scraper/scraper.go:219-233);
* admission is the first-wins window + seen anti-join (operators/admission);
* CSS-discovered images (cssProcessor, scraper/download.go:104-131) create an
  in-epoch discovery dependency: link assets must be fetched before their
  ``url()`` refs become candidates.  A short fixpoint loop re-runs admission
  with the discovered candidates added; it converges immediately unless a
  css-discovered image steals a dedup key from a later page's link asset
  (possible but degenerate; the loop handles it exactly).

Scale design (north_rule): frontier/seen shuffles hash on ``dedup_key`` /
``host``; per-epoch state is checkpointed (localCheckpoint for tests,
parquet snapshots + manifest via sources/storage.py for resumability); the
optional Bloom pre-filter (operators/seen.py) keeps the 10^10-row seen table
from being shuffled against small candidate sets; AQE handles residual skew.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import CrawlConfig
from ..functions.urlnorm import GoURL, parse_url
from ..operators.admission import ORDER_COLS, admit
from ..operators.cssx import css_extract
from ..operators.extract import (
    extract_spans_df,
    process_pages_df,
    ref_dedup_key,
)
from ..operators.seen import SeenSet

# stage ranks reproducing the sequential consideration order (SURVEY §3.4)
STAGE_RANKS = {"page": 0, "link": 1, "script": 2, "body": 3, "style": 4,
               "image": 5, "a": 6}

CAND_SCHEMA = ("page_url string, parent_seq bigint, stage_rank int, "
               "sub_rank int, intra1 int, intra2 int, url string, "
               "scheme string, host string, path string, "
               "is_asset boolean, depth int, stage string, "
               "dedup_key string")

FETCH_SCHEMA = ("url string, body binary, resp_url string, retry_after int")


@dataclass
class CrawlResult:
    """Spark-side analogue of the library-embedding return surface
    (SURVEY §3.2)."""

    seen: DataFrame          # dedup_key, epoch
    fetch_log: DataFrame     # ordered fetch records
    documents: DataFrame     # exploded spans of fetched pages
    output: DataFrame        # url, file_path, kind, is_page, epoch
    epochs: int = 0
    seed_host: str = ""
    # final session cookie jar (S4): configured cookies + every Set-Cookie
    # absorbed during the crawl, as portable dicts {name, value, domain,
    # path, expires(epoch|None)} — the analogue of Scraper.Cookies()
    # (scraper/cookies.go:20-37); persisted by the CLI's --savecookiefile
    cookies: list = field(default_factory=list)

    def seen_set(self) -> set[str]:
        return {r.dedup_key for r in self.seen.select("dedup_key").collect()}

    def ordered_fetches(self) -> list:
        return (self.fetch_log
                .orderBy("epoch", "parent_seq", "stage_rank", "sub_rank",
                         "intra1", "intra2")
                .collect())


class Crawler:
    """Distributed crawler over a mock-web ``pages`` DataFrame (J2, the
    reference's own test seam) or, with ``live=True``, the real per-host
    HTTP fetch stage (sources/fetch.py) — same engine either way."""

    def __init__(self, spark: SparkSession, config: CrawlConfig,
                 pages: DataFrame | None = None, use_bloom: bool = False,
                 checkpoint=None, max_epochs: int = 1000,
                 live: bool = False):
        self.spark = spark
        self.config = config
        self.live = live
        if pages is None and not live:
            raise ValueError("need a pages fixture or live=True")
        self.pages = None
        if pages is not None:
            self.pages = pages.select(
                F.col("url"), F.col("body"),
                F.coalesce(F.col("resp_url"), F.col("url")).alias("resp_url"),
                F.coalesce(F.col("retry_after"), F.lit(0)).alias("retry_after"))
        self.use_bloom = use_bloom
        self.bloom = None  # set in run()
        # body-free fixture metadata (built lazily): per-epoch status joins
        # broadcast this instead of shuffling/sorting the body-bearing
        # fixture; see _pages_slim
        self._pages_slim_df: DataFrame | None = None
        self._pages_count: int | None = None
        self._pages_url_bytes: int = 0
        self._n_frontier = 0
        self.robots = None
        if config.robots_rules:
            from ..operators.politeness import robots_rules_df
            self.robots = robots_rules_df(spark, config.robots_rules)
        # RFC 9309 robots (full Allow/Disallow/wildcard form): rules table
        # built from configured robots.txt texts; live crawls may add the
        # seed host's fetched robots.txt in run() (fetch_robots=True)
        self.robots_rfc = None
        self._robots_parsed: dict[str, list] = {}
        # robots Crawl-delay per host (ms), merged max-wise with the
        # configured politeness_delay_ms by the schedulers (J5)
        self._host_delay_ms: dict[str, int] = {}
        # hosts whose robots.txt has been fetched (or failed) this crawl —
        # each host is contacted for robots at most once
        self._robots_fetched: set[str] = set()
        # robots.txt Sitemap: lines per host (host-wide, sitemaps.org)
        self._sitemap_lines: dict[str, list[str]] = {}
        if config.robots_txt:
            for host, text in config.robots_txt.items():
                self._add_robots_txt(host, text)
            self._rebuild_rfc_rules()
        self.checkpoint = checkpoint
        self.max_epochs = max_epochs
        # collapse the seen/written union chains into one checkpointed
        # table every K epochs (bounded per-epoch plan depth)
        self.compact_every = int(os.environ.get(
            "GOSCRAPE_COMPACT_EVERY", "16"))
        # per-label cumulative checkpoint wall times: every epoch stage is
        # materialized through _localckpt, so this doubles as a stage-level
        # attribution table (bench.py emits it into BENCH_FULL)
        self.stage_secs: dict[str, float] = {}
        # metrics observed during the latest assets_allowed checkpoint
        self._fs_obs = None
        # S4: session cookie jar state, keyed (domain, path, name); starts
        # from the configured cookies and absorbs live Set-Cookie snapshots
        # per fetch round (the reference's shared cookiejar.Jar,
        # scraper/scraper.go:106-118)
        from ..sources.fetch import config_cookie_dicts
        self._session_cookies: dict[tuple, dict] = {
            (d["domain"], d["path"], d["name"]): d
            for d in config_cookie_dicts(config)}

        u = parse_url(config.url)
        u = GoURL(scheme=u.scheme or "http", host=u.host, path=u.path,
                  query=u.query)  # fragment strip + scheme default
        self.seed = u
        self.seed_host = u.host

    # ------------------------------------------------------------------
    def _robots_agent(self) -> str:
        """RFC 9309 product token for group selection: the first token of
        the configured User-Agent (before any '/version'), else '*'."""
        ua = self.config.user_agent.strip()
        return ua.split("/")[0].split(" ")[0].lower() if ua else "*"

    def _add_robots_txt(self, host: str, text: str,
                        apply_rules: bool = True) -> None:
        from ..functions.robotstxt import (
            parse_crawl_delay,
            parse_robots,
            parse_sitemap_urls,
        )
        from ..operators.politeness import rfc_rules_df
        sm = parse_sitemap_urls(text)
        if sm:
            self._sitemap_lines.setdefault(host, []).extend(sm)
        if not apply_rules:
            # --sitemaps alone reads robots.txt only to DISCOVER sitemaps;
            # exclusion rules and Crawl-delay apply only with --robots
            return
        agent = self._robots_agent()
        delay = parse_crawl_delay(text, agent=agent)
        if delay is not None:
            self._host_delay_ms[host] = int(delay * 1000)
        rules = parse_robots(text, agent=agent)
        if not rules:
            return
        self._robots_parsed[host] = rules
        # callers rebuild the broadcast rules table ONCE per batch
        # (_rebuild_rfc_rules), not per host

    def _rebuild_rfc_rules(self) -> None:
        from ..operators.politeness import rfc_rules_df
        if self._robots_parsed:
            self.robots_rfc = rfc_rules_df(self.spark, self._robots_parsed)

    def _fetch_seed_robots(self) -> None:
        self._ingest_host_robots([(self.seed_host, self.seed.scheme)])

    def _get_robots_text(self, host: str, scheme: str) -> str | None:
        """One driver-side GET of a host's /robots.txt.  RFC 9309 §2.3.1:
        any fetch error means "no restrictions" (None); §2.5: parse at
        most the first 500 KiB."""
        import http.client
        import urllib.error
        import urllib.request
        url = f"{scheme or 'http'}://{host}/robots.txt"
        headers = dict(self.config.headers)
        if self.config.user_agent:
            headers["User-Agent"] = self.config.user_agent
        handlers = []
        if self.config.proxy:
            handlers.append(urllib.request.ProxyHandler(
                {"http": self.config.proxy, "https": self.config.proxy}))
        opener = urllib.request.build_opener(*handlers)
        try:
            req = urllib.request.Request(url, headers=headers)
            with opener.open(req, timeout=self.config.timeout or 30) as r:
                return r.read(500 * 1024).decode("utf-8", "replace")
        except (urllib.error.URLError, OSError, ValueError,
                http.client.HTTPException):
            # BadStatusLine/IncompleteRead subclass HTTPException, NOT
            # OSError — a malformed robots response must also mean "no
            # restrictions", not a dead crawl
            return None

    def _ingest_host_robots(self, hosts: list[tuple[str, str]]) -> None:
        """Fetch + install robots.txt for a batch of (host, scheme), each
        host AT MOST ONCE per crawl (failures included).  Live hosts fetch
        CONCURRENTLY (a page whose assets span N dead third-party hosts
        must stall one timeout, not N); mock mode reads every wanted
        /robots.txt row from the pages fixture in ONE filter+collect.  The
        broadcast rules table is rebuilt once per batch, not per host."""
        wanted = [(h, sc) for h, sc in hosts
                  if h and h not in self._robots_fetched]
        if not wanted:
            return
        self._robots_fetched.update(h for h, _ in wanted)
        texts: list[tuple[str, str]] = []
        if self.live:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=min(8, len(wanted))) as ex:
                fetched = ex.map(lambda p: self._get_robots_text(*p), wanted)
                texts = [(h, t) for (h, _), t in zip(wanted, fetched)
                         if t is not None]
        elif self.pages is not None:
            urls = {f"{sc or 'http'}://{h}/robots.txt": h
                    for h, sc in wanted}
            rows = self.pages.filter(F.col("url").isin(list(urls))) \
                             .select("url", "body").collect()
            texts = [(urls[r.url],
                      bytes(r.body)[:500 * 1024].decode("utf-8", "replace"))
                     for r in rows if r.body is not None]
        apply_rules = self.config.fetch_robots
        for host, text in sorted(texts):
            self._add_robots_txt(host, text, apply_rules=apply_rules)
        self._rebuild_rfc_rules()

    def _sitemap_candidates(self) -> DataFrame | None:
        """Sitemap-seeded frontier bootstrap (sitemaps.org; no reference
        analog).  Sitemap files are fetched DISTRIBUTED through the normal
        fetch seam (mock join or live per-host batches — politeness and
        cookies apply), ``<loc>`` extraction is a JVM-side column regex
        (functions/sitemap.py), and ``<sitemapindex>`` fan-out is followed
        for up to 3 rounds (urlset / index→urlset / index→index→urlset);
        loc extraction and dedup stay DataFrame-side at any volume, with
        one documented cap: the final deterministic ordering uses
        CAND_SCHEMA's 32-bit intra1, so >2^31-1 distinct locs raise
        loudly instead of overflowing (no real site approaches this; the
        protocol caps one index level at 50k×50k = 2.5e9 only in theory).

        Page locs become candidate rows at ``stage_rank 7`` (after the seed
        page's own 'a' refs, rank 6), ordered lexicographically via the
        scalable global_sequence — deterministic like every other stage.
        Cross-host / non-http locs are NOT special-cased: normal admission
        (F1/F5, insert-before-reject) drops them exactly like link
        candidates.  Sitemap fetches themselves are bootstrap machinery and
        do not enter the fetch log or the seen set."""
        spark = self.spark
        from ..functions.sitemap import col_is_sitemap_index, col_sitemap_locs
        from ..functions.urlnorm import (
            col_dedup_key,
            col_host,
            col_path,
            col_scheme,
            col_scheme_ok,
            col_strip_fragment,
        )
        from ..operators.ranking import global_sequence

        urls = list(dict.fromkeys(
            self._sitemap_lines.get(self.seed_host, []))) or \
            [f"{self.seed.scheme}://{self.seed_host}/sitemap.xml"]
        done = spark.createDataFrame([(u,) for u in sorted(set(urls))],
                                     "url string")
        cur, n_cur = done, len(urls)
        loc_frames: list[DataFrame] = []
        for _ in range(3):
            fetched = self._do_fetch(cur, approx_rows=n_cur) \
                          .select("url", "body", "status")
            # cast, not decode: Spark 4's decode() THROWS on any invalid
            # UTF-8 byte (a .xml.gz sitemap or latin-1 bytes would abort
            # the crawl); binary->string cast substitutes U+FFFD like the
            # robots paths' Python decode(..., 'replace')
            body = F.col("body").cast("string")
            ok = self._localckpt(
                fetched.filter(F.col("status") == "ok").select(
                    col_sitemap_locs(body).alias("locs"),
                    col_is_sitemap_index(body).alias("is_idx")),
                "sitemap_fetch")
            loc_frames.append(ok.filter(~F.col("is_idx"))
                              .select(F.explode("locs").alias("loc")))
            subs = (ok.filter(F.col("is_idx"))
                    .select(F.explode("locs").alias("url")).distinct()
                    .join(done, "url", "left_anti"))
            subs = self._localckpt(subs, "sitemap_index")
            n_cur = subs.count()
            if n_cur == 0:
                break
            cur = subs
            done = done.unionByName(subs)
        locs = loc_frames[0]
        for f in loc_frames[1:]:
            locs = locs.unionByName(f)
        u = col_strip_fragment(F.col("loc"))
        parsed = (locs.distinct()
                  .select(u.alias("url"), col_scheme(u).alias("scheme"),
                          col_host(u).alias("host"),
                          col_path(u).alias("path"))
                  # the protocol requires absolute URLs; relative locs have
                  # no host and cannot be resolved reliably — drop them
                  .filter(col_scheme_ok(F.col("scheme"))
                          & (F.col("host") != "")))
        keyed = self._localckpt(
            parsed.withColumn(
                "dedup_key", col_dedup_key(F.col("url"), F.col("host"),
                                           F.col("path"),
                                           F.lit(self.seed_host))),
            "sitemap_locs")
        n = keyed.count()
        if n == 0:
            return None
        if n > 2**31 - 1:
            # CAND_SCHEMA's intra1 is 32-bit (every other stage's intra
            # counters are per-page positions); a >2^31-loc sitemap set
            # would overflow the cast below — refuse loudly rather than
            # corrupt the deterministic candidate order
            raise ValueError(
                f"sitemap loc set ({n} rows) exceeds the 2^31-1 intra1 "
                "ordering capacity; widen CAND_SCHEMA intra1 to bigint")
        # size from the SESSION default, not the epoch-loop's data-sized
        # shuffle.partitions (epoch 0 is one frontier row -> ~2 parts,
        # which would bottleneck a million-loc sitemap sequence)
        default_parts = getattr(self, "_default_parts", None) or \
            int(spark.conf.get("spark.sql.shuffle.partitions"))
        seqd = global_sequence(keyed, ["url"], out_col="_i",
                               parts=min(default_parts, n // 2000 + 1))
        return seqd.select(
            F.lit(self.seed.string()).alias("page_url"),
            F.lit(0).cast("bigint").alias("parent_seq"),
            F.lit(7).alias("stage_rank"), F.lit(0).alias("sub_rank"),
            F.col("_i").cast("int").alias("intra1"),
            F.lit(0).alias("intra2"),
            "url", "scheme", "host", "path",
            F.lit(False).alias("is_asset"), F.lit(0).alias("depth"),
            F.lit("sitemap").alias("stage"), "dedup_key")

    def run(self, resume: bool = False) -> CrawlResult:
        spark = self.spark
        cfg = self.config
        if cfg.fetch_robots or cfg.use_sitemaps:
            # --robots: fetch + honor; --sitemaps alone: fetch only to
            # discover Sitemap: lines (rules are not installed).  Mock mode
            # reads /robots.txt from the pages fixture (the reference's own
            # test seam) so both fetch modes expose the same robots surface.
            self._fetch_seed_robots()

        resumed = None
        if resume and self.checkpoint is not None:
            resumed = self.checkpoint.resume_state(spark)

        if resumed is None:
            # seed admission, driver-side (scraper/scraper.go:157): the seed
            # is one row; its key is inserted before everything else.
            from ..functions.urlnorm import dedup_key as py_dedup_key
            seed_key = py_dedup_key(self.seed, self.seed_host)
            self._seed_key = seed_key  # pre-rebase key, needed at commit time
            if not self._seed_admitted():
                raise ValueError("start page is excluded from downloading")
            seen = spark.createDataFrame([(seed_key, 0)],
                                         "dedup_key string, epoch int")
            frontier = spark.createDataFrame(
                [(self.seed.string(), 0, 0)],
                "url string, depth int, seq bigint")
            epoch = 0
            next_seq = 1
            n_frontier = 1
        else:
            # north_rule: resume at the last committed frontier epoch; the
            # seen table is the union of committed deltas (the epoch-0 delta
            # includes the seed key), Bloom is rebuilt from it below.
            epoch, frontier, seen = resumed
            last_metrics = self.checkpoint.metrics()[-1]
            next_seq = int(last_metrics["next_seq"])
            self.seed_host = last_metrics.get("seed_host", self.seed_host)
            n_frontier = frontier.count()

        self.bloom = SeenSet() if self.use_bloom else None
        if self.bloom is not None:
            self.bloom.enable_stats(spark.sparkContext)
            if resumed is None:
                self.bloom.add_keys([r.dedup_key for r in seen.collect()])
            else:
                self.bloom.add_keys_df(seen)  # rebuild from committed table

        fetch_logs: list[DataFrame] = []
        documents: list[DataFrame] = []
        outputs: list[DataFrame] = []
        default_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # the loop re-sets shuffle.partitions per epoch; stages that size
        # their own shuffles (sitemap bootstrap) need the session default
        self._default_parts = default_parts
        # AQE is disabled for the LOOP's duration (restored after): the loop
        # sizes every shuffle from per-epoch data volume itself, the
        # post-aggregation join keys are unique (first-wins/fileExists
        # groups — nothing for AQE's skew split to do), and the mock joins
        # are explicitly gated broadcasts — so AQE's per-query-stage job
        # submissions only added driver latency (measured r6: 39.8 -> 18.3
        # jobs/epoch, wall flat-to-better; OPTIMIZATION_r06.md).  At
        # production scale per-epoch jobs amortize and AQE back on is fine:
        # GOSCRAPE_LOOP_AQE=1 keeps it enabled.
        aqe_prev = None
        if os.environ.get("GOSCRAPE_LOOP_AQE", "0") == "0":
            aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.enabled", "false")

        # filesystem state for the fileExists asset skip
        # (scraper/download.go:76-79): one row per already-written path
        written = spark.createDataFrame([], "file_path string")
        # safe OVERestimate of written's row count (pages + allowed assets
        # accumulated per epoch) — gates the broadcast fileExists anti-join
        self._written_rows = 0
        if resumed is not None and self.checkpoint is not None:
            w = self.checkpoint.resume_written(spark)
            if w is not None:
                written = w
                self._written_rows = written.count()

        self._live_fetch_cache = None
        while epoch < self.max_epochs:
            if n_frontier == 0:
                break
            self._live_fetch_cache = None  # css-fetch cache is per-epoch
            self._n_frontier = n_frontier  # gates the broadcast mock plan

            # Adaptive parallelism, sized by DATA not cores: shuffle stages
            # in the loop move small metadata rows, so partition counts
            # follow row volume (per-task overhead otherwise dominates — a
            # 32-partition shuffle of 1k rows is pure scheduling cost).  The
            # Python-heavy stages (extract/rewrite mapInPandas) are fanned
            # out separately to all cores below.  The frontier is explicitly
            # repartitioned because W2's global sequence window necessarily
            # emitted a single partition.
            parts = max(2, min(default_parts, n_frontier // 2000 + 1))
            cpu_parts = max(2, min(default_parts, n_frontier // 50 + 1))
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            frontier = frontier.repartition(parts, "url")

            fetched = self._fetch(frontier, epoch)
            meta_lazy = None
            if self.live or epoch == 0:
                # live: the checkpoint pins real network side effects (one
                # GET per URL).  epoch 0: one row; the depth-0 redirect
                # rebase (first()) needs a materialized frame.
                fetched = self._localckpt(fetched, "fetched")
                if epoch == 0:
                    fetched = self._rebase_seed(fetched)
                fetched_meta = fetched
            else:
                # mock: fetch outcomes are a pure fixture join — checkpoint
                # only body-FREE metadata (log/meta consumers) derived from
                # the slim fixture table (_fetch_meta) so the epoch never
                # re-reads body-bearing fixture blocks just to drop the
                # column; bodies flow lazily and are materialized once per
                # epoch (inside the processed checkpoint below)
                meta_lazy = self._fetch_meta(frontier)

            pages_ok = fetched.filter(F.col("status") == "ok")
            # FUSED per-page Arrow pass (operators/extract.process_pages_df):
            # media-ref extraction + binary sniff + offline rewrite + output
            # path in ONE stage, so each body crosses the JVM->Python
            # boundary once per epoch; fanned out to all cores regardless of
            # the (data-sized) shuffle partitioning.  The full interleaved
            # span table (with text runs) stays lazy and is only computed if
            # the caller materializes CrawlResult.documents.
            page_bodies = pages_ok.select(
                F.col("page_url").alias("url"), "body", "seq")
            if cpu_parts != parts:
                # only worth a body shuffle when it actually adds parallelism
                # (small epochs); at big epochs the fetch join already ran at
                # the same width
                page_bodies = page_bodies.repartition(cpu_parts, "url")
            processed_lazy = process_pages_df(page_bodies, self.seed_host,
                                              self.config.output_directory)
            if meta_lazy is not None:
                # the body-free meta checkpoint and the Arrow-heavy fused
                # pass share no lineage: overlap them (§2.6) so the tiny
                # meta job back-fills cores idled by the Arrow stage's tail
                processed, fetched_meta = self._parallel(
                    lambda: self._localckpt(processed_lazy, "processed"),
                    lambda: self._localckpt(meta_lazy, "fetched_meta"))
            else:
                processed = self._localckpt(processed_lazy, "processed")
            pages_ok_meta = fetched_meta.filter(F.col("status") == "ok")

            page_meta = pages_ok_meta.select(
                F.col("page_url"), F.col("seq").alias("parent_seq"),
                F.col("depth"))
            full_spans = extract_spans_df(page_bodies, include_text=True)
            documents.append(full_spans.join(
                page_meta.select("page_url", "depth"),
                full_spans["url"] == page_meta["page_url"], "left")
                .drop("page_url")
                .withColumn("epoch", F.lit(epoch)))

            # file paths the ok pages of this epoch write (the "filesystem
            # state" the fileExists check consults, download.go:76-79) fall
            # out of the fused pass for free.  Slim checkpoint: the several
            # consumers (blockers union, first-ok agg, written delta) would
            # otherwise each re-scan the body-bearing processed blocks to
            # project two tiny columns.
            # deferred: the first consumer (the fileExists admission) is
            # several actions downstream, so this tiny checkpoint overlaps
            # the admission chain instead of serializing before it
            page_paths_d = self._deferred(lambda: self._localckpt(
                processed.select("file_path", "seq"), "page_paths"))

            if n_frontier <= self.CANDIDATES_BROADCAST_MAX:
                # shuffle-free: per-tag arrays built on the page row, tiny
                # meta broadcast (see _candidates_fast)
                candidates = self._candidates_fast(processed, page_meta)
            else:
                # beyond the broadcast gate: the explode + re-aggregate
                # shape (equivalent rows; shuffles on url)
                spans = (processed.select("url", F.explode("refs").alias("r"))
                         .select("url", "r.*"))
                candidates = self._base_candidates(spans, page_meta)
            if epoch == 0 and cfg.use_sitemaps:
                sm_cands = self._sitemap_candidates()
                if sm_cands is not None:
                    candidates = candidates.unionByName(sm_cands)

            inserts, survivors, assets_allowed, assets_deferred = \
                self._admission_fixpoint(candidates, seen, page_paths_d,
                                         written)

            # record fetches: the page fetches of this epoch + admitted assets
            # pages are all seed-host (F5), so the robots Crawl-delay
            # merge collapses to one scalar max here
            page_delay_ms = max(cfg.politeness_delay_ms,
                                self._host_delay_ms.get(self.seed_host, 0))
            if page_delay_ms > 0:
                # epoch seqs are dense [epoch_base, epoch_base + n): W2's
                # global_sequence assigned start=next_seq-n_frontier..-1, so
                # the politeness offset is pure column arithmetic — no
                # window, no shuffle.  (Was row_number() OVER (ORDER BY seq):
                # a single-task sort of the whole epoch whenever
                # politeness_delay_ms > 0 — the exact W2 scale-killer shape.)
                epoch_base = next_seq - n_frontier
                page_not_before = ((F.col("seq") - F.lit(epoch_base))
                                   .cast("long")
                                   * F.lit(page_delay_ms))
            else:
                page_not_before = F.lit(0).cast("long")
            page_log = fetched_meta.select(
                F.col("req_url").alias("url"), F.lit("page").alias("kind"),
                page_not_before.alias("not_before_ms"),
                F.col("status"), F.col("attempts"),
                F.col("seq").alias("parent_seq"),
                F.lit(0).alias("stage_rank"), F.lit(0).alias("sub_rank"),
                F.lit(0).alias("intra1"), F.lit(0).alias("intra2"),
                F.col("depth"), F.lit(epoch).alias("epoch"),
                F.lit("").alias("stage"))

            # Three independent post-admission branches (all consume the
            # just-checkpointed inserts/assets_allowed): the asset fetch,
            # the next-frontier sequence assignment, and the Bloom build.
            # Overlapped (§2.6) so each branch's driver latency and stage
            # tails back-fill the others; sequential under GOSCRAPE_PARALLEL=0.
            delta = inserts.select("dedup_key") \
                           .withColumn("epoch", F.lit(epoch + 1))

            def _assets_branch():
                af = self._localckpt(
                    self._fetch_assets(assets_allowed, epoch,
                                       deferred=assets_deferred),
                    "asset_fetch")
                # slim written-delta checkpoint: the lazy union chain used
                # to reference the BODY-bearing asset_fetch blocks, so every
                # later epoch's fileExists anti-join re-deserialized all
                # prior epochs' asset payloads just to read file_path.  One
                # tiny checkpoint per epoch keeps the chain body-free.
                wd = self._localckpt(
                    page_paths_d.get().select("file_path").unionByName(
                        af.filter(F.col("status") == "ok")
                          .select("file_path")),
                    "written_delta")
                return af, wd

            def _seq_branch():
                # next frontier: page survivors ordered by the composite key
                # (W2).  global_sequence range-partitions + offsets instead
                # of a single-task global window once the epoch is wide
                # enough; its scalable path already counted its partitions —
                # reuse instead of an extra count() job.
                from ..operators.ranking import global_sequence_with_total
                seq_df, seq_total = global_sequence_with_total(
                    survivors.filter(~F.col("is_asset"))
                             .select("url", "depth", *ORDER_COLS),
                    ORDER_COLS, start=next_seq, out_col="seq",
                    parts=parts)
                np_df = self._localckpt(
                    seq_df.select("url", (F.col("depth") + 1).alias("depth"),
                                  "seq"), "next_pages")
                return np_df, (seq_total if seq_total is not None
                               else np_df.count())

            def _bloom_branch():
                if self.bloom is not None:
                    # distributed per-partition build, OR-merged driver-side
                    self.bloom.add_keys_df(delta)

            (asset_fetch, written_delta), (next_pages, n_next), _ = \
                self._parallel(_assets_branch, _seq_branch, _bloom_branch)
            fetch_logs.append(page_log)
            fetch_logs.append(asset_fetch.drop("body", "file_path"))

            # output table: pages (already rewritten in the fused pass) +
            # fetched assets
            outputs.append(
                processed.select("url", "file_path", "body", "is_page", "seq")
                .withColumn("wpos", F.struct(
                    F.lit(epoch).alias("epoch"), self._page_pos().alias("pos")))
                .drop("seq")
                .withColumn("epoch", F.lit(epoch)))
            outputs.append(self._asset_outputs(asset_fetch, epoch))

            # filesystem-state accumulation: every ok page write + every ok
            # (unblocked) asset write becomes an existing file for later
            # epochs' fileExists admission.  Slim per-epoch checkpoints
            # (built in _assets_branch) — duplicates are harmless for the
            # anti-join, so no distinct shuffle.
            written = written.unionByName(written_delta)
            if self._fs_obs is not None:
                # overestimate: every frontier page + every allowed asset
                self._written_rows += n_frontier + \
                    int(self._fs_obs.get["n_allowed"])
            else:
                self._written_rows = self.WRITTEN_BROADCAST_MAX + 1

            # seen append (insert-before-reject: ALL admitted keys).  The
            # first-wins window already guarantees one row per key, so no
            # distinct; the union stays lazy — every branch is a checkpoint,
            # so lineage is shallow and nothing recomputes.
            seen = seen.unionByName(delta)
            next_seq += n_next
            frontier = next_pages
            n_frontier = n_next
            if self.checkpoint is not None:
                commit_delta = delta
                if epoch == 0:
                    # epoch-0 delta must carry the driver-inserted seed key
                    # (computed BEFORE any depth-0 redirect rebase) so a
                    # resume can reconstruct seen purely from deltas
                    seed_row = spark.createDataFrame(
                        [(self._seed_key, 0)],
                        "dedup_key string, epoch int")
                    commit_delta = delta.unionByName(seed_row)
                self.checkpoint.commit_epoch(
                    epoch, frontier=frontier, seen_delta=commit_delta,
                    metrics={"next_seq": next_seq,
                             "seed_host": self.seed_host,
                             # already counted by the loop: no extra action
                             "frontier_rows": n_next},
                    written_delta=written_delta)
            # plan-depth compaction: seen/written are lazy unionByName
            # chains over per-epoch checkpointed deltas — correct at BFS
            # depths, but the union tree (and Catalyst analysis time per
            # epoch) grows linearly with epochs.  Every K epochs collapse
            # the chain into ONE checkpointed table so a deep/continuous
            # crawl's per-epoch plan stays O(K), not O(epoch).  Children
            # are already materialized, so this re-reads checkpoint blocks
            # once per K epochs and recomputes nothing.
            if (epoch + 1) % self.compact_every == 0:
                seen = self._localckpt(seen, "seen_compact")
                written = self._localckpt(written, "written_compact")
            epoch += 1

        spark.conf.set("spark.sql.shuffle.partitions", str(default_parts))
        if aqe_prev is not None:
            spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)

        empty_log = self.spark.createDataFrame(
            [], "url string, kind string, not_before_ms bigint, status string,"
                " attempts int, parent_seq bigint, stage_rank int, "
                "sub_rank int, intra1 int, intra2 int, depth int, epoch int, "
                "stage string")
        empty_doc = self.spark.createDataFrame(
            [], "url string, kind string, text string, media_ref string, "
                "offset int, tag_idx int, attr string, vstart int, vend int, "
                "token string, depth int, epoch int")
        empty_out = self.spark.createDataFrame(
            [], "url string, file_path string, body binary, is_page boolean, "
                "epoch int, wpos struct<epoch:int, pos:struct<"
                "parent_seq:bigint, stage_rank:int, sub_rank:int, "
                "intra1:int, intra2:int>>")
        fetch_log = _union_all(fetch_logs, empty_log)
        docs = _union_all(documents, empty_doc)
        # final filesystem state: the LAST writer per path in sequential
        # write order wins, exactly like the reference's overwriting file
        # sink (pages always overwrite; assets only write unseen paths) —
        # one row per output file, order-insensitive.
        out_log = _union_all(outputs, empty_out)
        row = F.struct(*[F.col(c) for c in
                         ("url", "file_path", "body", "is_page", "epoch")])
        out = (out_log.groupBy("file_path")
               .agg(F.max_by(row, F.col("wpos")).alias("_r"))
               .select("_r.url", "file_path", "_r.body", "_r.is_page",
                       "_r.epoch"))
        return CrawlResult(seen=seen, fetch_log=fetch_log, documents=docs,
                           output=out, epochs=epoch, seed_host=self.seed_host,
                           cookies=self._final_cookies())

    def _final_cookies(self) -> list[dict]:
        """Live (non-expired) session cookies, like Scraper.Cookies()
        filtering through the jar (scraper/cookies.go:20-37)."""
        now = time.time()
        return [dict(d) for d in self._session_cookies.values()
                if d.get("expires") is None or d["expires"] > now]

    # ------------------------------------------------------------------
    def _seed_admitted(self) -> bool:
        from ..plans.simulator import Simulator
        sim = Simulator(config=self.config, pages={})
        return sim.should_download(self.seed, 0, False)

    _TIMING = os.environ.get("GOSCRAPE_TIMING", "") == "1"

    # Overlap INDEPENDENT epoch actions (guide §2.6: actions are only
    # sequential because driver code calls them sequentially): each thunk's
    # jobs back-fill executors freed by the others' stage tails, and the
    # ~50-100 ms per-job driver latency of the epoch's bookkeeping actions
    # overlaps instead of summing.  InheritableThread propagates the JVM
    # thread-locals (job group), so bench job accounting still sees every
    # job.  GOSCRAPE_PARALLEL=0 restores the sequential loop.
    _PARALLEL = os.environ.get("GOSCRAPE_PARALLEL", "1") == "1"

    def _deferred(self, fn):
        """Start ``fn`` on an InheritableThread now; ``.get()`` joins and
        returns its result (re-raising any failure).  Used to overlap a
        checkpoint whose consumer is several actions downstream."""
        if not self._PARALLEL:
            class _Now:
                def __init__(self, v):
                    self._v = v

                def get(self):
                    return self._v
            return _Now(fn())
        from pyspark import InheritableThread

        box: dict = {}

        def work():
            try:
                box["v"] = fn()
            except BaseException as e:
                box["e"] = e

        t = InheritableThread(target=work)
        t.start()

        class _Pending:
            def get(self):
                t.join()
                if "e" in box:
                    raise box["e"]
                return box["v"]
        return _Pending()

    def _parallel(self, *thunks):
        """Run callables concurrently in InheritableThreads; return their
        results in order.  Falls back to sequential execution when disabled
        or for a single thunk."""
        if not self._PARALLEL or len(thunks) == 1:
            return [t() for t in thunks]
        from pyspark import InheritableThread
        results: list = [None] * len(thunks)
        errors: list = []

        def work(i, fn):
            try:
                results[i] = fn()
            except BaseException as e:  # surface the first failure
                errors.append(e)

        threads = [InheritableThread(target=work, args=(i, fn))
                   for i, fn in enumerate(thunks)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise errors[0]
        return results

    def _localckpt(self, df: DataFrame, label: str = "") -> DataFrame:
        # eager: truncate lineage AND materialize once — every epoch state is
        # consumed by several downstream actions, and without materialization
        # the whole epoch chain would re-execute per action.
        t0 = time.time()
        out = df.localCheckpoint(eager=True)
        dt = time.time() - t0
        self.stage_secs[label] = self.stage_secs.get(label, 0.0) + dt
        if self._TIMING:
            print(f"    ckpt[{label}]: {dt:.2f}s", flush=True)
        return out

    def _do_fetch_cached(self, urls: DataFrame) -> DataFrame:
        """Live fetch that serves this epoch's css-discovery GETs from the
        in-epoch cache (one real GET per URL per epoch)."""
        if not self.live or self._live_fetch_cache is None:
            return self._do_fetch(urls)
        cache = self._live_fetch_cache
        hit = urls.join(cache, on="url", how="inner")
        miss = urls.join(cache.select("url"), on="url", how="left_anti")
        fetched_miss = self._do_fetch(miss)
        return fetched_miss.unionByName(hit.select(*fetched_miss.columns))

    def _do_fetch(self, urls: DataFrame,
                  approx_rows: int | None = None) -> DataFrame:
        """The fetch seam: (url) -> (url, body, resp_url, status, attempts).

        Mock mode: J2 fixture join + S2 retry outcome as columns (the
        reference retries 429s inline with linear backoff,
        scraper/http.go:50-96, so retry outcomes never change crawl order —
        we compute them directly: ok when retry_after <= max_retries, else
        exhausted after max_retries+1 attempts).
        Live mode: per-host applyInPandas HTTP batches (sources/fetch.py)
        with the same schema and real inline backoff + politeness sleeps."""
        if self.live:
            import json as _json

            from ..sources.fetch import http_fetch_df
            fetched = http_fetch_df(
                urls, self.config,
                session_cookies=list(self._session_cookies.values()),
                host_delays_ms=self._host_delay_ms)
            # absorb the batches' final jar snapshots so cookies set in this
            # round (e.g. a login page's session id) are presented in later
            # rounds/epochs, like the reference's shared jar.  The harvest
            # is a tiny collect over one snapshot row per host batch; the
            # checkpoint would happen downstream anyway and keeps the fetch
            # from re-executing per consumer.
            fetched = fetched.localCheckpoint(eager=True)
            for r in fetched.select(
                    F.explode("set_cookies").alias("c")).collect():
                d = _json.loads(r.c)
                self._session_cookies[
                    (d["domain"], d["path"], d["name"])] = d
            return fetched.drop("set_cookies")
        maxr = self.config.max_retries
        if self._mock_broadcastable(approx_rows):
            # Broadcast plan: the frontier/asset url set is the SMALL side,
            # but outer joins can only broadcast the build (non-preserved)
            # side — so split into an inner join (bodies stream past a
            # broadcast hash of the urls, no shuffle or sort of the
            # body-bearing fixture) plus an anti-join for fixture misses
            # against the body-free slim table.  Saves a full sort of the
            # ~GB fixture per epoch; the legacy shuffle plan remains the
            # fallback for oversized url sets.
            hit = self.pages.join(F.broadcast(urls.select("url")),
                                  on="url", how="inner")
            hit_f = self._mock_fetch_select(hit, maxr)
            miss = urls.select("url").join(
                F.broadcast(self._pages_slim().select("url")),
                on="url", how="left_anti")
            miss_f = miss.select(
                F.col("url"), F.lit(None).cast("binary").alias("body"),
                F.col("url").alias("resp_url"),
                F.lit("missing").alias("status"), F.lit(1).alias("attempts"))
            return hit_f.unionByName(miss_f)
        joined = urls.select("url").join(self.pages, on="url", how="left")
        return self._mock_fetch_select(joined, maxr)

    @staticmethod
    def _mock_fetch_select(joined: DataFrame, maxr: int) -> DataFrame:
        return joined.select(
            F.col("url"),
            F.when(F.col("retry_after") <= maxr, F.col("body")).alias("body"),
            F.coalesce(F.col("resp_url"), F.col("url")).alias("resp_url"),
            F.when(F.col("body").isNull(), F.lit("missing"))
             .when(F.col("retry_after") > maxr, F.lit("exhausted"))
             .otherwise(F.lit("ok")).alias("status"),
            F.when(F.col("body").isNull(), F.lit(1))
             .when(F.col("retry_after") > maxr, F.lit(maxr + 1))
             .otherwise(F.coalesce(F.col("retry_after"), F.lit(0)) + 1)
             .alias("attempts"))

    # frontier rows above this fall back from the broadcast mock-fetch plan
    # to the co-partitioned shuffle join (a broadcast hash of the epoch's
    # url set must fit comfortably in every executor)
    MOCK_BROADCAST_MAX = 2_000_000

    # estimated in-memory cap for broadcasting the slim pages table: a
    # broadcast is replicated to EVERY executor, so the gate must be sized
    # on bytes, not rows — 5M rows of realistic (~60-120 B) URLs is a
    # multi-hundred-MB build that can OOM small executors.  Estimate =
    # raw url bytes + per-row hash-entry overhead.
    PAGES_BROADCAST_MAX_BYTES = int(os.environ.get(
        "GOSCRAPE_PAGES_BROADCAST_MAX_BYTES", 128 << 20))
    _BROADCAST_ROW_OVERHEAD = 48

    def _mock_broadcastable(self, approx_rows: int | None = None) -> bool:
        # gate on the ACTUAL url-set size when the caller knows it (asset/
        # css sets can be a fanout multiple of the page frontier); the
        # frontier count is only the default for the page-fetch path
        rows = self._n_frontier if approx_rows is None else approx_rows
        return (not self.live
                and rows <= self.MOCK_BROADCAST_MAX
                and self._pages_broadcastable())

    def _pages_slim(self) -> DataFrame:
        """(url, has_body, retry_after): body-free fixture metadata,
        checkpointed once per crawl — per-epoch status joins broadcast this
        tiny table instead of re-reading body-bearing fixture blocks."""
        if self._pages_slim_df is None:
            self._pages_slim_df = self.pages.select(
                "url", F.col("body").isNotNull().alias("has_body"),
                "retry_after", "resp_url").localCheckpoint(eager=True)
        return self._pages_slim_df

    def _pages_rows(self) -> int:
        return self._pages_stats()[0]

    def _pages_stats(self) -> tuple[int, int]:
        """(row count, sum of url lengths) over the slim checkpoint — one
        job, cached for the crawl; sizes the broadcast gate on BYTES."""
        if self._pages_count is None:
            row = self._pages_slim().agg(
                F.count(F.lit(1)), F.sum(F.octet_length("url"))).first()
            self._pages_count = int(row[0])
            self._pages_url_bytes = int(row[1] or 0)
        return self._pages_count, self._pages_url_bytes

    def _pages_broadcastable(self) -> bool:
        rows, url_bytes = self._pages_stats()
        est = url_bytes + rows * self._BROADCAST_ROW_OVERHEAD
        return est <= self.PAGES_BROADCAST_MAX_BYTES

    def _mock_status(self, urls: DataFrame) -> DataFrame:
        """(url, status) for mock mode WITHOUT touching body blocks — the
        fileExists collision check needs outcomes only."""
        return self._attach_mock_status(urls).select("url", "status")

    def _attach_mock_status(self, df: DataFrame) -> DataFrame:
        """Append a ``status`` column to any url-keyed frame via the
        body-free slim fixture table (broadcast when it fits — a left join
        against the unique-url slim side never fans out)."""
        maxr = self.config.max_retries
        slim = self._pages_slim().select("url", "has_body", "retry_after")
        if self._pages_broadcastable():
            slim = F.broadcast(slim)
        return (df.join(slim, on="url", how="left")
                .withColumn(
                    "status",
                    F.when(~F.coalesce(F.col("has_body"), F.lit(False)),
                           F.lit("missing"))
                     .when(F.col("retry_after") > maxr, F.lit("exhausted"))
                     .otherwise(F.lit("ok")))
                .drop("has_body", "retry_after"))

    def _fetch_meta(self, frontier: DataFrame) -> DataFrame:
        """Body-FREE fetch metadata for the mock seam: the per-epoch
        ``fetched_meta`` checkpoint only feeds the fetch log and the
        candidate page_meta, yet it used to be derived from the full
        body-bearing fetch join — materializing it re-read every fixture
        body block each epoch just to drop the column (checkpoint blocks
        don't support projection pushdown).  This joins the frontier
        against the slim (url, has_body, retry_after, resp_url) table
        instead: identical rows (same when-chains as _mock_fetch_select /
        _fetch), ~KB-scale scan instead of the full fixture (guide §2.3:
        project before you materialize).  Column order matches
        ``_fetch(...).drop('body')`` exactly."""
        maxr = self.config.max_retries
        slim = self._pages_slim()
        if self._pages_broadcastable():
            slim = F.broadcast(slim)
        joined = frontier.select("url", "depth", "seq").join(
            slim, on="url", how="left")
        has_body = F.coalesce(F.col("has_body"), F.lit(False))
        return joined.select(
            F.col("url").alias("req_url"),
            F.col("url").alias("page_url"),
            F.coalesce(F.col("resp_url"), F.col("url")).alias("resp_url"),
            F.col("depth"), F.col("seq"),
            F.when(~has_body, F.lit("missing"))
             .when(F.col("retry_after") > maxr, F.lit("exhausted"))
             .otherwise(F.lit("ok")).alias("status"),
            F.when(~has_body, F.lit(1))
             .when(F.col("retry_after") > maxr, F.lit(maxr + 1))
             .otherwise(F.coalesce(F.col("retry_after"), F.lit(0)) + 1)
             .alias("attempts"))

    def _fetch(self, frontier: DataFrame, epoch: int) -> DataFrame:
        fetched = self._do_fetch(frontier.select("url"),
                                 approx_rows=self._n_frontier)
        if (not self.live) and self._mock_broadcastable(self._n_frontier):
            # fetched covers exactly the frontier's url set (hit + miss
            # partition it), so the meta attach is an inner join and the
            # small frontier side can be the broadcast build
            joined = fetched.join(F.broadcast(frontier), on="url",
                                  how="inner")
        else:
            joined = frontier.join(fetched, on="url", how="left")
        return joined.select(
            F.col("url").alias("req_url"),
            F.col("url").alias("page_url"), F.col("body"),
            F.coalesce(F.col("resp_url"), F.col("url")).alias("resp_url"),
            F.col("depth"), F.col("seq"),
            F.coalesce(F.col("status"), F.lit("missing")).alias("status"),
            F.coalesce(F.col("attempts"), F.lit(1)).alias("attempts"),
        ).withColumn("body", F.when(F.col("status") == "ok", F.col("body")))

    def _rebase_seed(self, fetched: DataFrame) -> DataFrame:
        """Depth-0 redirect rebase (scraper/scraper.go:193-198): the seed's
        response URL becomes the base URL and host for the whole crawl."""
        row = fetched.select("page_url", "resp_url", "status").first()
        if row is None or row.status != "ok":
            return fetched
        if row.resp_url and row.resp_url != row.page_url:
            new_u = parse_url(row.resp_url)
            self.seed = GoURL(scheme=new_u.scheme, host=new_u.host,
                              path=new_u.path, query=new_u.query)
            self.seed_host = new_u.host
            return fetched.withColumn(
                "page_url",
                F.when(F.col("page_url") == row.page_url,
                       F.lit(row.resp_url)).otherwise(F.col("page_url")))
        return fetched

    # frontier sizes above this fall back from the shuffle-free candidate
    # fast path (per-page array ops + broadcast page-meta join) to the
    # explode + re-aggregate shape: the broadcast side is one small row per
    # frontier page, so the gate bounds executor memory like the mock gate
    CANDIDATES_BROADCAST_MAX = int(os.environ.get(
        "GOSCRAPE_CAND_BROADCAST_MAX", 2_000_000))

    # written-path rows above this fall back from the broadcast fileExists
    # anti-join (neither side shuffles) to the shuffle join; the loop
    # tracks a safe overestimate (pages + allowed assets per epoch).  At
    # production scale `written` is bucketed by file_path instead.
    WRITTEN_BROADCAST_MAX = int(os.environ.get(
        "GOSCRAPE_WRITTEN_BROADCAST_MAX", 1_000_000))

    def _candidates_fast(self, processed: DataFrame,
                         page_meta: DataFrame) -> DataFrame:
        """_base_candidates without the explode + re-aggregate shuffle.

        The fused pass already returns refs AS AN ARRAY PER PAGE;
        _base_candidates explodes them into one row per ref and then
        groupBy(url)s them straight back into per-tag arrays — at the
        100k-page bench epoch that is a ~2M-row, every-ref-column shuffle
        per epoch to recompute locality the data already had (guide §2.4:
        remove shuffles outright).  This path builds the per-tag distinct
        sorted arrays with array functions on the page row (no exchange)
        and broadcast-joins the tiny (page_url, parent_seq, depth) meta.
        Row-identical to _base_candidates (pinned by
        tests/test_round6_candidates_fast.py): filter+array_distinct+
        array_sort ≡ collect_set(when(...))+array_sort per tag, pages
        with no refs contribute zero rows through either shape, and the
        per-tag intra1 indices come from the same sorted arrays."""
        from ..operators.extract import TAG_BY_KIND

        tag_expr = F.create_map(*[F.lit(x) for kv in TAG_BY_KIND.items()
                                  for x in kv])

        def refs_for(tag: str):
            return F.array_sort(F.array_distinct(F.transform(
                F.filter(
                    F.col("refs"),
                    lambda r: (r["media_ref"] != "")
                    & (tag_expr[r["kind"]] == F.lit(tag))),
                lambda r: F.struct(
                    r["media_ref"].alias("media_ref"),
                    r["ref_no_frag"].alias("ref_no_frag"),
                    r["scheme"].alias("scheme"),
                    r["host"].alias("host"),
                    r["path"].alias("path"),
                    r["dedup_key"].alias("dedup_key")))))

        per_page = processed.select(
            "url",
            refs_for("link").alias("link"), refs_for("script").alias("script"),
            refs_for("body").alias("body"), refs_for("style").alias("style"),
            refs_for("img").alias("img"), refs_for("a").alias("a"))
        pm = F.broadcast(page_meta)
        per_page = per_page.join(
            pm, per_page["url"] == pm["page_url"], "inner").drop("url")
        return self._stage_explode(per_page)

    # ------------------------------------------------------------------
    def _base_candidates(self, spans: DataFrame, page_meta: DataFrame) -> DataFrame:
        """Ranks 1-4 (link/script/body/style assets), 5 (images: body dups +
        img refs), 6 (a-links) from the span table.  Per-tag lists are
        distinct + lexicographically sorted (A2, htmlindex.go:67-89).

        Physical shape: ONE hash aggregate (conditional collect_set per tag),
        one join to page metadata, one generate (explode of a concatenated
        struct array) — no pivot, no 6-way union scan."""
        from ..operators.extract import TAG_BY_KIND

        tag_expr = F.create_map(*[F.lit(x) for kv in TAG_BY_KIND.items()
                                  for x in kv])[F.col("kind")]
        tagged = (spans.filter(F.col("media_ref") != "")
                  .withColumn("tag", tag_expr)
                  .filter(F.col("tag").isNotNull()))

        # media_ref leads the struct so array_sort orders by the full
        # reference string WITH fragment, exactly like the index's
        # sort.Strings over resolved URLs (htmlindex.go:73-77)
        ref_struct = F.struct("media_ref", "ref_no_frag", "scheme", "host",
                              "path", "dedup_key")
        empty = ("array<struct<media_ref:string,ref_no_frag:string,"
                 "scheme:string,host:string,path:string,dedup_key:string>>")

        def refs(tag: str):
            return F.coalesce(
                F.array_sort(F.collect_set(
                    F.when(F.col("tag") == tag, ref_struct))),
                F.array().cast(empty))

        per_page = (tagged.groupBy("url")
                    .agg(refs("link").alias("link"),
                         refs("script").alias("script"),
                         refs("body").alias("body"),
                         refs("style").alias("style"),
                         refs("img").alias("img"),
                         refs("a").alias("a")))

        pm = page_meta
        per_page = per_page.join(
            pm, per_page["url"] == pm["page_url"], "inner").drop("url")
        return self._stage_explode(per_page)

    @staticmethod
    def _stage_explode(per_page: DataFrame) -> DataFrame:
        """Shared tail of the two candidate builders: per-tag sorted arrays
        -> one concatenated struct array -> JVM-side explode in stage-rank
        order (CAND_SCHEMA columns)."""
        def stage(col, rank: int, is_asset: bool, stage_name: str):
            return F.transform(
                col, lambda x, i: F.struct(
                    F.lit(rank).alias("stage_rank"),
                    F.lit(0).alias("sub_rank"),
                    i.alias("intra1"),
                    F.lit(0).alias("intra2"),
                    x["ref_no_frag"].alias("url"),
                    x["scheme"].alias("scheme"),
                    x["host"].alias("host"),
                    x["path"].alias("path"),
                    F.lit(is_asset).alias("is_asset"),
                    F.lit(stage_name).alias("stage"),
                    x["dedup_key"].alias("dedup_key")))

        # Rank 5 carries ONLY the img refs, although the sequential loop also
        # re-enqueues the body-bg refs at the head of the images queue
        # (scraper/download.go:28-31): a body ref at (P, rank5) always loses
        # first-wins to the SAME key at (P, rank3) — the body stage of the
        # same page — so those rows are provably unobservable; dropping them
        # shrinks the admission shuffle.  5b/5c relative order is preserved
        # via sub_rank (0 = queued images, 1 = css-discovered).
        cands = F.concat(
            stage(F.col("link"), 1, True, "link"),
            stage(F.col("script"), 2, True, "script"),
            stage(F.col("body"), 3, True, "body"),
            stage(F.col("style"), 4, True, "style"),
            stage(F.col("img"), 5, True, "image"),
            stage(F.col("a"), 6, False, "a"))

        return (per_page
                .select("page_url", "parent_seq", "depth",
                        F.explode(cands).alias("c"))
                .select("page_url", "parent_seq",
                        F.col("c.stage_rank").alias("stage_rank"),
                        F.col("c.sub_rank").alias("sub_rank"),
                        F.col("c.intra1").alias("intra1"),
                        F.col("c.intra2").alias("intra2"),
                        F.col("c.url").alias("url"),
                        F.col("c.scheme").alias("scheme"),
                        F.col("c.host").alias("host"),
                        F.col("c.path").alias("path"),
                        F.col("c.is_asset").alias("is_asset"), F.col("depth"),
                        F.col("c.stage").alias("stage"),
                        F.col("c.dedup_key").alias("dedup_key")))

    # ------------------------------------------------------------------
    def _admission_fixpoint(self, candidates: DataFrame, seen: DataFrame,
                            page_paths_d, written: DataFrame):
        """Admission + in-epoch CSS discovery fixpoint (see module doc).

        Returns ``(inserts, survivors, assets_allowed, assets_deferred)``:
        survivors drive the seen inserts and the next frontier;
        ``assets_allowed`` are the asset survivors that pass the fileExists
        check (scraper/download.go:76-79) and are actually fetched.  CSS
        discovery runs from the ALLOWED link assets only — a link asset
        skipped because its file already exists is never fetched, so its
        url() refs are never discovered, exactly like the reference.

        Stability is detected by an order-insensitive signature of the
        allowed link-asset set (count + bit_xor of row hashes), observed
        during the assets_allowed checkpoint — no extra job and no
        driver-side materialization of the set itself."""
        cfg = self.config
        css_cands = None
        prev_sig: tuple | None = None
        for _ in range(10):
            all_cands = candidates if css_cands is None \
                else candidates.unionByName(css_cands)
            inserts, survivors = admit(all_cands, seen, self.seed_host,
                                       cfg.max_depth, cfg.includes,
                                       cfg.excludes, bloom=self.bloom)
            inserts = self._localckpt(inserts, "inserts")
            survivors = inserts.filter(F.col("survived"))
            if cfg.fetch_robots:
                # cross-host assets (and CSS-discovered refs) are gated by
                # THEIR host's robots.txt in BOTH fetch modes: each
                # newly-seen host's file is ingested once (live: concurrent
                # driver GETs; mock: one fixture filter).  The distinct
                # scan reads the just-checkpointed inserts (cheap) and the
                # collect is bounded by the crawl's distinct host count —
                # the same budget class as the per-epoch cookie harvest.
                self._ingest_host_robots(sorted(
                    (r.host, r.scheme) for r in survivors
                    .select("host", "scheme").distinct().collect()
                    if r.host and r.host not in self._robots_fetched))
            if self.robots is not None:
                from ..operators.politeness import apply_robots
                survivors = apply_robots(survivors, self.robots)
            if self.robots_rfc is not None:
                from ..operators.politeness import apply_robots_rfc
                survivors = apply_robots_rfc(survivors, self.robots_rfc)
            allowed, deferred = self._fs_admit(
                survivors.filter(F.col("is_asset")), page_paths_d.get(),
                written)
            link_surv = allowed.filter(F.col("stage_rank") == 1)
            # the signature rode the assets_allowed checkpoint's job
            # (Observation) — no extra driver action here
            m = self._fs_obs.get
            sig = (m["n_link"], m["h_link"])
            if sig[0] == 0 and css_cands is None:
                return inserts, survivors, allowed, deferred
            if prev_sig == sig:
                return inserts, survivors, allowed, deferred
            prev_sig = sig
            css_cands = self._discover_css(link_surv)
            if css_cands is None:
                return inserts, survivors, allowed, deferred
        return inserts, survivors, allowed, deferred

    # ------------------------------------------------------------------
    def _with_asset_paths(self, assets: DataFrame) -> DataFrame:
        """Output file path per admitted asset (C8) — needed BEFORE the
        fetch, because the fileExists check gates the fetch itself.
        Column-expression fast path, Python fallback for odd paths."""
        from ..functions.urlmath import attach_file_path
        return attach_file_path(assets, self.seed_host,
                                self.config.output_directory, F.lit(False))

    @staticmethod
    def _pos():
        """Consideration-order position of an asset row (comparable struct)."""
        return F.struct(*[F.col(c) for c in ORDER_COLS])

    @staticmethod
    def _page_pos():
        """A page's file write happens right before its own assets are
        considered and after every earlier page's: stage_rank -1 sorts it
        between page seq boundaries."""
        return F.struct(F.col("seq").alias("parent_seq"),
                        F.lit(-1).alias("stage_rank"),
                        F.lit(0).alias("sub_rank"),
                        F.lit(0).alias("intra1"),
                        F.lit(0).alias("intra2"))

    def _fs_admit(self, assets: DataFrame, page_paths: DataFrame,
                  written: DataFrame):
        """fileExists admission (scraper/download.go:76-79): drop admitted
        assets whose output path was already written by (a) any earlier
        epoch, (b) an ok page of this epoch stored before the asset's
        consideration point, or (c) an earlier-considered ok asset of this
        epoch.  Seen inserts are NOT affected — the reference adds the key
        in shouldURLBeDownloaded before the fileExists check.

        Mock mode resolves (c) exactly in one pass because fetch outcomes
        are a side-effect-free fixture join: an asset is fetched iff its
        position <= the first ok writer's position for its path.  Live mode
        cannot know outcomes without fetching, so it optimistically keeps
        the first-considered candidate per path and defers the rest;
        ``_fetch_assets`` re-admits deferred candidates whose predecessors
        all failed (the sequential chain, one wave per failure depth)."""
        aw = self._with_asset_paths(assets)
        if self.live or self._pages_rows() > 5_000_000:
            # checkpoint: here aw feeds several consumers (live: dup agg +
            # anti + semi; big-mock: the distinct url set + the status
            # join) — the C8 path expressions + Python fallback union would
            # otherwise recompute per consumer.  The small-mock fast path
            # below consumes aw exactly once, so it skips the checkpoint.
            aw = self._localckpt(aw, "asset_paths")
        pos = self._pos()
        page_w = page_paths.select("file_path", self._page_pos().alias("pos"))

        if not self.live:
            # Mock mode resolves the whole check in TWO hash-partition
            # passes (round 5; previously a dup-paths agg + blockers
            # anti/semi + url distinct + first-ok agg — six shuffled stages
            # per epoch):
            #  (a) one anti-join blocks paths written by earlier epochs and
            #      keeps the GROWING `written` table out of the in-epoch
            #      window below (at production scale written is bucketed by
            #      file_path so this join avoids reshuffling it);
            #  (b) one window over file_path on (this epoch's assets ∪ this
            #      epoch's ok page writes): an asset is fetched iff its
            #      consideration position <= the first ok writer's position
            #      for its path — the first ok writer itself must fetch to
            #      write, and failed attempts before it also fetch.
            #      Singleton paths (the overwhelming majority) pass through
            #      with a null/self first_ok, preserving the old
            #      collision-pre-filter fast path semantics without its
            #      extra joins.  file_path groups are near-unique, so the
            #      window has no skew.
            # size-gated broadcast: while the written-path table is small
            # its anti-join needs no exchange on either side (guide §3.1);
            # past the gate the shuffle join stands (production: bucketed)
            wr = written
            if getattr(self, "_written_rows", None) is not None \
                    and self._written_rows <= self.WRITTEN_BROADCAST_MAX:
                wr = F.broadcast(written)
            fresh = aw.join(wr, "file_path", "left_anti")
            # Page writes only matter inside window groups that contain at
            # least one asset row (the post-window filter keeps asset rows
            # only), so page_w can be pre-filtered to paths colliding with
            # an admitted asset.  Size-gated broadcast semi-join: the
            # asset-path set is re-derived from the checkpointed inserts
            # (cheap column exprs) and broadcast while the epoch is small
            # enough; beyond the gate the full union shape stands.  This
            # keeps the epoch's page-path volume (the larger side) out of
            # the window exchange+sort entirely (guide §2.3).
            if self._n_frontier <= 200_000:
                page_w = page_w.join(F.broadcast(aw.select("file_path")),
                                     "file_path", "left_semi")
                # status via the body-free slim table (broadcast join — the
                # collision logic never needs the payload bytes)
                cs = self._attach_mock_status(fresh)
            else:
                st = (self._do_fetch(fresh.select("url").distinct())
                      .select("url", "status"))
                cs = (fresh.join(st, on="url", how="left")
                      .withColumn("status", F.coalesce(F.col("status"),
                                                       F.lit("missing"))))
            rows = (cs.withColumn("_pos", pos)
                    .withColumn("_is_asset", F.lit(True))
                    .unionByName(
                        page_w.select("file_path",
                                      F.col("pos").alias("_pos"),
                                      F.lit(False).alias("_is_asset"),
                                      F.lit("ok").alias("status")),
                        allowMissingColumns=True))
            first_ok = F.min(
                F.when(F.col("status") == "ok", F.col("_pos"))
            ).over(Window.partitionBy("file_path"))
            allowed = (rows.withColumn("_first_ok", first_ok)
                       .filter(F.col("_is_asset")
                               & (F.col("_first_ok").isNull()
                                  | (F.col("_pos") <= F.col("_first_ok"))))
                       .drop("_pos", "_is_asset", "_first_ok", "status"))
            return (self._localckpt(self._observe_allowed(allowed),
                                    "assets_allowed"), None)

        # live collision pre-filter: an asset can only be fileExists-blocked
        # if its path (a) repeats within this epoch's admitted assets, (b)
        # is also written by a page this epoch, or (c) was written in an
        # earlier epoch.  Everything else is allowed outright — no chain
        # logic; blockers are a tiny distinct-path set.
        dup_paths = (aw.groupBy("file_path")
                     .agg(F.count(F.lit(1)).alias("_n"))
                     .filter(F.col("_n") > 1).select("file_path"))
        blockers = (dup_paths
                    .unionByName(page_w.select("file_path"))
                    .unionByName(written))
        clean = aw.join(blockers, "file_path", "left_anti")
        cand = aw.join(blockers, "file_path", "left_semi")

        # block on earlier epochs + earlier page writers, keep the first
        # candidate per path, defer the rest for the failure-chain loop
        pw_first = page_w.groupBy("file_path").agg(F.min("pos").alias("_pw"))
        unblocked = (cand.join(written, "file_path", "left_anti")
                     .join(pw_first, "file_path", "left")
                     .filter(F.col("_pw").isNull() | (pos < F.col("_pw")))
                     .drop("_pw"))
        first_pos = unblocked.groupBy("file_path").agg(F.min(pos).alias("_first"))
        j = unblocked.join(first_pos, "file_path", "left")
        kept = j.filter(pos == F.col("_first")).drop("_first")
        deferred = j.filter(pos != F.col("_first")).drop("_first")
        deferred = self._localckpt(deferred, "assets_deferred")
        if deferred.isEmpty():
            deferred = None
        allowed = clean.unionByName(kept)
        return (self._localckpt(self._observe_allowed(allowed),
                                "assets_allowed"), deferred)

    def _observe_allowed(self, allowed: DataFrame) -> DataFrame:
        """Attach free aggregate metrics to the assets_allowed checkpoint
        (pyspark Observation rides the checkpoint's own job): total row
        count (sizes the asset-fetch broadcast gate) and the fixpoint's
        link-asset signature — previously two extra driver jobs per epoch.
        bit_xor, not sum: the signature only needs order-insensitivity,
        and summing xxhash64 values overflows under ANSI mode."""
        from pyspark.sql import Observation

        obs = Observation()
        link = F.col("stage_rank") == 1
        out = allowed.observe(
            obs,
            F.count(F.lit(1)).alias("n_allowed"),
            F.count(F.when(link, 1)).alias("n_link"),
            F.bit_xor(F.when(link, F.xxhash64("parent_seq", "intra1",
                                              "url"))).alias("h_link"))
        self._fs_obs = obs
        return out

    def _discover_css(self, link_surv: DataFrame) -> DataFrame | None:
        """cssProcessor discovery (scraper/download.go:104-131): fetch each
        surviving link asset and emit its url() refs as image candidates.

        The reference enqueues the RAW parsed src (css/css.go:44-52 passes
        url.Parse(src), never resolved against the css file), so relative
        refs lack a scheme and are dropped by the scheme filter in admission
        WITHOUT a seen insert — only absolute http(s) url() refs are ever
        fetched.  Candidates get sub_rank 1 so they sort after the page's
        body+img image entries but before the next page's stages."""
        meta = link_surv.select("url", "page_url", "parent_seq",
                                F.col("intra1").alias("link_intra"), "depth")
        link_urls = meta.select("url").distinct()
        # broadcast gate sizing: the observed link-row count (an upper
        # bound on the distinct url set) rode the assets_allowed
        # checkpoint's job — the count() here was one extra driver job
        # per fixpoint round
        approx = None
        if not self.live:
            approx = self._fs_obs.get["n_link"] if self._fs_obs is not None \
                else link_urls.count()
        link_fetch = self._do_fetch(link_urls, approx_rows=approx)
        if self.live:
            # cache the real GETs so _fetch_assets reuses the bodies instead
            # of re-fetching every stylesheet (the reference fetches a link
            # asset once and runs the cssProcessor on that body)
            link_fetch = self._localckpt(link_fetch, "css_fetch")
            cache = link_fetch if self._live_fetch_cache is None \
                else self._live_fetch_cache.unionByName(link_fetch) \
                         .dropDuplicates(["url"])
            self._live_fetch_cache = cache
        fetched = meta.join(link_fetch.filter(F.col("status") == "ok")
                            .select("url", "body"),
                            on="url", how="inner")

        seed_host = self.seed_host

        def run(batches) -> Iterator:
            import pandas as pd
            cols = ["page_url", "parent_seq", "stage_rank", "sub_rank",
                    "intra1", "intra2", "url", "scheme", "host", "path",
                    "is_asset", "depth", "stage", "dedup_key"]
            for pdf in batches:
                rows = []
                for url, page_url, pseq, lintra, depth, body in zip(
                        pdf["url"], pdf["page_url"], pdf["parent_seq"],
                        pdf["link_intra"], pdf["depth"], pdf["body"]):
                    text = (bytes(body) if body is not None else b"") \
                        .decode("utf-8", errors="replace")
                    base = parse_url(url)
                    for k, ref in enumerate(css_extract(text, base)):
                        ru = parse_url(ref.src)  # RAW src (css/css.go:44-52)
                        if ru.scheme not in ("http", "https"):
                            # scheme-rejected BEFORE any seen insert
                            # (checks.go:27-29): observable nowhere
                            continue
                        no_frag = ref.src.split("#", 1)[0]
                        rows.append((page_url, pseq, 5, 1, int(lintra), k,
                                     no_frag, ru.scheme, ru.host, ru.path,
                                     True, int(depth), "css-image",
                                     ref_dedup_key(no_frag, ru.host, ru.path,
                                                   seed_host)))
                yield pd.DataFrame(rows, columns=cols)

        out = fetched.mapInPandas(run, schema=CAND_SCHEMA) \
                     .localCheckpoint(eager=True)
        return None if out.isEmpty() else out

    # ------------------------------------------------------------------
    def _schedule(self, assets: DataFrame) -> DataFrame:
        if self.config.politeness_delay_ms > 0 or self._host_delay_ms:
            # J5: per-host politeness schedule; a real fetcher executes each
            # host group in one applyInPandas batch honoring not_before_ms.
            # Robots Crawl-delay hosts override the global delay where
            # larger (literal-map column expr inside schedule_politeness).
            # parts engages the skew-proof grouped two-pass once the epoch's
            # asset set is wide — a same-host crawl would otherwise put the
            # WHOLE epoch into one per-host window task (the last W2-shape
            # hazard on the hot path); sized like the epoch shuffle parts.
            from ..operators.politeness import schedule_politeness
            n = self._fs_obs.get["n_allowed"] if self._fs_obs is not None \
                else 0
            default_parts = int(self.spark.conf.get(
                "spark.sql.shuffle.partitions"))
            parts = min(default_parts, n // 2000 + 1) if n else 0
            return schedule_politeness(assets,
                                       self.config.politeness_delay_ms,
                                       host_delays_ms=self._host_delay_ms,
                                       parts=parts if parts >= 4 else None)
        return assets.withColumn("not_before_ms", F.lit(0).cast("long"))

    def _asset_log_select(self, joined: DataFrame, epoch: int) -> DataFrame:
        return joined.select(
            F.col("url"), F.lit("asset").alias("kind"),
            F.col("not_before_ms"),
            F.coalesce(F.col("status"), F.lit("missing")).alias("status"),
            F.coalesce(F.col("attempts"), F.lit(1)).alias("attempts"),
            F.col("parent_seq"), F.col("stage_rank"), F.col("sub_rank"),
            F.col("intra1"), F.col("intra2"), F.col("depth"),
            F.lit(epoch).alias("epoch"), F.col("stage"),
            F.col("body"), F.col("file_path"))

    def _fetch_assets(self, allowed: DataFrame, epoch: int,
                      deferred: DataFrame | None = None) -> DataFrame:
        """Fetch the fileExists-allowed assets.  Mock mode already knows
        status/attempts (fixture join in _fs_admit) and only joins bodies.
        Live mode performs the real fetch, then re-admits deferred same-path
        candidates whose predecessors all failed, one wave per chain level —
        the exact sequential fileExists semantics."""
        if not self.live:
            # the allowed row count (an upper bound on the distinct url
            # set) sizes the broadcast gate; it was observed during the
            # assets_allowed checkpoint — no count() job
            n_allowed = self._fs_obs.get["n_allowed"] \
                if self._fs_obs is not None else allowed.count()
            # allowed urls are unique by construction: first-wins admission
            # keeps one row per dedup_key and the key is a deterministic
            # function of the url, so two rows can never share a url — the
            # old .distinct() here was a pure extra shuffle (guide §2.4:
            # "a distinct on data that is already unique")
            fetched = self._do_fetch(allowed.select("url"),
                                     approx_rows=n_allowed) \
                          .select("url", "body", "status", "attempts")
            joined = self._schedule(allowed).join(fetched, on="url", how="left")
            return self._asset_log_select(joined, epoch)

        rounds: list[DataFrame] = []
        cur = self._schedule(allowed)
        while True:
            fetched = self._do_fetch_cached(cur.select("url").distinct())
            joined = self._localckpt(
                self._asset_log_select(
                    cur.join(fetched.select("url", "body", "status",
                                            "attempts"),
                             on="url", how="left"), epoch),
                "asset_round")
            rounds.append(joined)
            if deferred is None or deferred.isEmpty():
                break
            ok_paths = joined.filter(F.col("status") == "ok") \
                             .select("file_path").distinct()
            deferred = self._localckpt(
                deferred.join(ok_paths, "file_path", "left_anti"),
                "asset_deferred")
            if deferred.isEmpty():
                break
            pos = self._pos()
            first = deferred.groupBy("file_path").agg(F.min(pos).alias("_first"))
            j = deferred.join(first, "file_path", "left")
            cur = self._schedule(j.filter(pos == F.col("_first")).drop("_first"))
            deferred = j.filter(pos != F.col("_first")).drop("_first")
        out = rounds[0]
        for r in rounds[1:]:
            out = out.unionByName(r)
        return out

    def _asset_outputs(self, asset_fetch: DataFrame, epoch: int) -> DataFrame:
        quality = self.config.image_quality
        ok = asset_fetch.filter(F.col("status") == "ok")

        def run(batches) -> Iterator:
            import pandas as pd

            from ..operators.images import recode_image_bytes
            for pdf in batches:
                bodies = []
                for body, stage in zip(pdf["body"], pdf["stage"]):
                    data = bytes(body) if body is not None else b""
                    # C19: only the images-queue stage recodes
                    # (scraper/download.go:58-63); quality 0 disables
                    if stage in ("image", "css-image") and 1 <= quality <= 99:
                        data = recode_image_bytes(data, quality)
                    bodies.append(data)
                yield pd.DataFrame({"url": pdf["url"],
                                    "file_path": pdf["file_path"],
                                    "body": bodies})

        out = ok.select("url", "file_path", "body", "stage",
                        self._pos().alias("_pos"))
        if 1 <= quality <= 99:
            # Re-join guard: `allowed` is first-wins-per-path today, so a
            # url appears at ONE consideration position per epoch — but if
            # that invariant ever relaxed, an on="url" re-join would fan
            # out.  Dedupe bodies per url (rows for one url share
            # file_path/body; stage tie-break is arbitrary) and keep the
            # MIN position (first consideration, the write that wins).
            pos_by_url = out.groupBy("url").agg(F.min("_pos").alias("_pos"))
            recoded = (out.drop("_pos").dropDuplicates(["url"])
                       .mapInPandas(run, schema="url string, "
                                                "file_path string, body binary")
                       .join(pos_by_url, on="url", how="inner"))
        else:
            recoded = out.drop("stage")
        return (recoded
                .withColumn("is_page", F.lit(False))
                .withColumn("wpos", F.struct(
                    F.lit(epoch).alias("epoch"), F.col("_pos").alias("pos")))
                .drop("_pos")
                .withColumn("epoch", F.lit(epoch)))


def _union_all(dfs: list[DataFrame], empty: DataFrame) -> DataFrame:
    out = empty
    for df in dfs:
        out = out.unionByName(df.select(*empty.columns), allowMissingColumns=False)
    return out


def crawl(spark: SparkSession, config: CrawlConfig, pages: DataFrame,
          resume: bool = False, **kwargs) -> CrawlResult:
    """Library entry point (SURVEY §3.2): the Spark equivalent of
    ``scraper.New(...)`` + ``Start``."""
    return Crawler(spark, config, pages, **kwargs).run(resume=resume)
