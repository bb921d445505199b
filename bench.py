"""Benchmark harness (driver contract).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "throughput": {...}, "scaling": {...}}

Components:
* crawl        — the flagship epoch-synchronous crawl over a deterministic
                 synthetic mock web (seed 42); headline throughput =
                 URLs (discovered + fetch-scheduled) per second.
* sf queries   — training-data + crawl-column operators over
                 $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
* scaling      — same crawl input at local[8] vs local[32]
                 (BASELINE.md sandbox scaling evidence; efficiency =
                 T8_throughput ratio scaled: eff = thr32 / (4 * thr8)).
                 Enabled by default; disable with SPARK_GRAFT_SCALING=0.

Run: python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"
CRAWL_PAGES = int(os.environ.get("SPARK_GRAFT_CRAWL_PAGES", "20000"))


def _crawl_once(spark, n_pages: int) -> dict:
    from goscrape_spark.config import CrawlConfig
    from goscrape_spark.plans.crawl import crawl
    from goscrape_spark.sources.synth import seed_url, synthetic_site

    pages = synthetic_site(spark, n_pages=n_pages, fanout=16,
                           n_assets=max(100, n_pages // 20),
                           n_ext_hosts=8).localCheckpoint(eager=True)
    t0 = time.time()
    res = crawl(spark, CrawlConfig(url=seed_url()), pages)
    n_fetches = res.fetch_log.count()
    n_seen = res.seen.count()
    # materialize the rewritten output table too — rewrite is a hot-path
    # stage (★ C4-C18) and must count toward throughput
    res.output.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    return {"sec": round(dt, 3), "fetches": n_fetches, "seen": n_seen,
            "epochs": res.epochs,
            "urls_per_sec": round((n_fetches + n_seen) / dt, 1)}


def _crawl_worker(master: str, n_pages: int, shuffle_parts: int) -> None:
    """Subprocess body: warmup crawl (JIT + worker pools), then timed run."""
    from goscrape_spark.session import get_spark

    spark = get_spark(f"bench-crawl-{master}", master=master,
                      shuffle_partitions=shuffle_parts)
    try:
        spark.sparkContext.setLogLevel("ERROR")
        _crawl_once(spark, 2000)  # warmup
        print("BENCH_RESULT " + json.dumps(_crawl_once(spark, n_pages)))
    finally:
        spark.stop()


def _crawl_run(master: str, n_pages: int, shuffle_parts: int) -> dict:
    """Run one crawl benchmark in an ISOLATED subprocess (fresh JVM) so that
    JIT warmup from a previous parallelism level cannot bias the comparison."""
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--crawl-worker",
         master, str(n_pages), str(shuffle_parts)],
        capture_output=True, text=True, timeout=3000,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            return json.loads(line[len("BENCH_RESULT "):])
    raise RuntimeError(f"crawl worker failed: {out.stderr[-2000:]}")


def _sf_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    names = ["urlnorm_dedup_key", "admission_first_wins", "seen_anti_join",
             "per_host_metrics", "exact_dedup", "token_counts", "lang_id",
             "quality_score", "fingerprint", "minhash_lsh", "simhash",
             "cosine_topk", "embedding_near_dup", "politeness_schedule",
             "retry_backoff", "media_features"]
    queries = entry_mod.queries()
    out = {}
    for name in names:
        t0 = time.time()
        df = queries[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    from goscrape_spark.session import get_spark

    t_start = time.time()
    results: dict = {"sf": SF_DIR, "unit": "sec"}

    # 1) headline crawl at full parallelism
    crawl32 = _crawl_run(f"local[{CPUS}]", CRAWL_PAGES, CPUS)

    # 2) sf queries
    spark = get_spark("bench-queries", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    try:
        qtimes = _sf_queries(spark)
    finally:
        spark.stop()

    # 3) scaling evidence: same input at 1/4 the cores
    scaling = {}
    if SCALING:
        crawl8 = _crawl_run(f"local[{max(1, CPUS // 4)}]", CRAWL_PAGES,
                            max(1, CPUS // 4))
        thr_small, thr_big = crawl8["urls_per_sec"], crawl32["urls_per_sec"]
        scaling = {
            f"local{max(1, CPUS // 4)}_urls_per_sec": thr_small,
            f"local{CPUS}_urls_per_sec": thr_big,
            "efficiency": round(thr_big / (4 * thr_small), 3),
        }

    qtimes["crawl"] = crawl32["sec"]
    results.update({
        "metric": "goscrape-spark headline suite wall time",
        "value": round(time.time() - t_start, 3),
        "queries": qtimes,
        "throughput": crawl32,
        "scaling": scaling,
    })
    print(json.dumps(results))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if len(sys.argv) > 1 and sys.argv[1] == "--crawl-worker":
        _crawl_worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    else:
        main()
