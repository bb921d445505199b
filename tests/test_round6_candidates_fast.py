"""Round-6 optimization guard: the shuffle-free candidate fast path
(Crawler._candidates_fast — per-page array ops + broadcast meta join) must
be row-identical to _base_candidates (explode + collect_set re-aggregate)
on a real synthetic site, including ref-less pages, duplicate refs, and
every stage rank."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from goscrape_spark.config import CrawlConfig
from goscrape_spark.operators.extract import process_pages_df
from goscrape_spark.plans.crawl import Crawler
from goscrape_spark.sources.synth import seed_url, synthetic_site

HOST = "bench.example.org"


def test_candidates_fast_matches_base(spark):
    pages = synthetic_site(spark, n_pages=300, fanout=4, n_assets=40,
                           n_ext_hosts=3).localCheckpoint(eager=True)
    # a ref-less page and a binary page exercise the zero-candidate shapes
    extra = spark.createDataFrame(
        [(f"https://{HOST}/plain", b"<html><p>no refs</p></html>", None, 0),
         (f"https://{HOST}/bin.png", b"\x89PNG\r\n\x1a\nxx", None, 0)],
        "url string, body binary, resp_url string, retry_after int")
    pages = pages.unionByName(extra)

    c = Crawler(spark, CrawlConfig(url=seed_url()), pages)
    page_rows = (pages.filter(F.col("url").startswith(f"https://{HOST}"))
                 .select("url", F.lit(1).alias("depth"),
                         F.row_number().over(Window.orderBy("url"))
                          .cast("long").alias("seq")))
    bodies = (page_rows.join(pages, "url")
              .select("url", "body", "seq"))
    processed = process_pages_df(bodies, HOST, "").localCheckpoint(eager=True)
    page_meta = page_rows.select(F.col("url").alias("page_url"),
                                 F.col("seq").alias("parent_seq"),
                                 F.col("depth"))

    spans = (processed.select("url", F.explode("refs").alias("r"))
             .select("url", "r.*"))
    want = c._base_candidates(spans, page_meta).collect()
    got = c._candidates_fast(processed, page_meta).collect()

    key = lambda r: (r.parent_seq, r.stage_rank, r.sub_rank, r.intra1,
                     r.intra2, r.url)
    want_s, got_s = sorted(want, key=key), sorted(got, key=key)
    assert len(got_s) == len(want_s) and len(want_s) > 0
    assert [tuple(r) for r in got_s] == [tuple(r) for r in want_s]
