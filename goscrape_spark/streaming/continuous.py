"""Continuous-crawl mode: Structured Streaming over arriving seed URLs.

The reference crawl TERMINATES when its queue drains (scraper/scraper.go:165)
— there is no streaming operator in goscrape, and the epoch loop is batch-
iterative by design (SURVEY §2.10).  This module is the thin v1 wrapper that
turns the batch crawler into a long-running service: a ``readStream`` of seed
URLs (one per line, file source) drives ``foreachBatch``; each micro-batch
runs the epoch-synchronous crawler for its seeds, carrying the seen table
across batches so re-submitted seeds and already-crawled URLs are skipped.

Semantics per seed are identical to the batch crawl (same admission, dedup,
ordering); cross-batch state is exactly the seen table union — the same
resume contract as sources/storage.CrawlCheckpoint.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..plans.crawl import Crawler


@dataclass
class ContinuousCrawl:
    spark: SparkSession
    pages: DataFrame                 # mock web (or swap in the HTTP fetcher)
    base_config: CrawlConfig
    results: list = field(default_factory=list)
    seen_keys: DataFrame | None = None

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        seeds = [r.value.strip() for r in batch_df.collect()
                 if r.value and r.value.strip()]
        for seed in seeds:
            cfg = CrawlConfig(**{**self.base_config.__dict__, "url": seed})
            crawler = Crawler(self.spark, cfg, self.pages)
            try:
                res = crawler.run()
            except ValueError:
                continue  # seed itself inadmissible
            self.results.append((batch_id, seed, res))
            delta = res.seen.select("dedup_key")
            self.seen_keys = delta if self.seen_keys is None \
                else self.seen_keys.unionByName(delta).distinct() \
                    .localCheckpoint(eager=True)

    def start(self, seed_dir: str, checkpoint_dir: str):
        """Stream seed files (one URL per line) from ``seed_dir``."""
        stream = (self.spark.readStream.format("text")
                  .option("maxFilesPerTrigger", 1)
                  .load(seed_dir))
        return (stream.writeStream
                .foreachBatch(self.process_batch)
                .option("checkpointLocation", checkpoint_dir)
                .outputMode("append")
                .start())
