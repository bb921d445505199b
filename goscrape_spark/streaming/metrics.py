"""Streaming crawl metrics: watermarked windowed per-host fetch rates.

The batch engine logs every fetch (A4, ``CrawlResult.fetch_log``).  In
continuous mode the same events become a stream, and the ops question —
"what is each host's fetch rate right now, tolerating stragglers?" — is
the canonical watermark + windowed-aggregation shape:

* ``withWatermark`` bounds state: a window's aggregate finalizes once the
  event-time watermark passes its end, so per-host state is
  O(hosts x windows-in-flight), not unbounded — the property that lets
  this run forever against a 10^10-URL crawl's event stream.
* Append output emits each (window, host) row exactly once, when final —
  the shape a downstream Iceberg/metrics sink wants.
* Events later than the watermark are DROPPED, deterministically — a
  straggling executor's stale log line cannot rewrite an already-emitted
  rate.

Input schema: ``host string, ts timestamp`` (project ``fetch_log`` or any
access log onto it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_rate_stream(events: DataFrame, window_s: int = 10,
                     watermark_s: int = 30) -> DataFrame:
    """(host, ts) stream -> finalized per-host windowed fetch rates."""
    return (events
            .withWatermark("ts", f"{watermark_s} seconds")
            .groupBy(F.window("ts", f"{window_s} seconds").alias("w"),
                     "host")
            .agg(F.count(F.lit(1)).alias("fetches"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"), "host", "fetches",
                    (F.col("fetches") / F.lit(float(window_s)))
                    .alias("rate_per_sec")))
