"""goscrape_spark — a PySpark-native rebuild of cornelk/goscrape.

A distributed URL-frontier + fetch scheduler over tables of interleaved
text+media documents (span arrays), re-expressing every dataflow stage of the
reference crawler (/root/reference, cornelk/goscrape) as DataFrame operations
and vectorized Arrow/pandas UDF batches.

Not a port: the reference is a sequential single-goroutine BFS loop
(scraper/scraper.go:165-172); this package is an epoch-synchronous Spark
iteration that provably reproduces the reference's crawl order and URL-seen
set (see plans/crawl.py and plans/simulator.py).
"""

__version__ = "0.1.0"
