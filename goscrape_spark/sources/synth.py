"""Deterministic synthetic mock-web generator (bench + scale tests).

Generates the ``pages`` fixture table entirely with Spark column expressions
(no Python in the loop, no RNG — pure arithmetic on ``spark.range``), so the
10^6-10^7-row bench inputs are built at cluster speed and are bit-identical
for any seed.

Shape (FIXTURES.md §6): a k-ary-tree site on one host — page i links to
children k*i+1 .. k*i+k (each page discovered exactly once; BFS depth =
log_k N), plus per-page <img> asset refs drawn from a skewed asset pool
(Zipf-ish via a power transform of a 64-bit hash) across ``n_ext_hosts``
external asset hosts — the host-skew stressor for the admission shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthetic_site(spark: SparkSession, n_pages: int, fanout: int = 8,
                   n_assets: int = 1000, n_ext_hosts: int = 10,
                   host: str = "bench.example.org", seed: int = 42,
                   skew: float = 3.0, filler_repeat: int = 40) -> DataFrame:
    """Return a ``pages`` DataFrame (url, body, resp_url, retry_after).

    ``filler_repeat`` sizes the per-page text body (~38 bytes per repeat):
    40 ~= 1.5 KB (fast tests), 160+ approximates real page weight where
    extract/rewrite CPU dominates per-page cost."""
    pages = spark.range(n_pages).withColumnRenamed("id", "i")

    first_child = F.col("i") * fanout + 1
    last_child = F.least(F.col("i") * fanout + fanout, F.lit(n_pages - 1))
    children = F.when(first_child <= last_child,
                      F.sequence(first_child, last_child)) \
                .otherwise(F.array().cast("array<bigint>"))
    links = F.array_join(F.transform(
        children,
        lambda c: F.concat(F.lit('<a href="/p/'), c.cast("string"),
                           F.lit('">l</a>'))), "\n")

    # skewed asset id + skewed external host (u^skew concentrates near 0)
    u = ((F.xxhash64(F.col("i"), F.lit(seed)) % 100000 + 100000) % 100000) / 100000.0
    asset_id = F.floor(F.pow(u, F.lit(skew)) * F.lit(n_assets)).cast("long")
    u2 = ((F.xxhash64(F.col("i"), F.lit(seed + 1)) % 100000 + 100000) % 100000) / 100000.0
    ext_host = F.floor(F.pow(u2, F.lit(skew)) * F.lit(n_ext_hosts)).cast("long")

    img = F.concat(
        F.lit('<img src="https://a'), ext_host.cast("string"),
        F.lit(".assets.example.com/img/"), asset_id.cast("string"),
        F.lit('.png" srcset="/img/s'), asset_id.cast("string"),
        F.lit('-480.png 480w, /img/s'), asset_id.cast("string"),
        F.lit('-800.png 800w">'))

    style = F.concat(
        F.lit("<style>h1 { background: url('/img/bg"),
        (F.col("i") % 17).cast("string"),
        F.lit(".png'); } .x { background: url(/img/tile"),
        (F.col("i") % 11).cast("string"), F.lit(".png); }</style>"))

    # deterministic filler text: realistic extract/rewrite CPU load
    filler = F.repeat(
        F.concat(F.lit("lorem"), (F.col("i") % 97).cast("string"),
                 F.lit(" ipsum dolor sit amet consectetur ")), filler_repeat)

    body = F.concat(
        F.lit("<html><head><title>p"), F.col("i").cast("string"),
        F.lit("</title>\n"), style,
        F.lit('</head>\n<body background="/img/body-bg.png">\n<p>'),
        filler, F.lit("</p>\n"), img, F.lit("\n"), links,
        F.lit("\n</body></html>"))

    page_rows = pages.select(
        F.when(F.col("i") == 0, F.lit(f"https://{host}/"))
         .otherwise(F.concat(F.lit(f"https://{host}/p/"),
                             F.col("i").cast("string"))).alias("url"),
        F.encode(body, "utf-8").alias("body"),
        F.lit(None).cast("string").alias("resp_url"),
        F.lit(0).alias("retry_after"))

    asset_rows = (
        spark.range(n_assets).crossJoin(
            spark.range(n_ext_hosts).withColumnRenamed("id", "h"))
        .select(
            F.concat(F.lit("https://a"), F.col("h").cast("string"),
                     F.lit(".assets.example.com/img/"),
                     F.col("id").cast("string"), F.lit(".png")).alias("url"),
            F.encode(F.lit("\x89PNGfake"), "utf-8").alias("body"),
            F.lit(None).cast("string").alias("resp_url"),
            F.lit(0).alias("retry_after")))

    return page_rows.unionByName(asset_rows)


def seed_url(host: str = "bench.example.org") -> str:
    return f"https://{host}/"
