"""Offline-tree export: the crawl output materializes as browsable files."""

import os

from goscrape_spark.config import CrawlConfig
from goscrape_spark.plans.crawl import crawl
from goscrape_spark.sources.export import export_output_tree
from goscrape_spark.sources.fixtures import SITE_CSS, pages_df


def test_export_tree(spark, tmp_path):
    res = crawl(spark, CrawlConfig(url="https://example.org/"),
                pages_df(spark, SITE_CSS))
    root = str(tmp_path / "site")
    n = export_output_tree(res.output, root)
    assert n >= 4
    index = os.path.join(root, "example.org", "index.html")
    assert os.path.exists(index)
    content = open(index).read()
    assert "url('background.jpg')" in content
    assert os.path.exists(os.path.join(root, "example.org", "img", "bg.jpg"))
    assert os.path.exists(os.path.join(root, "example.org", "bg3.jpg"))
