"""The BASELINE.json:input_hint table shape: (doc_id, spans array<struct>)
with exact span-sequence ordering."""

from goscrape_spark.operators.extract import documents_table
from goscrape_spark.sources.fixtures import SITE_LINKS, pages_df


def test_documents_table_schema_and_order(spark):
    docs = documents_table(pages_df(spark, SITE_LINKS))
    assert [f.name for f in docs.schema.fields] == ["doc_id", "spans"]
    span_type = docs.schema["spans"].dataType.elementType
    assert [f.name for f in span_type.fields] == ["kind", "text", "media_ref",
                                                  "offset"]
    rows = {r.doc_id: r.spans for r in docs.collect()}
    idx = rows["https://example.org/"]
    # offsets are the document-order positions, 0..n-1
    assert [s.offset for s in idx] == list(range(len(idx)))
    kinds = [s.kind for s in idx]
    assert "link" in kinds and "a" in kinds and "text" in kinds
    # the link span precedes the anchor span (head before body)
    assert kinds.index("link") < kinds.index("a")
    link = next(s for s in idx if s.kind == "link")
    assert link.media_ref == "https://example.org/style.css#fragment"
    assert link.text == "https://example.org/style.css#fragment"


def test_crawl_documents_table_stays_lazy(spark):
    """The full interleaved span table is built per epoch but must stay
    UNEXECUTED unless the caller consumes CrawlResult.documents — the
    bench/production hot path materializes fetch_log/seen/output only
    (plans/crawl.py keeps full_spans lazy)."""
    from goscrape_spark.config import CrawlConfig
    from goscrape_spark.plans.crawl import crawl
    from goscrape_spark.sources.fixtures import (
        SITE_LINKS,
        SITE_LINKS_START,
        pages_df,
    )

    sc = spark.sparkContext
    sc.setJobGroup("lazy-docs", "laziness probe", False)
    try:
        res = crawl(spark, CrawlConfig(url=SITE_LINKS_START),
                    pages_df(spark, SITE_LINKS))
        res.fetch_log.count()
        res.seen.count()
        res.output.count()
        jobs_hot_path = len(sc.statusTracker().getJobIdsForGroup("lazy-docs"))
        n_spans = res.documents.count()
        jobs_after_docs = len(
            sc.statusTracker().getJobIdsForGroup("lazy-docs"))
    finally:
        sc.setJobGroup("", "", False)
    assert n_spans > 0
    # consuming documents launches NEW work -> it was not computed by the
    # hot-path actions above
    assert jobs_after_docs > jobs_hot_path
