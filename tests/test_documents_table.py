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
