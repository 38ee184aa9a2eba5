"""Tests for the gated latent-capability seams (reference
requeriments.txt pins, never imported by scrapper.py): PDF page
extraction and rendered-page fetch. The Spark plumbing is exercised for
real via injected fakes; the gated decodes must fail loudly with
actionable errors where their libraries are absent."""

import pytest
from pyspark.sql import Row

from cdmx_airquality_etl_spark.sources.dynamic_fetch import fetch_rendered
from cdmx_airquality_etl_spark.sources.html_ingest import parse_pages
from cdmx_airquality_etl_spark.sources.pdf_extract import (
    _FAKE_PAGE_BYTES,
    _fake_pages,
    _pypdf_pages,
    extract_pdf_pages,
)


def _pdf_docs(spark):
    rows = [
        Row(doc_id=1, payload=bytes(range(256)) * 3),  # 3 fake pages
        Row(doc_id=2, payload=b"x" * 10),  # 1 fake page
        Row(doc_id=3, payload=None),  # V-NULL: no pages
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_pdf_fake_extraction_shape_and_determinism(spark):
    docs = _pdf_docs(spark)
    got = extract_pdf_pages(docs, fake=True).collect()
    per_doc: dict = {}
    for r in got:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert len(per_doc[1]) == 3 * 256 // _FAKE_PAGE_BYTES
    assert len(per_doc[2]) == 1
    assert 3 not in per_doc  # NULL payload emits nothing
    assert [r["page_no"] for r in sorted(per_doc[1], key=lambda r: r["page_no"])] == [
        0,
        1,
        2,
    ]
    again = extract_pdf_pages(docs, fake=True).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_pdf_custom_extractor_plumbs_through(spark):
    docs = _pdf_docs(spark)
    got = extract_pdf_pages(
        docs, extractor=lambda b: [f"len={len(b)}"]
    ).collect()
    texts = {r["doc_id"]: r["text"] for r in got}
    assert texts == {1: "len=768", 2: "len=10"}


def test_pdf_real_decode_is_gated():
    with pytest.raises(NotImplementedError, match="pypdf"):
        _pypdf_pages(b"%PDF-1.4 not really")


def test_fake_pages_is_pure_function():
    assert _fake_pages(b"abc") == _fake_pages(b"abc")
    assert _fake_pages(b"abc") != _fake_pages(b"abd")


def _make_fake_factory():
    """Build the fake-driver factory INSIDE a call so cloudpickle ships
    the whole closure by value — executors can't import the test module."""
    ns: dict = {}
    exec(
        "class D:\n"
        "    def get(self, url):\n"
        "        if 'boom' in url: raise RuntimeError('render failed')\n"
        "        self._html = '<html><body>rendered ' + url + '</body></html>'\n"
        "    @property\n"
        "    def page_source(self): return self._html\n"
        "    def quit(self): pass\n",
        ns,
    )
    D = ns["D"]
    return lambda: D()


def test_rendered_fetch_contract(spark):
    urls = ["http://a.example/1", "http://boom.example/2", "http://c.example/3"]
    got = {
        r["url"]: r
        for r in fetch_rendered(
            spark, urls, driver_factory=_make_fake_factory()
        ).collect()
    }
    assert set(got) == set(urls)
    ok = got["http://a.example/1"]
    assert ok["status"] == 200 and "rendered http://a.example/1" in ok["html"]
    assert ok["page_id"] is not None
    bad = got["http://boom.example/2"]
    assert bad["status"] == -1 and bad["html"] is None


def test_rendered_pages_flow_into_ingest(spark):
    """The rendered output is the static-fetch contract: parse_pages
    consumes it unchanged (schema-level interop, not a name coincidence)."""
    urls = ["http://a.example/report"]
    pages = fetch_rendered(spark, urls, driver_factory=_make_fake_factory()).select(
        "page_id", "html"
    )
    parsed = parse_pages(pages)
    assert parsed.count() >= 0  # parses without schema errors


def test_rendered_fetch_is_gated_without_selenium(spark):
    with pytest.raises(Exception) as ei:
        fetch_rendered(spark, ["http://x.example/"]).collect()
    assert "selenium" in str(ei.value)
