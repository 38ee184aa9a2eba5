"""Rendered-page fetch seam — the reference's latent selenium capability
(selenium + webdriver-manager pinned in
/root/reference/requeriments.txt but never imported by scrapper.py),
given the same gated-decode contract as the PDF seam: distribution,
schema and page-id derivation are the REAL plumbing shared with the
static fetcher (sources/fetch.py FETCHED_SCHEMA — downstream ingest
cannot tell the two apart), while the browser itself is gated: a
``driver_factory`` builds one driver per task (selenium's
per-process/driver model), defaulting to a headless-Chrome factory that
raises NotImplementedError where selenium isn't installed; tests inject
a fake factory.

Scale notes: one driver per TASK, urls within a partition rendered
sequentially through it (politeness + driver reuse), partitions in
parallel across executors — a render farm is just a bigger URL table and
more executors. Driver teardown is in a finally so a mid-partition
failure can't leak browser processes.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fetch import FETCHED_SCHEMA


def _selenium_factory():  # pragma: no cover - env-gated
    try:
        from selenium import webdriver  # type: ignore[import-not-found]
    except ImportError as e:
        raise NotImplementedError(
            "rendered fetching requires the selenium package, not present "
            "in this environment; pass a driver_factory (tests inject a "
            "fake) or install selenium + a headless browser on executors"
        ) from e
    opts = webdriver.ChromeOptions()
    opts.add_argument("--headless=new")
    return webdriver.Chrome(options=opts)


def fetch_rendered(
    spark: SparkSession,
    urls: list[str] | DataFrame,
    *,
    driver_factory: Callable[[], object] | None = None,
) -> DataFrame:
    """Render each URL in a browser and return the static-fetch contract
    (page_id, url, status, html): page_id = xxhash64(url) so re-renders
    merge onto the same key, status 200 on success and -1 with NULL html
    on per-URL failure (errors gate, never kill the crawl)."""
    factory = driver_factory or _selenium_factory
    if isinstance(urls, DataFrame):
        url_df = urls.select("url")
    else:
        url_df = spark.createDataFrame([(u,) for u in urls], "url string")

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        driver = None
        try:
            for pdf in batches:
                if driver is None and len(pdf):
                    driver = factory()
                statuses: list[int] = []
                htmls: list[str | None] = []
                for url in pdf["url"]:
                    try:
                        driver.get(url)  # type: ignore[union-attr]
                        htmls.append(driver.page_source)  # type: ignore[union-attr]
                        statuses.append(200)
                    except Exception:  # noqa: BLE001 - per-URL isolation
                        htmls.append(None)
                        statuses.append(-1)
                yield pd.DataFrame(
                    {"url": pdf["url"], "status": statuses, "html": htmls}
                )
        finally:
            if driver is not None:
                quit_fn = getattr(driver, "quit", None)
                if callable(quit_fn):
                    quit_fn()

    rendered = url_df.mapInPandas(
        _render, schema="url string, status int, html string"
    )
    return rendered.select(
        F.xxhash64("url").alias("page_id"), "url", "status", "html"
    ).select([f.name for f in FETCHED_SCHEMA.fields])
