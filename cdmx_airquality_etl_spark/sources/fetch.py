"""Live page fetch — the S-HTTP source (scrapper.py:133's
``requests.get(url, headers)``, headers from config.yaml:19-22), distributed.

Spark-first shape: the URL set is a DataFrame and the HTTP round-trips run
INSIDE mapInPandas partitions, so fetching parallelizes with the cluster
(each task fetches its partition's URLs sequentially — per-task politeness —
while tasks run in parallel across executors). The reference fetches one URL
per scheduled run; at engine scale a crawl frontier is just a bigger URL
table. stdlib ``urllib`` only (no hard third-party dependency); ``file://``
URLs work for hermetic tests.

Output is the exact input contract of ``html_ingest.parse_pages`` /
``ingest_reports``: ``(page_id long, html string)`` plus provenance columns
(url, status, fetched_ok). page_id defaults to xxhash64(url) — deterministic
across runs and engines, so re-fetches merge onto the same key.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Mapping

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_HEADERS = {"User-Agent": "Mozilla/5.0"}  # config.yaml:21-22

FETCHED_SCHEMA = StructType(
    [
        StructField("page_id", LongType(), False),
        StructField("url", StringType(), False),
        StructField("status", IntegerType(), True),
        StructField("html", StringType(), True),
    ]
)


def _fetch_batches(headers: Mapping[str, str], timeout: float):
    """Batch fetcher run inside each task. Errors never fail the job: a bad
    URL yields (status=-1, html=NULL) and flows to the caller's reject/gate
    path (V-GATE) instead of killing a 10k-URL crawl for one timeout."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.request

        for pdf in batches:
            statuses: list[int] = []
            htmls: list[str | None] = []
            for url in pdf["url"]:
                try:
                    req = urllib.request.Request(url, headers=dict(headers))
                    with urllib.request.urlopen(req, timeout=timeout) as resp:
                        htmls.append(resp.read().decode("utf-8", "replace"))
                        statuses.append(int(getattr(resp, "status", 200) or 200))
                except Exception:  # noqa: BLE001 — per-URL fault isolation
                    htmls.append(None)
                    statuses.append(-1)
            yield pd.DataFrame(
                {
                    "page_id": pdf["page_id"],
                    "url": pdf["url"],
                    "status": pd.array(statuses, dtype="int32"),
                    "html": htmls,
                }
            )

    return fn


def fetch_pages(
    spark: SparkSession,
    urls: Iterable[str] | DataFrame,
    headers: Mapping[str, str] | None = None,
    timeout: float = 30.0,
    partitions: int | None = None,
) -> DataFrame:
    """Fetch ``urls`` into a ``(page_id, url, status, html)`` frame.

    ``urls`` is either a list of URL strings (page_id := xxhash64(url)) or a
    DataFrame already carrying ``(page_id, url)`` (caller-controlled keys).
    ``partitions`` spreads the fetch — size it to (URL count / politeness
    budget per task), not to data volume; HTML lands Arrow-batched.
    """
    headers = dict(DEFAULT_HEADERS if headers is None else headers)
    if isinstance(urls, DataFrame):
        url_df = urls.select(
            F.col("page_id").cast("long").alias("page_id"),
            F.col("url").cast("string").alias("url"),
        )
    else:
        url_list = list(urls)
        url_df = spark.createDataFrame(
            [(u,) for u in url_list], "url string"
        ).select(F.xxhash64("url").alias("page_id"), "url")
        if partitions is None:
            # one URL per task up to the session's parallelism: fetch is
            # latency-bound, so idle-core packing beats batch packing
            partitions = min(len(url_list), spark.sparkContext.defaultParallelism)
    if partitions:
        url_df = url_df.repartition(partitions)
    return url_df.mapInPandas(_fetch_batches(headers, timeout), FETCHED_SCHEMA)
