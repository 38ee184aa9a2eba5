"""`html_pages` — a Spark Python DataSource (Spark 4 DataSource API) that
turns a directory of HTML snapshot files into a DataFrame of
(page_id, path, mtime, html) rows.

This is the Spark-native face of the reference's extract step
(/root/reference/scrapper.py:133: one `requests.get` per scheduled run →
here, each scheduler run drops its page into a landing directory and Spark
reads the accumulated snapshots as a first-class source):

    spark.dataSource.register(HtmlPagesDataSource)
    pages = spark.read.format("html_pages").load("/landing/dir")
    facts = ingest_reports(pages)            # sources/html_ingest.py

Scale design: `partitions()` splits the file listing into
``spark.sql.files`` -style groups so a 1M-page landing zone fans out across
executors; each task reads only its own files (no driver-side content I/O —
the driver touches file *names* only). The same class also serves
`readStream` (SimpleDataSourceStreamReader) so ST-INGEST can tail the
landing directory incrementally with exactly-once offsets = a lexicographic
file-name high-water mark (requires monotonically-named snapshots).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

PAGES_SCHEMA = (
    "page_id long, path string, mtime_epoch long, html string"
)

_DEFAULT_FILES_PER_PARTITION = 64


def _list_pages(path: str, suffix: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(suffix):
                out.append(os.path.join(root, f))
    return sorted(out)  # deterministic page ordering → stable page_ids


def _page_row(fpath: str):
    with open(fpath, encoding="utf-8", errors="replace") as fh:
        html = fh.read()
    # page_id derives from the path ALONE: re-listing, replay after a sink
    # failure, and new files landing in the directory must never change an
    # already-emitted id (downstream merges key on it). 63 bits of md5 —
    # collision odds at 1M pages ≈ n²/2⁶⁴ ≈ 5e-8, vs near-certain at 32 bits.
    pid = int.from_bytes(hashlib.md5(fpath.encode()).digest()[:8], "big") >> 1
    return (pid, fpath, int(os.stat(fpath).st_mtime), html)


@dataclass
class _FilesPartition(InputPartition):
    start: int
    files: tuple


class _HtmlPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("html_pages source requires a path (.load(dir))")
        self.suffix = options.get("suffix", ".html")
        self.per_part = int(
            options.get("filesPerPartition", _DEFAULT_FILES_PER_PARTITION)
        )

    def partitions(self):
        files = _list_pages(self.path, self.suffix)
        return [
            _FilesPartition(start=i, files=tuple(files[i : i + self.per_part]))
            for i in range(0, len(files), self.per_part)
        ] or [_FilesPartition(start=0, files=())]

    def read(self, partition: _FilesPartition):
        for fpath in partition.files:
            yield _page_row(fpath)


class _HtmlPagesStreamReader(SimpleDataSourceStreamReader):
    """Incremental reader over a landing zone of monotonically-named
    snapshot files (the scheduler drops `report_<yyyymmddhh>.html`-style
    names). Offset = the lexicographic high-water mark of emitted names —
    O(1) per checkpoint commit regardless of history size (a seen-set
    offset would grow with every file ever ingested and be serialized into
    every commit). Files must sort after all previously-ingested names to
    be picked up; that monotonic-name contract is the trade for bounded
    offsets, same as every watermark."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("html_pages source requires a path")
        self.suffix = options.get("suffix", ".html")

    def initialOffset(self) -> dict:
        return {"hwm": ""}

    @staticmethod
    def _hwm_of(offset: dict) -> str:
        # migration: pre-hwm checkpoints stored the full seen-set — resume
        # from its max name instead of re-ingesting the whole landing zone
        if "hwm" in offset:
            return offset["hwm"]
        seen = offset.get("seen", [])
        return max(seen) if seen else ""

    def read(self, start: dict):
        files = _list_pages(self.path, self.suffix)
        hwm = self._hwm_of(start)
        new = [f for f in files if f > hwm]
        rows = [_page_row(f) for f in new]
        return iter(rows), {"hwm": new[-1] if new else hwm}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay emits byte-identical rows (page_id is a pure path hash);
        # a file deleted between first read and replay cannot be reproduced
        # and is skipped — an immutable landing zone is part of the source's
        # contract, as for every file-based exactly-once source
        lo, hi = self._hwm_of(start), self._hwm_of(end)
        replay = [f for f in _list_pages(self.path, self.suffix) if lo < f <= hi]
        return iter(_page_row(f) for f in replay)


class HtmlPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "html_pages"

    def schema(self) -> str:
        return PAGES_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _HtmlPagesReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return _HtmlPagesStreamReader(self.options)


def register_html_pages(spark) -> None:
    spark.dataSource.register(HtmlPagesDataSource)
