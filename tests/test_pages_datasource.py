"""Tests for the `html_pages` Python DataSource (sources/pages_datasource.py):
batch read with file-group partitioning, chaining into ingest_reports, and
incremental streaming (new files only) with checkpointed offsets."""

import time

from cdmx_airquality_etl_spark.sources.html_ingest import ingest_reports
from cdmx_airquality_etl_spark.sources.pages_datasource import register_html_pages

from test_html_ingest import PAGE


def _write_pages(d, n, offset=0):
    for i in range(n):
        (d / f"report_{offset + i:03d}.html").write_text(PAGE)


def test_batch_read_and_partitioning(spark, tmp_path):
    register_html_pages(spark)
    _write_pages(tmp_path, 3)
    df = (
        spark.read.format("html_pages")
        .option("filesPerPartition", 1)
        .load(str(tmp_path))
    )
    assert df.columns == ["page_id", "path", "mtime_epoch", "html"]
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 3
    assert len({r.page_id for r in rows}) == 3
    assert all("<table>" in r.html for r in rows)


def test_datasource_chains_into_ingest(spark, tmp_path):
    register_html_pages(spark)
    _write_pages(tmp_path, 2)
    pages = spark.read.format("html_pages").load(str(tmp_path))
    res = ingest_reports(pages)
    assert res.rejects.count() == 0
    # every page yields the same 2-station grid → 2 pages × 2 stations
    assert res.cdmx.count() == 4
    assert res.cdmx.select("clave_str").distinct().count() == 2


def test_stream_reads_only_new_files(spark, tmp_path):
    register_html_pages(spark)
    land = tmp_path / "land"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    _write_pages(land, 2)

    def drain():
        q = (
            spark.readStream.format("html_pages")
            .load(str(land))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        time.sleep(0.2)

    drain()
    assert spark.read.parquet(sink).count() == 2
    _write_pages(land, 1, offset=2)
    drain()
    # second pass appends only the new file
    out = spark.read.parquet(sink)
    assert out.count() == 3
    assert out.select("path").distinct().count() == 3
