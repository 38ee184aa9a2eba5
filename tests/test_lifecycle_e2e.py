"""Capstone lifecycle test: the whole system as one story.

landing dir of hourly HTML snapshots
  → html_pages DataSource (partitioned batch read)
  → pipeline.run per snapshot batch (ingest → V-GATE → 3-table keyed merge)
  → table maintenance: compact the accumulated fact table
  → incremental rollup refresh per batch == recompute from final table

This is the reference's scheduled loop (launcher.bat → scrapper.py →
SQLite upsert) re-expressed end to end on the engine, plus the maintenance
passes a parquet lake needs that SQLite never did.
"""

from pyspark.sql import functions as F

from cdmx_airquality_etl_spark.pipeline import PipelineConfig, run
from cdmx_airquality_etl_spark.plans.maintenance import compact, table_stats
from cdmx_airquality_etl_spark.plans.rollup import batch_partials, refresh_rollup
from cdmx_airquality_etl_spark.sources.pages_datasource import register_html_pages
from tests.test_html_ingest import PAGE


def _snapshot(hour: int) -> str:
    return PAGE.replace("14 h,", f"{hour} h,")


def test_full_lifecycle(spark, tmp_path):
    register_html_pages(spark)
    cfg = PipelineConfig(warehouse_dir=str(tmp_path / "wh"))
    land = tmp_path / "landing"
    land.mkdir()

    # three scheduled runs: hours 14, 15, then a 15 re-scrape
    for i, hour in enumerate([14, 15, 15]):
        (land / f"snap_{i}.html").write_text(_snapshot(hour))
        pages = spark.read.format("html_pages").load(str(land)).filter(
            F.col("path").endswith(f"snap_{i}.html")
        )
        run(spark, pages, cfg)

    cdmx_path = cfg.table_path("cdmx")
    cdmx = spark.read.parquet(cdmx_path)
    # 2 stations × 2 report hours; the re-scraped hour bumped its counter
    assert cdmx.count() == 4
    bumps = {
        (r["report_ts"] % 100, r["nupdates"]) for r in cdmx.collect()
    }
    assert bumps == {(14, 1), (15, 2)}

    # maintenance: fragment the table (as months of small merge outputs
    # would), then compact back to one file with data unchanged
    before_rows = sorted(tuple(r) for r in cdmx.collect())
    fragmented = spark.read.parquet(cdmx_path).repartition(8)
    fragmented.write.mode("overwrite").parquet(str(tmp_path / "frag"))
    import shutil

    shutil.rmtree(cdmx_path)
    shutil.move(str(tmp_path / "frag"), cdmx_path)
    assert table_stats(spark, cdmx_path)["n_files"] > 1
    res = compact(spark, cdmx_path, target_file_bytes=1 << 30)
    assert res["rewritten"] and res["after"]["n_files"] == 1
    assert sorted(tuple(r) for r in spark.read.parquet(cdmx_path).collect()) == before_rows

    # incremental rollup per hour-batch equals recompute over the final table
    rollup_path = str(tmp_path / "rollup")
    final = spark.read.parquet(cdmx_path)
    spec = {"nupdates": ["sum", "max"]}
    for hour in [14, 15]:
        batch = final.filter(F.col("hour_num") == hour)
        rolled = refresh_rollup(spark, batch, rollup_path, ["calidad_del_aire_str"], spec)
    scratch = batch_partials(final, ["calidad_del_aire_str"], spec)
    assert sorted(tuple(r) for r in rolled.collect()) == sorted(
        tuple(r) for r in scratch.collect()
    )
