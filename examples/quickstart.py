"""Quickstart: the engine's public API in one runnable script.

Covers the three ways the reference was used (SURVEY.md §3):
EP1 scheduled ETL  → pipeline.run over HTML snapshots
EP2 bootstrap      → pipeline.bootstrap
EP3 library use    → lazy DataFrames from the query registry

Run: python examples/quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import Row

from cdmx_airquality_etl_spark import QUERIES
from cdmx_airquality_etl_spark.pipeline import PipelineConfig, bootstrap, run
from cdmx_airquality_etl_spark.plans.maintenance import compact, table_stats
from cdmx_airquality_etl_spark.session import get_spark
from cdmx_airquality_etl_spark.sources.pages_datasource import register_html_pages

SNAPSHOT = """
<html><body>
  <div id="textohora">9 h, lunes 3 de marzo de 2025</div>
  <div id="textotemperatura">18 &deg;C</div>
  <div id="recomendacioniuv">Usa bloqueador</div>
  <div id="pronosticoaire"><table><tr><td>Buena</td><td>Regular</td></tr></table></div>
  <div id="tabladf"><table>
    <tr><td>deco</td></tr>
    <tr><td>Clave</td><td>Alcald&iacute;a</td><td>Calidad del aire</td><td>Par&aacute;metro</td></tr>
    <tr><td>UIZ</td><td>Iztapalapa</td><td><img src="x/buena.svg"/></td><td>Ozono</td></tr>
  </table></div>
  <div id="tablaedomex"><table>
    <tr><td>deco</td></tr>
    <tr><td>Clave</td><td>Municipio</td><td>Calidad del aire</td><td>Par&aacute;metro</td></tr>
    <tr><td>ACO</td><td>Ecatepec</td><td><img src="x/buena.svg"/></td><td>PM10</td></tr>
  </table></div>
</body></html>
"""


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    # --- EP3: library / analytics use — lazy DataFrames ------------------
    revenue = QUERIES["q_flagship_revenue"](spark, sf_dir)
    print("flagship (revenue per region-year), top 5:")
    revenue.show(5, truncate=False)

    top_dups = QUERIES["q_dedup_fuzzy"](spark, sf_dir)
    print(f"near-duplicate doc pairs (3-shingle Jaccard): {top_dups.count()}")

    # --- EP1+EP2: scheduled ingest into a keyed, merged history ----------
    with tempfile.TemporaryDirectory() as tmp:
        cfg = PipelineConfig(warehouse_dir=f"{tmp}/wh")
        bootstrap(spark, cfg)
        pages = spark.createDataFrame([Row(page_id=1, html=SNAPSHOT)])
        counts = run(spark, pages, cfg)   # ingest → V-GATE → 3-table merge
        counts = run(spark, pages, cfg)   # re-scrape: same keys, nupdates+1
        print(f"merged table row counts after 2 runs: {counts}")
        cdmx = spark.read.parquet(cfg.table_path("cdmx"))
        cdmx.select("report_ts", "clave_str", "calidad_del_aire_str", "nupdates").show()

        # maintenance pass (no-op here; the API a scheduler would call)
        stats = compact(spark, cfg.table_path("cdmx"))
        print(f"compaction: {stats['before']['n_files']} files "
              f"-> {table_stats(spark, cfg.table_path('cdmx'))['n_files']}")

    # --- custom DataSource: a landing directory of HTML files ------------
    register_html_pages(spark)
    with tempfile.TemporaryDirectory() as land:
        with open(f"{land}/snap.html", "w") as fh:
            fh.write(SNAPSHOT)
        n = spark.read.format("html_pages").load(land).count()
        print(f"html_pages DataSource read {n} page(s)")

    # --- S-HTTP: live fetch (file:// here; http(s) in production) --------
    # Same shape as the reference's requests.get entry (scrapper.py:133),
    # distributed: fetch_pages(spark, urls) -> (page_id, url, status, html).
    # The equivalent command-line run is:
    #   python -m cdmx_airquality_etl_spark --init-db --config pipeline.yaml \
    #       --urls urls.txt --log-file etl_log.log
    from pathlib import Path

    from cdmx_airquality_etl_spark.sources.fetch import fetch_pages

    with tempfile.TemporaryDirectory() as land:
        page_path = Path(land) / "report.html"
        page_path.write_text(SNAPSHOT, encoding="utf-8")
        fetched = fetch_pages(spark, [page_path.as_uri()])
        print(f"fetched {fetched.count()} page(s) via file:// URL")


if __name__ == "__main__":
    main(*sys.argv[1:2])
