"""E2E for the S-HTTP source and the CLI entry (reference parity:
scrapper.py:133 fetch + :297-337 main): fixture pages served as file://
URLs → fetch_pages → full pipeline run → merged warehouse tables, plus the
failed-fetch → V-GATE reject path and the `python -m` argument surface."""

import logging

from cdmx_airquality_etl_spark.__main__ import build_parser, main
from cdmx_airquality_etl_spark.pipeline import PipelineConfig, run, setup_logging
from cdmx_airquality_etl_spark.sources.fetch import fetch_pages

from test_html_ingest import PAGE


def _write_page(tmp_path, name, content=PAGE):
    p = tmp_path / name
    p.write_text(content, encoding="utf-8")
    return p.as_uri()


def test_fetch_pages_file_urls(spark, tmp_path):
    urls = [_write_page(tmp_path, f"page{i}.html") for i in range(3)]
    fetched = fetch_pages(spark, urls)
    rows = fetched.collect()
    assert len(rows) == 3
    assert all(r.html and "tabladf" in r.html for r in rows)
    assert len({r.page_id for r in rows}) == 3  # xxhash64(url) keys distinct
    # deterministic keys: re-fetch assigns the same page_ids
    again = {r.url: r.page_id for r in fetch_pages(spark, urls).collect()}
    assert again == {r.url: r.page_id for r in rows}


def test_fetch_failure_is_isolated(spark, tmp_path):
    ok = _write_page(tmp_path, "ok.html")
    bad = (tmp_path / "missing.html").as_uri()
    rows = {r.url: r for r in fetch_pages(spark, [ok, bad]).collect()}
    assert rows[ok].html is not None
    assert rows[bad].html is None and rows[bad].status == -1


def test_fetch_to_pipeline_e2e(spark, tmp_path):
    url = _write_page(tmp_path, "report.html")
    html_df = fetch_pages(spark, [url]).select("page_id", "html")
    config = PipelineConfig(warehouse_dir=str(tmp_path / "wh"))
    counts = run(spark, html_df, config)
    assert counts == {"cdmx": 2, "edomex": 1, "gral_stats": 1}
    gral = spark.read.parquet(config.table_path("gral_stats")).collect()
    assert gral[0]["report_ts"] == 2025052314


def test_cli_main_e2e(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "4")
    url = _write_page(tmp_path, "report.html")
    urls_file = tmp_path / "urls.txt"
    urls_file.write_text(url + "\n", encoding="utf-8")
    cfg = tmp_path / "pipeline.yaml"
    cfg.write_text(f"warehouse_dir: {tmp_path / 'wh'}\n", encoding="utf-8")
    log_file = tmp_path / "etl_log.log"

    rc = main(
        [
            "--init-db",
            "--config",
            str(cfg),
            "--urls",
            str(urls_file),
            "--log-file",
            str(log_file),
        ]
    )
    assert rc == 0
    cdmx = spark.read.parquet(f"{tmp_path}/wh/airquality/cdmx")
    assert cdmx.count() == 2
    # C-LOG parity: run log teed to the configured file (scrapper.py:307-314)
    assert "END" in log_file.read_text(encoding="utf-8")
    # reset root logging so later tests aren't teed into tmp_path
    setup_logging(None, level=logging.WARNING)


def test_cli_failed_fetch_aborts(tmp_path):
    bad = (tmp_path / "missing.html").as_uri()
    urls_file = tmp_path / "urls.txt"
    urls_file.write_text(bad + "\n", encoding="utf-8")
    cfg = tmp_path / "pipeline.yaml"
    cfg.write_text(f"warehouse_dir: {tmp_path / 'wh'}\n", encoding="utf-8")
    rc = main(["--config", str(cfg), "--urls", str(urls_file)])
    assert rc == 2  # V-GATE abort, nothing written
    assert not (tmp_path / "wh" / "airquality" / "cdmx").exists()
    setup_logging(None, level=logging.WARNING)


def test_parser_surface():
    p = build_parser()
    args = p.parse_args(["--init-db", "--config", "c.yaml", "--pages", "p.parquet"])
    assert args.init_db and args.pages == "p.parquet" and args.urls is None
