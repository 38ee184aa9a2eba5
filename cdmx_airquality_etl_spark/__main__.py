"""Command-line entry — C-MAIN as a command, not just a library.

Parity with the reference's invocation surface (scrapper.py:297-337):

    python scrapper.py [--init_db] [--config C] [--sql_config S]
    →
    python -m cdmx_airquality_etl_spark [--init-db] --config C
        (--urls FILE | --pages PARQUET) [--log-file PATH] [--lenient]

One process = one scheduled run (C-SCHED): optional warehouse bootstrap,
then fetch-or-load pages → ingest → quality gates → keyed merges. The two
reference YAMLs collapse into one PipelineConfig yaml because DDL lives in
schemas.py as StructTypes, not SQL strings.
"""

from __future__ import annotations

import argparse
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m cdmx_airquality_etl_spark",
        description="Run the air-quality ETL: fetch/load report pages, "
        "ingest, and merge the cdmx/edomex/gral_stats tables.",
    )
    p.add_argument(
        "--init-db",
        action="store_true",
        help="bootstrap the warehouse database/tables (idempotent)",
    )
    p.add_argument("--config", required=True, help="pipeline config YAML path")
    src = p.add_mutually_exclusive_group()
    src.add_argument(
        "--urls",
        help="text file with one page URL per line — fetched live (S-HTTP)",
    )
    src.add_argument(
        "--pages",
        help="parquet path of pre-landed (page_id, html) pages",
    )
    p.add_argument("--log-file", help="also log to this file (C-LOG)")
    p.add_argument(
        "--lenient",
        action="store_true",
        help="log gate failures instead of aborting the run",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    from .pipeline import PipelineAbort, PipelineConfig, bootstrap, run, setup_logging
    from .session import get_spark
    from .sources.fetch import fetch_pages

    args = build_parser().parse_args(argv)
    setup_logging(args.log_file)
    log = logging.getLogger("cdmx_airquality_etl_spark.main")

    config = PipelineConfig.from_yaml(args.config)
    spark = get_spark("cdmx-airquality-etl-run")

    if args.init_db:
        log.info("bootstrapping warehouse %s", config.warehouse_dir)
        bootstrap(spark, config)

    if not (args.urls or args.pages):
        log.info("no --urls/--pages given — bootstrap-only run, done")
        return 0

    if args.urls:
        with open(args.urls, encoding="utf-8") as f:
            urls = [line.strip() for line in f if line.strip()]
        log.info("fetching %d pages", len(urls))
        html_df = fetch_pages(spark, urls)
        # fetch failures are V-GATE input: NULL html rows become rejects
    else:
        html_df = spark.read.parquet(args.pages)

    try:
        counts = run(spark, html_df, config, strict=not args.lenient)
    except PipelineAbort as e:
        log.error("run aborted: %s", e)
        return 2
    for name, n in counts.items():
        log.info("table %s: %d rows", name, n)
    log.info("-------- END")
    return 0


if __name__ == "__main__":
    sys.exit(main())
