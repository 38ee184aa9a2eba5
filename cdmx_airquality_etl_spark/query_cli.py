"""Registry query runner — the ops CLI for the analytics surface.

    python -m cdmx_airquality_etl_spark.query_cli q_group_agg \
        [--sf-dir DIR] [--out PATH] [--show N] [--explain] [--list]

Runs any registered query against a parquet table directory and either
writes the result (parquet, full parallel write — the production path),
shows the first N rows, or prints the physical plan (the .explain
"formatted" view PLANS.md is generated from). `--list` enumerates the
registry with each query's first docstring line.

This is the third invocation surface next to the reference-parity ETL
command (__main__.py) and the driver contract (__spark_entry__.py): the
one an operator uses to run a single analytics query on a cluster.
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m cdmx_airquality_etl_spark.query_cli",
        description="Run one registered analytics query over a parquet "
        "table directory.",
    )
    p.add_argument("query", nargs="?", help="registered query name (q_*)")
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="directory holding the parquet tables",
    )
    p.add_argument("--out", help="write the result as parquet to this path")
    p.add_argument(
        "--show", type=int, default=20, help="rows to print when not writing"
    )
    p.add_argument(
        "--explain", action="store_true", help="print the formatted physical plan"
    )
    p.add_argument(
        "--list", action="store_true", help="list registered queries and exit"
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from .registry import QUERIES

    if args.list:
        for name in sorted(QUERIES):
            doc = (QUERIES[name].__doc__ or "").strip().splitlines()
            print(f"{name}\t{doc[0] if doc else ''}")
        return 0
    if not args.query:
        print("error: query name required (or --list)", file=sys.stderr)
        return 2
    if args.query not in QUERIES:
        print(
            f"error: unknown query {args.query!r} — see --list", file=sys.stderr
        )
        return 2

    from .session import get_spark

    spark = get_spark(f"query-cli:{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
        return 0
    df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
