"""Query-runner CLI tests: list/run/write/explain paths and the
unknown-query exit code, driven in-process (one shared SparkSession)."""

from cdmx_airquality_etl_spark.query_cli import build_parser, main
from cdmx_airquality_etl_spark.registry import QUERIES


def test_list_mode(capsys):
    assert main(["--list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == len(QUERIES)
    assert all(line.startswith("q_") for line in out)


def test_unknown_query_exits_2(capsys):
    assert main(["q_definitely_not_registered"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_missing_query_exits_2(capsys):
    assert main([]) == 2


def test_write_and_reread(spark, sf_dir, tmp_path):
    out = str(tmp_path / "res")
    assert main(["q_group_agg", "--sf-dir", sf_dir, "--out", out]) == 0
    got = spark.read.parquet(out)
    want = QUERIES["q_group_agg"](spark, sf_dir)
    assert sorted(got.columns) == sorted(want.columns)
    assert got.count() == want.count()


def test_explain_mode(capsys, spark, sf_dir):
    assert main(["q_scan_project", "--sf-dir", sf_dir, "--explain"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out


def test_parser_defaults():
    args = build_parser().parse_args(["q_x"])
    assert args.show == 20 and not args.explain and not args.list
