"""The recording harness keeps only the last ~2000 chars of bench stdout
(BENCH_r02 was captured truncated and unparseable). Guard the invariant:
the summary line bench.py prints — aggregate + HEADLINE subset + failure
list — fits the capture window even at worst-case timing widths."""

import json

import bench


def test_headline_line_fits_capture_window():
    # worst case: every headline query present with a wide timing value,
    # all failure slots used with the longest registered query names
    from cdmx_airquality_etl_spark.registry import QUERIES

    longest = sorted(QUERIES, key=len, reverse=True)
    result = {
        "metric": "total_wall_sec_all_queries",
        "value": 99999.999,
        "unit": "sec",
        "queries": {k: 99999.999 for k in bench.HEADLINE},
        "sf": 0.1,
        "n_queries": len(QUERIES),
        "n_failed": 10,
        "failed": longest[:10],
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(result, separators=(",", ":"))
    assert len(line) <= bench._MAX_LINE, (
        f"bench summary line would be {len(line)} chars; the recorder "
        f"keeps ~2000 — trim HEADLINE or the failure list"
    )


def test_headline_queries_are_registered():
    from cdmx_airquality_etl_spark.registry import QUERIES

    missing = [k for k in bench.HEADLINE if k not in QUERIES]
    assert not missing, f"HEADLINE references unregistered queries: {missing}"
