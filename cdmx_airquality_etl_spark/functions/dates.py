"""Date/report-key functions.

Generalizes the reference's packed report key (``report_ts = yyyyMMddHH`` built
by string concat at /root/reference/scrapper.py:51, cast at :114) and its
denormalized date-part columns (scrapper.py:154-165 / sql_config.yaml:12-17).

All native expressions — arithmetic pack instead of string concat so the plan
stays integer-only and codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pack_report_ts(ts: Column) -> Column:
    """timestamp → packed yyyyMMddHH as LONG (scrapper.py:51 semantics;
    LongType because 10 digits overflows Int32 — SURVEY.md §1.2)."""
    return (
        F.year(ts).cast("long") * 1000000
        + F.month(ts).cast("long") * 10000
        + F.dayofmonth(ts).cast("long") * 100
        + F.hour(ts).cast("long")
    )


def unpack_report_ts(report_ts: Column) -> dict[str, Column]:
    """packed yyyyMMddHH → part columns (inverse of pack_report_ts)."""
    return {
        "year_num": (report_ts / 1000000).cast("int"),
        "month_num": ((report_ts % 1000000) / 10000).cast("int"),
        "month_day_num": ((report_ts % 10000) / 100).cast("int"),
        "hour_num": (report_ts % 100).cast("int"),
    }


def date_part_columns(ts: Column) -> dict[str, Column]:
    """The reference's denormalized date dimension (sql_config.yaml:12-17),
    derived natively from a timestamp. week_day uses English day names
    (date_format 'EEEE'); the Spanish names of the reference are a locale
    decode layered on top via the month/day dimension maps."""
    return {
        "year_num": F.year(ts),
        "month_num": F.month(ts),
        "month_day_num": F.dayofmonth(ts),
        "hour_num": F.hour(ts),
        "week_day_str": F.date_format(ts, "EEEE"),
    }
