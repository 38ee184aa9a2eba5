"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke check);
``queries()`` / ``oracle_sql()`` expose the full operator surface from
SURVEY.md §2 — implementations live in ``cdmx_airquality_etl_spark/``
(operators register themselves into the shared registry, each next to its
DuckDB oracle SQL).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdmx_airquality_etl_spark import QUERIES
from cdmx_airquality_etl_spark.registry import resolve_oracles

SMOKE_SF_DIR = "/root/testdata/sf0.001"
# The driver compares Spark vs DuckDB at sf0.01; data-derived oracles (IVF
# centroids) must be rendered for the SAME tables the oracle will scan.
# tools/check_oracle.py overrides this when sweeping other scale factors.
ORACLE_SF_DIR = "/root/testdata/sf0.01"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_flagship_revenue"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query. Since round 8 EVERY key in
    queries() appears here (the rows-only tier is empty — see
    tests/test_registry_integrity.py). Data-derived oracles are rendered
    for $SPARK_GRAFT_ORACLE_SF_DIR (default: the driver's sf0.01
    correctness tables)."""
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", ORACLE_SF_DIR)
    return resolve_oracles(sf_dir)
