"""Parquet table source for the driver test corpus.

Reads with declared schemas (schemas.py) so the scan never pays inference and
Catalyst can prune columns / push predicates into the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_SCHEMAS, TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    reader = spark.read
    schema = TESTDATA_SCHEMAS.get(name)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is TIMESTAMP(NANOS) on disk — read as long nanos
        # (spark.sql.legacy.parquet.nanosAsLong) and floor-convert to a real
        # timestamp at µs precision, matching DuckDB's ns→µs truncation.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
