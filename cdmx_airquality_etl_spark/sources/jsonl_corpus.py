"""JSONL corpus source with corrupt-record quarantine.

The dominant interchange format for LLM training corpora is
newline-delimited JSON, and real dumps carry damage: truncated lines,
stray non-JSON text, records whose fields hold the wrong type. A 100 TB
ingest cannot crash on them (one bad byte aborting a 1000-executor read)
and must not drop them silently either (auditability). This source reads
JSONL with an explicit declared schema — never inference, which at scale
means an extra full pass and a schema that drifts with the sample — in
PERMISSIVE mode, routing undecodable lines to a quarantine frame via the
standard ``columnNameOfCorruptRecord`` channel.

Lineage: generalizes the reference's malformed-row discipline (F-ROWFILT,
scrapper.py:150-168 — rows whose cell count disagrees with the header are
logged and skipped, never fatal) from HTML tables to JSONL, and V-GATE's
"count the damage before trusting the batch" stance (scrapper.py:177-195).

Scale notes: the JSON line reader splits by newline, so the scan
parallelizes like any text source; the quarantine split is ONE cached
scan feeding two filters (predicate on the corrupt column), not two
reads; type mismatches under PERMISSIVE surface as per-field NULLs, which
the quality gate (quality.py) counts downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT_COL = "_corrupt_record"


def corpus_schema_with_corrupt(schema: StructType) -> StructType:
    """The declared schema plus the corrupt-record channel column (Spark
    requires it present in the read schema to populate it)."""
    if _CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(
        list(schema.fields) + [StructField(_CORRUPT_COL, StringType(), True)]
    )


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) split of a JSONL directory/file.

    ``good``: rows parsed against the declared schema, corrupt channel
    dropped. ``quarantine``: one row per undecodable line, carrying the
    raw line text for forensics. PERMISSIVE is deliberate — FAILFAST
    aborts the job on the first bad byte and DROPMALFORMED erases the
    evidence; the quarantine IS the dropped-malformed set, kept."""
    raw = (
        spark.read.schema(corpus_schema_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT_COL)
        .json(path)
    )
    # one scan, two consumers: without the cache each filter re-reads the
    # source; with it the split costs one pass (unpersisted by the caller
    # or session end — the frames are small relative to the corpus only
    # in the quarantine case, so this cache is the BATCH pattern; a
    # streaming ingest would foreachBatch the same predicate split)
    raw = raw.cache()
    good = raw.filter(F.col(_CORRUPT_COL).isNull()).drop(_CORRUPT_COL)
    quarantine = raw.filter(F.col(_CORRUPT_COL).isNotNull()).select(
        F.col(_CORRUPT_COL).alias("raw_line")
    )
    return good, quarantine


def quarantine_report(good: DataFrame, quarantine: DataFrame) -> DataFrame:
    """One-row ingest audit: row counts and the quarantine ratio — the
    V-GATE number a scheduled ingest checks before merging the batch."""
    g = good.agg(F.count(F.lit(1)).alias("n_good"))
    q = quarantine.agg(F.count(F.lit(1)).alias("n_quarantined"))
    return g.crossJoin(q).select(
        "n_good",
        "n_quarantined",
        (
            F.col("n_quarantined").cast("double")
            / (F.col("n_good") + F.col("n_quarantined")).cast("double")
        ).alias("quarantine_ratio"),
    )
