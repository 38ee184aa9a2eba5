"""Entity-resolution (record-linkage) operators.

The classic pipeline a catalog/CRM dedup runs: canonicalize → **block** on a
cheap key → pairwise-compare only within blocks (edit distance) → link. The
reference's normalize-then-key identity model (``scrapper.py:20-26`` +
composite PKs ``sql_config.yaml:18``) is the exact-match end of this
spectrum; q_entity_resolution is its fuzzy generalization, the same shape as
the shingle/minhash text dedups in ``dedup.py`` but over short structured
strings where edit distance is the right similarity.

Scale design (100 TB): candidate generation runs on the DISTINCT value
domain, never the row domain — ``part`` has 20k rows but only 64 distinct
names at sf0.1, and real catalogs are similarly heavy-tailed, so the
pairwise stage shrinks by orders of magnitude before any join happens. The
block key (first name token) bounds each join cell; the final support-count
join back to rows is a broadcast of the tiny linked-pair table. Levenshtein
runs JVM-side (native ``levenshtein`` expression — no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.parquet import load_table

_MAX_EDIT = 3  # link threshold: ≤3 edits between full names


@register(
    "q_entity_resolution",
    oracle=f"""
    WITH names AS (
      SELECT p_name,
             string_split(p_name, ' ')[1] AS blk,
             COUNT(*) AS n_rows,
             MIN(p_partkey) AS canon_id
      FROM part
      GROUP BY p_name
    )
    SELECT a.p_name AS name_a,
           b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist,
           a.canon_id AS canon_a,
           b.canon_id AS canon_b,
           a.n_rows AS n_rows_a,
           b.n_rows AS n_rows_b
    FROM names a
    JOIN names b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_EDIT}
    """,
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching over part names.

    Plan: (1) distinct-project with support counts — one hash aggregate that
    collapses the row domain to the value domain; (2) block on the first
    name token (a real system uses soundex/sorted-neighborhood keys — same
    plan shape); (3) within-block self-join with native ``levenshtein`` ≤
    {_MAX_EDIT} as the verify step. Edit distance is only ever computed on
    within-block candidate pairs, never all-pairs — the same
    candidate-then-verify discipline as q_dedup_minhash. Both engines'
    levenshtein is the standard unit-cost DP, so the distances (and thus the
    link set) agree exactly.
    """
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("p_partkey").alias("canon_id"),
        )
        .withColumn("blk", F.split(F.col("p_name"), " ").getItem(0))
    )
    a = names.alias("a")
    b = names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(dist <= _MAX_EDIT)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("edit_dist"),
            F.col("a.canon_id").alias("canon_a"),
            F.col("b.canon_id").alias("canon_b"),
            F.col("a.n_rows").alias("n_rows_a"),
            F.col("b.n_rows").alias("n_rows_b"),
        )
    )
