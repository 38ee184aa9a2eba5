"""Dedup clustering: connected components over near-duplicate pairs.

Pairwise near-dup detection (q_dedup_fuzzy / q_dedup_embedding) yields edges;
an LLM-data pipeline then needs *clusters* — each group of transitively-linked
documents keeps one representative and drops the rest. That closure is an
iterative algorithm no single SQL pass expresses: min-label propagation, the
standard Spark formulation of connected components (each round, every node
takes the min label in its neighborhood; fixpoint in O(component diameter)
rounds).

Scale design: each round is one shuffle join edges⋈labels + a min-aggregate —
all set-based, no driver-side graph. ``localCheckpoint`` after every round
cuts the lineage chain (without it the plan doubles each iteration and
Catalyst analysis itself becomes the bottleneck); convergence is detected
with a count action per round, which is also what bounds the loop. For
web-scale graphs the same loop holds (it is GraphX/GraphFrames' CC algorithm
re-expressed on DataFrames); hub-heavy graphs would add the large-star/
small-star optimization.

The DuckDB oracle runs the same closure as a recursive CTE (UNION-dedup
guarantees termination on cycles) — exact agreement, so this "iterative,
non-SQL" operator still gets a full value-hash check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .similarity import _LSH_BITS_SQL, _NEAR_DUP_COS, _SIGN_BUCKET_SQL, _sql_cos


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25
) -> DataFrame:
    """(src, dst) undirected edges → (node, label) with label = min node id
    reachable; nodes appearing in no edge are absent (callers union them back
    if isolated nodes matter)."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(F.col("a").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(nbr_min)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"({changed} labels still moving) — raise max_iter (components with "
        "diameter > max_iter exist) rather than use a partial clustering"
    )


@register(
    "q_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
    nb AS (SELECT {_LSH_BITS_SQL} AS bits FROM embeddings),
    e AS (
      SELECT vec_id, embedding, {_SIGN_BUCKET_SQL} AS bucket
      FROM embeddings, nb
    ),
    p AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE {_sql_cos('a.embedding', 'b.embedding')} >= {_NEAR_DUP_COS}
    ),
    edges AS (SELECT va AS a, vb AS b FROM p UNION SELECT vb, va FROM p),
    reach(node, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT edges.a, reach.r FROM edges JOIN reach ON edges.b = reach.node
    )
    SELECT node AS vec_id, MIN(r) AS cluster_id,
           (MIN(r) = node) AS is_representative
    FROM reach GROUP BY node
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (sign-LSH blocked cosine, as q_dedup_embedding) →
    transitive clusters → keep-one-per-cluster flag. The end-to-end dedup
    decision a training-data pipeline actually applies."""
    from ..registry import QUERIES

    pairs = QUERIES["q_dedup_embedding"](spark, sf_dir)
    labels = connected_components(pairs, "vec_id_a", "vec_id_b")
    return labels.select(
        F.col("node").alias("vec_id"),
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("node")).alias("is_representative"),
    )
