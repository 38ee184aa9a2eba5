"""Contrastive-training data preparation: the embedding-model data path,
composed from the round-6 registry queries as ONE lazy Spark plan per
stage over the driver test corpus.

    embedding corpus
      → feature health      (per-dim moments; int8 quantization audit:
                             q_feature_moments, q_scalar_quantization)
      → classifier ceiling  (centroid confusion + Cohen's kappa:
                             q_centroid_confusion, q_cohen_kappa)
      → random negatives    (hash-deterministic draws: q_negative_sampling)
      → hard negatives      (LSH-bucket-bounded cross-label neighbors:
                             q_hard_negatives)
      → training triples    (anchor, hard negative, random negative) —
                             re-run-stable, no PRNG anywhere

Every stage is the library form of an oracle-checked registry query, so
the example is a tour, not new semantics.

Run: python examples/contrastive_data.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F

from cdmx_airquality_etl_spark.operators.llm_ops import q_negative_sampling
from cdmx_airquality_etl_spark.operators.similarity import q_hard_negatives
from cdmx_airquality_etl_spark.operators.vector_stats import (
    q_cohen_kappa,
    q_feature_moments,
    q_scalar_quantization,
)
from cdmx_airquality_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("contrastive-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. feature health: is the embedding space worth training against?
    moments = q_feature_moments(spark, sf_dir)
    dead = moments.filter(F.col("variance") < 1e-6).count()
    print(f"dims audited: {moments.count()}, dead dims: {dead}")

    quant = q_scalar_quantization(spark, sf_dir)
    worst = quant.orderBy(F.col("mean_sq_err").desc()).first()
    print(
        f"int8 quantization worst dim {worst['dim']}: "
        f"mse {worst['mean_sq_err']:.3e} over range {worst['value_range']:.3f}"
    )

    # 2. label separability ceiling (any index only degrades from here)
    kappa = q_cohen_kappa(spark, sf_dir).first()
    print(
        f"centroid classifier: po {kappa['po']:.3f}, "
        f"pe {kappa['pe']:.3f}, kappa {kappa['kappa']:.3f}"
    )

    # 3. negatives: random (coverage) + hard (gradient signal)
    rand = q_negative_sampling(spark, sf_dir).select(
        "anchor_id", F.col("neg_id").alias("rand_neg_id")
    )
    hard = q_hard_negatives(spark, sf_dir).select(
        "anchor_id", F.col("neg_id").alias("hard_neg_id"), "cosine_sim"
    )

    # 4. triples: one hard + one random negative per anchor, deterministic
    first_rand = rand.groupBy("anchor_id").agg(
        F.min("rand_neg_id").alias("rand_neg_id")
    )
    first_hard = hard.groupBy("anchor_id").agg(
        F.min("hard_neg_id").alias("hard_neg_id")
    )
    triples = first_hard.join(first_rand, "anchor_id")
    n = triples.count()
    print(f"training triples: {n}")
    triples.orderBy("anchor_id").show(5, truncate=False)



if __name__ == "__main__":
    main()
    from cdmx_airquality_etl_spark.session import get_spark
    get_spark().stop()  # script invocation owns the session; main() does not
