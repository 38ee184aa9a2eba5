"""Analytics tour: the decision-support and retrieval surfaces in one
runnable script — the consumer-side complement to examples/quickstart.py
(ETL) and examples/curation_pipeline.py (LLM-data curation).

    warehouse   TPC-H-shaped reporting: top unshipped revenue (Q3),
                returned-item customers (Q10), month-over-month growth,
                ABC inventory bands, metric reconciliation
    behavior    funnel → attribution → stickiness over the event stream
    experiment  Welch → sequential monitor → diff-in-diff → BH FDR screen
    attribution Markov removal-effect → Shapley coalition credit
    retrieval   cosine top-k → MMR diversification → NDCG quality grade
    governance  k-anonymity audit before any of it ships

Every stage is the library form of an oracle-checked registry query, so
this is a tour, not new semantics.

Run: python examples/analytics_tour.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from cdmx_airquality_etl_spark.registry import QUERIES  # noqa: E402
from cdmx_airquality_etl_spark.session import get_spark  # noqa: E402
import cdmx_airquality_etl_spark.operators  # noqa: F401,E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("analytics-tour", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    print("== warehouse: unshipped-order revenue (TPC-H Q3 shape) ==")
    QUERIES["q_tpch_shipping"](spark, sf_dir).show(5, truncate=False)

    print("== warehouse: month-over-month growth ==")
    QUERIES["q_period_over_period"](spark, sf_dir).orderBy("month").show(6)

    print("== warehouse: ABC inventory bands ==")
    abc = QUERIES["q_abc_analysis"](spark, sf_dir)
    abc.groupBy("abc_class").count().orderBy("abc_class").show()

    print("== warehouse: order-header vs line-item reconciliation ==")
    QUERIES["q_recon_totals"](spark, sf_dir).orderBy("month").show(4)

    print("== behavior: funnel and attribution ==")
    QUERIES["q_funnel"](spark, sf_dir).show()
    QUERIES["q_attribution"](spark, sf_dir).orderBy("model", "event_type").show()

    print("== behavior: weekly stickiness (DAU/WAU) ==")
    QUERIES["q_stickiness"](spark, sf_dir).orderBy("wk").show()

    print("== retrieval: cosine top-k -> MMR diversified -> quality grade ==")
    QUERIES["q_similarity_topk"](spark, sf_dir).show(5)
    QUERIES["q_mmr_rerank"](spark, sf_dir).orderBy("pick").show()
    QUERIES["q_ndcg"](spark, sf_dir).show()

    print("== experimentation: one-shot -> sequential -> causal -> corrected ==")
    QUERIES["q_ab_welch"](spark, sf_dir).show()
    seq = QUERIES["q_ab_sequential"](spark, sf_dir)
    stops = seq.filter(seq.crossed == 1).count()
    print(f"sequential monitor: {seq.count()} daily looks, {stops} boundary crossings")
    QUERIES["q_diff_in_diff"](spark, sf_dir).show()
    QUERIES["q_fdr_screen"](spark, sf_dir).orderBy("p_rank").show(truncate=False)

    print("== attribution: positional -> counterfactual -> coalition ==")
    QUERIES["q_markov_attribution"](spark, sf_dir).orderBy("channel").show()
    QUERIES["q_shapley_attribution"](spark, sf_dir).orderBy("channel").show()

    print("== governance: k-anonymity before release ==")
    k = QUERIES["q_k_anonymity"](spark, sf_dir)
    k.groupBy("is_k_anonymous").count().show()

    print("tour complete")


if __name__ == "__main__":
    main()
