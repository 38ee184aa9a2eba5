"""Runtime exchange-reuse pin for the fixed-point graph iterations.

PLANS.md's static Exchange counts make q_pagerank (and siblings) look
iteration-fat: the static DAG repeats the edge-list / degree-table /
node-count shuffles once per superstep. The round-8 audit measured what
actually executes: AQE's exchange reuse (spark.sql.exchange.reuse,
stage-level sameResult matching over the checkpointed LogicalRDD scans)
builds each static-table shuffle ONCE and serves later supersteps from
ReusedExchange — the marginal cost of an iteration is exactly the one
dst-side aggregation shuffle the Pregel model requires. Settled-mass
pruning can't improve on that for power iteration (dense update: every
node's rank changes every round).

This test pins the runtime behavior so a refactor that silently defeats
reuse (e.g. a non-canonicalizable subtree between the checkpoint scan
and the exchange, or turning off exchange reuse in the session factory)
fails here rather than reappearing as a "per-iteration re-shuffle" in
the next scale sweep.
"""

from __future__ import annotations

import re

from cdmx_airquality_etl_spark import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# Measured 2026-08-15 at sf0.001 (3 supersteps): 21 static Exchange nodes,
# 7 executed ShuffleQueryStages, 6 ReusedExchange. Bounds carry slack for
# AQE version drift; a reuse regression re-executes a whole static-table
# shuffle per iteration and jumps the stage count by >= the iteration
# count.
MAX_EXECUTED_STAGES = 9
MIN_REUSED = 4


def test_pagerank_supersteps_reuse_static_table_shuffles(spark):
    df = QUERIES["q_pagerank"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    executed = plan.count("ShuffleQueryStage")
    reused = plan.count("ReusedExchange")
    assert reused >= MIN_REUSED, (
        f"AQE exchange reuse regressed: only {reused} ReusedExchange in the "
        f"executed plan — static graph tables are re-shuffling per superstep"
    )
    assert executed <= MAX_EXECUTED_STAGES, (
        f"{executed} executed shuffle stages (expected <= "
        f"{MAX_EXECUTED_STAGES}): the per-iteration marginal cost is no "
        f"longer a single aggregation shuffle"
    )
    # the static plan still shows the repeats — that's expected and is
    # what PLANS.md counts; the point of this test is the runtime shape
    assert len(re.findall(r"\bExchange\b", plan)) >= executed


def test_label_propagation_supersteps_reuse_static_table_shuffles(spark):
    # same fixed-point shape as pagerank (12 static exchanges in
    # PLANS.md): the edge list shuffles once, later rounds reuse it
    df = QUERIES["q_label_propagation"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 2, (
        "label-propagation rounds are re-shuffling the static edge list"
    )
